"""Weight-only quantization tests: kernel equivalence + end-to-end quality.

BASELINE.md gates: W8A16/KV8 ppl delta <= +0.1, W4A16 (g=128) <= +0.3 on
WikiText-2.  No corpus exists on this machine, so the e2e gate here is the
same *relative* criterion on a synthetic corpus with the tiny model: the
quantized perplexity must stay within a small delta of bf16/fp32.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nanovllm_tpu import LLM
from nanovllm_tpu.ops.quant_matmul import (
    GROUP,
    dequant_weight,
    quant_linear,
    quant_matmul_a8_pallas,
    quant_matmul_pallas,
    quantize_activations,
    quantize_weight,
    quantize_weight_a8,
)


class TestQuantizeRoundtrip:
    def test_int8_roundtrip_error_small(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((2 * GROUP, 64)).astype(np.float32) * 0.05
        q, s = quantize_weight(w)
        wd = np.asarray(dequant_weight(jnp.asarray(q), jnp.asarray(s), dtype=jnp.float32))
        # error bounded by half a quantization step of the owning group
        bound = np.repeat(s, GROUP, axis=0) * 0.51
        assert np.all(np.abs(wd - w) <= bound)

    def test_int4_roundtrip_error_small(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((2 * GROUP, 64)).astype(np.float32) * 0.05
        # absmax scales: the half-step error bound below only holds without
        # the (default) MSE clip scan, which trades outlier error for bulk
        q, s = quantize_weight(w, int4=True, group=GROUP, mse=False)
        assert q.shape == (GROUP, 64)  # packed two per byte
        wd = np.asarray(dequant_weight(jnp.asarray(q), jnp.asarray(s), int4=True,
                                       dtype=jnp.float32))
        bound = np.repeat(s, GROUP, axis=0) * 0.51
        assert np.all(np.abs(wd - w) <= bound)


class TestQuantMatmulKernel:
    @pytest.mark.parametrize("int4", [False, True])
    def test_kernel_matches_dequant_ref(self, int4):
        rng = np.random.default_rng(2)
        t, k, n = 16, 2 * GROUP, 256
        x = jnp.asarray(rng.standard_normal((t, k)).astype(np.float32))
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
        q, s = quantize_weight(w, int4=int4)
        ours = quant_matmul_pallas(
            x, jnp.asarray(q), jnp.asarray(s), int4=int4, interpret=True
        )
        ref = x @ dequant_weight(jnp.asarray(q), jnp.asarray(s), int4=int4,
                                 dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("int4", [False, True])
    def test_stacked_layer_indexing(self, int4):
        """Stacked [L, ...] weights + scalar layer index == per-layer result.

        This is the scan-friendly path: the layer plane is selected inside
        the kernel by the BlockSpec index_map (no XLA dynamic-slice copy).
        """
        rng = np.random.default_rng(7)
        t, k, n, L = 16, 2 * GROUP, 256, 3
        x = jnp.asarray(rng.standard_normal((t, k)).astype(np.float32))
        qs, ss = zip(*[
            quantize_weight(rng.standard_normal((k, n)).astype(np.float32) * 0.1,
                            int4=int4)
            for _ in range(L)
        ])
        wq = jnp.asarray(np.stack(qs))
        sw = jnp.asarray(np.stack(ss))
        for layer in range(L):
            ours = quant_matmul_pallas(
                x, wq, sw, int4=int4, layer=jnp.int32(layer), interpret=True
            )
            ref = quant_matmul_pallas(
                x, wq[layer], sw[layer], int4=int4, interpret=True
            )
            np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))

    def test_stacked_layer_indexing_a8(self):
        rng = np.random.default_rng(8)
        t, k, n, L = 16, 256, 384, 3
        x = jnp.asarray(rng.standard_normal((t, k)).astype(np.float32))
        x_q, sx = quantize_activations(x)
        qs, ss = zip(*[
            quantize_weight_a8(rng.standard_normal((k, n)).astype(np.float32) * 0.1)
            for _ in range(L)
        ])
        wq = jnp.asarray(np.stack(qs))
        sw = jnp.asarray(np.stack(ss))          # [L, 1, N]
        for layer in range(L):
            ours = quant_matmul_a8_pallas(
                x_q, sx, wq, sw, layer=jnp.int32(layer),
                out_dtype=jnp.float32, interpret=True,
            )
            ref = quant_matmul_a8_pallas(
                x_q, sx, wq[layer], sw[layer], out_dtype=jnp.float32,
                interpret=True,
            )
            np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))

    def test_kernel_odd_n_tile(self):
        """N not divisible by the default block: block shrinks to fit."""
        rng = np.random.default_rng(3)
        t, k, n = 8, GROUP, 384  # 384 = 128*3
        x = jnp.asarray(rng.standard_normal((t, k)).astype(np.float32))
        q, s = quantize_weight(rng.standard_normal((k, n)).astype(np.float32))
        ours = quant_matmul_pallas(x, jnp.asarray(q), jnp.asarray(s), interpret=True)
        ref = x @ dequant_weight(jnp.asarray(q), jnp.asarray(s), dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)


class TestW8A8:
    def test_kernel_matches_int_ref(self):
        """Pallas int8 x int8 kernel must match the integer reference bit-for-
        bit up to the f32 output scaling."""
        rng = np.random.default_rng(4)
        t, k, n = 16, 256, 384
        x = jnp.asarray(rng.standard_normal((t, k)).astype(np.float32))
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
        wq, sw = quantize_weight_a8(w)
        x_q, sx = quantize_activations(x)
        ours = quant_matmul_a8_pallas(
            x_q, sx, jnp.asarray(wq), jnp.asarray(sw), out_dtype=jnp.float32,
            interpret=True,
        )
        ref = (
            x_q.astype(np.int32) @ wq.astype(np.int32)
        ).astype(np.float32) * np.asarray(sx) * sw
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6, atol=1e-6)

    def test_quant_linear_dispatch_accuracy(self):
        """W8A8 through quant_linear stays close to the fp matmul."""
        rng = np.random.default_rng(5)
        t, k, n = 8, 128, 256
        x = jnp.asarray(rng.standard_normal((t, k)).astype(np.float32) * 0.5)
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
        wq, sw = quantize_weight_a8(w)
        packed = {"w": jnp.asarray(wq), "s": jnp.asarray(sw[0])}
        ours = quant_linear(x, packed, impl="ref")
        ref = np.asarray(x) @ w
        # int8 x int8 with dynamic per-token scales: ~1% relative error
        err = np.abs(np.asarray(ours) - ref)
        assert np.median(err / (np.abs(ref) + 1e-3)) < 0.02

    def test_w8a8_ppl_close_to_fp(self, tiny_ckpt):
        path, _ = tiny_ckpt
        rng = np.random.default_rng(9)
        docs = [[int(x) for x in rng.integers(3, 120, size=48)] for _ in range(3)]
        ppl_fp = make_llm(path).perplexity(docs)
        ppl_a8 = make_llm(path, "w8a8").perplexity(docs)
        assert abs(ppl_a8 - ppl_fp) / ppl_fp < 0.08, (ppl_fp, ppl_a8)


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from tests.util_tiny_model import make_tiny_qwen3

    path = str(tmp_path_factory.mktemp("tiny_qwen3_quant"))
    # hidden must be a multiple of GROUP for group quantization
    cfg = make_tiny_qwen3(path, hidden=128, heads=4, kv_heads=2, head_dim=32,
                          intermediate=256)
    return path, cfg


def make_llm(path, quantization="none"):
    return LLM(
        path,
        dtype="float32",
        quantization=quantization,
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        max_num_batched_tokens=64,
        max_num_seqs=8,
        max_model_len=256,
        attention_impl="ref",
    )


class TestQuantizedEngine:
    def test_int8_ppl_close_to_fp(self, tiny_ckpt):
        path, _ = tiny_ckpt
        rng = np.random.default_rng(7)
        docs = [[int(x) for x in rng.integers(3, 120, size=48)] for _ in range(3)]
        ppl_fp = make_llm(path).perplexity(docs)
        ppl_q8 = make_llm(path, "int8").perplexity(docs)
        # relative gate in the spirit of BASELINE (+0.1 on real ppl ~ <2% rel)
        assert abs(ppl_q8 - ppl_fp) / ppl_fp < 0.05, (ppl_fp, ppl_q8)

    def test_int4_ppl_close_to_fp(self, tiny_ckpt):
        path, _ = tiny_ckpt
        rng = np.random.default_rng(8)
        docs = [[int(x) for x in rng.integers(3, 120, size=48)] for _ in range(3)]
        ppl_fp = make_llm(path).perplexity(docs)
        ppl_q4 = make_llm(path, "int4").perplexity(docs)
        assert abs(ppl_q4 - ppl_fp) / ppl_fp < 0.25, (ppl_fp, ppl_q4)

    def test_int8_generates(self, tiny_ckpt):
        from nanovllm_tpu import SamplingParams

        path, _ = tiny_ckpt
        llm = make_llm(path, "int8")
        out = llm.generate(
            [[3, 17, 99, 5]],
            SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
            use_tqdm=False,
        )[0]
        assert len(out["token_ids"]) == 6


class TestInt4Schemes:
    """W4A16 scheme variants: group width + MSE-optimal scales (VERDICT r3:
    attack int4 quality — these are the implementable-without-checkpoints
    levers, measured on-device by tools/quality_proxy.py)."""

    def test_group64_roundtrip_beats_group128(self):
        rng = np.random.default_rng(3)
        w = rng.standard_normal((512, 256)).astype(np.float32) * 0.1

        def rt_err(group, mse):
            q, s = quantize_weight(w, int4=True, group=group, mse=mse)
            deq = np.asarray(dequant_weight(
                jnp.asarray(q), jnp.asarray(s), int4=True, group=group,
                dtype=jnp.float32,
            ))
            return float(((deq - w) ** 2).mean())

        e128 = rt_err(128, False)
        e64 = rt_err(64, False)
        e128m = rt_err(128, True)
        e64m = rt_err(64, True)
        assert e64 < e128
        assert e128m < e128
        assert e64m < e64

    @pytest.mark.parametrize("group", [64, 128])
    def test_quant_linear_detects_group_from_shapes(self, group):
        """quant_linear's ratio detection must route group-64 int4 weights
        through the kernel with the right scale granularity."""
        rng = np.random.default_rng(4)
        t, k, n = 8, 256, 128
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
        q, s = quantize_weight(w, int4=True, group=group, mse=False)
        x = jnp.asarray(rng.standard_normal((t, k)).astype(np.float32))
        got_ref = np.asarray(quant_linear(
            x, {"w": jnp.asarray(q), "s": jnp.asarray(s)}, impl="ref"))
        got_pallas = np.asarray(quant_linear(
            x, {"w": jnp.asarray(q), "s": jnp.asarray(s)}, impl="pallas"))
        deq = np.asarray(dequant_weight(
            jnp.asarray(q), jnp.asarray(s), int4=True, group=group,
            dtype=jnp.float32,
        ))
        want = np.asarray(x) @ deq
        np.testing.assert_allclose(got_ref, want, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(got_pallas, want, rtol=2e-2, atol=2e-2)
