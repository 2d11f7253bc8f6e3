"""INT8 KV cache (KV8) tests: write/read roundtrip, kernel equivalence,
end-to-end quality via the engine."""

import numpy as np
import pytest

import jax.numpy as jnp

from nanovllm_tpu import LLM
from nanovllm_tpu.ops.attention import ragged_paged_attention_ref
from nanovllm_tpu.ops.kv_cache import write_kv_pages
from nanovllm_tpu.ops.ragged_paged_attention import ragged_paged_attention_pallas

PAGE = 16


def quantized_case(rng, kv_lens_list, nh, kvh, hd, layers=2, num_pages=32):
    """Build an INT8 cache by writing random K/V through write_kv_pages, plus
    an identical bf16 cache as the oracle input."""
    ppl = num_pages
    cache8 = {
        "data": jnp.zeros((2 * layers * ppl, PAGE, kvh * hd), jnp.int8),
        "scale": jnp.zeros((layers * ppl, 2 * kvh, PAGE), jnp.float32),
    }
    cache_fp = jnp.zeros((2 * layers * ppl, PAGE, kvh * hd), jnp.float32)
    s = len(kv_lens_list)
    max_pages = max((k + PAGE - 1) // PAGE for k in kv_lens_list)
    page_indices = np.zeros((s, max_pages), np.int32)
    perm = rng.permutation(num_pages)
    pi = 0
    for i, klen in enumerate(kv_lens_list):
        n = (klen + PAGE - 1) // PAGE
        page_indices[i, :n] = perm[pi:pi + n]
        pi += n
        k = jnp.asarray(rng.standard_normal((klen, kvh, hd)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((klen, kvh, hd)).astype(np.float32))
        pos = np.arange(klen)
        table = page_indices[i, pos // PAGE]
        slots = jnp.asarray(table * PAGE + pos % PAGE, jnp.int32)
        for layer in range(layers):
            cache8 = write_kv_pages(cache8, layer, ppl, k, v, slots)
            cache_fp = write_kv_pages(cache_fp, layer, ppl, k, v, slots)
    return cache8, cache_fp, jnp.asarray(page_indices), ppl


class TestKV8:
    def test_ref_impl_close_to_fp_cache(self):
        rng = np.random.default_rng(0)
        kv_lens = [9, 17, 30]
        cache8, cache_fp, page_indices, ppl = quantized_case(rng, kv_lens, 4, 2, 32)
        q = jnp.asarray(rng.standard_normal((3, 4, 32)).astype(np.float32))
        token_seq = jnp.asarray([0, 1, 2], jnp.int32)
        positions = jnp.asarray([k - 1 for k in kv_lens], jnp.int32)
        out8 = ragged_paged_attention_ref(
            q, cache8, 1, ppl, page_indices, token_seq, positions, sm_scale=0.25
        )
        outf = ragged_paged_attention_ref(
            q, cache_fp, 1, ppl, page_indices, token_seq, positions, sm_scale=0.25
        )
        np.testing.assert_allclose(np.asarray(out8), np.asarray(outf),
                                   rtol=0.05, atol=0.02)

    def test_pallas_kernel_matches_ref_on_int8_cache(self):
        rng = np.random.default_rng(1)
        kv_lens = [9, 17, 30, 44]
        cache8, _, page_indices, ppl = quantized_case(rng, kv_lens, 8, 4, 32)
        q = jnp.asarray(rng.standard_normal((4, 8, 32)).astype(np.float32))
        token_seq = jnp.asarray([0, 1, 2, 3], jnp.int32)
        positions = jnp.asarray([k - 1 for k in kv_lens], jnp.int32)
        kv_lens_arr = jnp.asarray(kv_lens, jnp.int32)
        ours = ragged_paged_attention_pallas(
            q, cache8, 1, ppl, kv_lens_arr, page_indices, token_seq, positions,
            sm_scale=0.25, q_tile=1, interpret=True,
        )
        ref = ragged_paged_attention_ref(
            q, cache8, 1, ppl, page_indices, token_seq, positions, sm_scale=0.25
        )
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from tests.util_tiny_model import make_tiny_qwen3

    path = str(tmp_path_factory.mktemp("tiny_qwen3_kv8"))
    cfg = make_tiny_qwen3(path)
    return path, cfg


def make_llm(path, **kw):
    defaults = dict(
        dtype="float32",
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        max_num_batched_tokens=64,
        max_num_seqs=8,
        max_model_len=256,
        attention_impl="ref",
    )
    defaults.update(kw)
    return LLM(path, **defaults)


class TestKV8Engine:
    def test_kv8_ppl_close_to_fp(self, tiny_ckpt):
        path, _ = tiny_ckpt
        rng = np.random.default_rng(5)
        docs = [[int(x) for x in rng.integers(3, 120, size=48)] for _ in range(3)]
        ppl_fp = make_llm(path).perplexity(docs)
        ppl_kv8 = make_llm(path, kv_cache_dtype="int8").perplexity(docs)
        assert abs(ppl_kv8 - ppl_fp) / ppl_fp < 0.05, (ppl_fp, ppl_kv8)

    def test_kv8_generation_with_burst(self, tiny_ckpt):
        from nanovllm_tpu import SamplingParams

        path, _ = tiny_ckpt
        llm = make_llm(path, kv_cache_dtype="int8", decode_burst=8)
        sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
        out = llm.generate([[3, 17, 99, 5], [7, 23, 88]], sp, use_tqdm=False)
        assert all(len(o["token_ids"]) == 10 for o in out)
        # greedy tokens should mostly agree with the fp cache path
        fp = make_llm(path).generate([[3, 17, 99, 5], [7, 23, 88]], sp, use_tqdm=False)
        agree = sum(
            a == b
            for o1, o2 in zip(out, fp)
            for a, b in zip(o1["token_ids"], o2["token_ids"])
        )
        assert agree >= 14  # 70%+ agreement on a random tiny model