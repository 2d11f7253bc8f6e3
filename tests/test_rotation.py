"""Incoherence rotation (utils/rotation.py): exactness + quantized path."""

import numpy as np
import pytest

from nanovllm_tpu import LLM


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from tests.util_tiny_model import make_tiny_qwen3

    path = str(tmp_path_factory.mktemp("tiny_qwen3_rot"))
    cfg = make_tiny_qwen3(path, tie=True)  # tied: the hard case for rotation
    return path, cfg


def make_llm(path, **kw):
    defaults = dict(
        dtype="float32",
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        max_num_batched_tokens=128,
        max_num_seqs=8,
        max_model_len=512,
        attention_impl="ref",
    )
    defaults.update(kw)
    return LLM(path, **defaults)


def test_rotation_is_exact_unquantized(tiny_ckpt):
    """Rotation without quantization must preserve per-token logprobs to fp
    rounding (the transform is exact in real arithmetic), tied embeddings
    included."""
    path, _ = tiny_ckpt
    rng = np.random.default_rng(0)
    docs = [[int(x) for x in rng.integers(3, 120, size=40)]]
    base = make_llm(path).score(docs)[0]
    rot = make_llm(path, quant_rotate=True).score(docs)[0]
    np.testing.assert_allclose(rot, base, rtol=2e-4, atol=2e-4)


def test_rotation_math_direct():
    """apply_incoherence_rotation on a random tree: rotated layer output
    equals original (matrix-level check, no engine)."""
    from nanovllm_tpu.models.qwen3 import ModelSpec
    from nanovllm_tpu.utils.loader import init_random_params
    from nanovllm_tpu.utils.rotation import apply_incoherence_rotation

    spec = ModelSpec(
        num_layers=2, hidden_size=32, num_heads=2, num_kv_heads=1,
        head_dim=16, intermediate_size=48, vocab_size=64,
        rope_theta=1e4, rms_eps=1e-6, tie_embeddings=True, dtype="float32",
    )
    params = init_random_params(0, spec)
    rot = apply_incoherence_rotation(params, spec, seed=1)
    r = np.asarray(rot["rot"], np.float64)
    # orthogonality
    np.testing.assert_allclose(r @ r.T, np.eye(32), atol=1e-5)
    x = np.random.default_rng(2).standard_normal((4, 32))

    def rms(v):
        return v / np.sqrt((v ** 2).mean(-1, keepdims=True) + 1e-6)

    for l in range(2):
        w = np.asarray(params["layers"]["qkv"][l], np.float64)
        g = np.asarray(params["layers"]["input_norm"][l], np.float64)
        w_r = np.asarray(rot["layers"]["qkv"][l], np.float64)
        y0 = (rms(x) * g) @ w
        y1 = rms(x @ r) @ w_r          # rotated stream, folded+rotated weight
        np.testing.assert_allclose(y1, y0, atol=1e-4)
        assert np.all(np.asarray(rot["layers"]["input_norm"][l]) == 1.0)
        # output-side: o emits into the rotated basis
        o = np.asarray(params["layers"]["o"][l], np.float64)
        o_r = np.asarray(rot["layers"]["o"][l], np.float64)
        z = np.random.default_rng(3).standard_normal((4, o.shape[0]))
        np.testing.assert_allclose(z @ o_r, (z @ o) @ r, atol=1e-5)


def test_rotation_with_int4_runs_and_scores(tmp_path):
    """quant_rotate + int4 end-to-end: engine builds, scores, and the
    rotated-quantized model is a valid model (finite logprobs).  Needs
    group-aligned dims (K multiples of 128)."""
    from tests.util_tiny_model import make_tiny_qwen3

    path = str(tmp_path / "q128")
    make_tiny_qwen3(path, hidden=128, intermediate=256, heads=4, kv_heads=2,
                    head_dim=32, tie=True)
    rng = np.random.default_rng(1)
    docs = [[int(x) for x in rng.integers(3, 120, size=30)]]
    base = make_llm(path).score(docs)[0]
    q = make_llm(path, quantization="int4", quant_rotate=True).score(docs)[0]
    assert np.all(np.isfinite(q))
    # int4 on a tiny random model is noisy; just sanity-bound the deviation
    assert float(np.mean(np.abs(np.array(q) - np.array(base)))) < 2.0
