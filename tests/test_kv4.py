"""INT4 KV cache (KV4): packing roundtrip, kernel equivalence vs the jnp
oracle on the SAME quantized cache, and end-to-end generation."""

import numpy as np
import pytest

import jax.numpy as jnp

from nanovllm_tpu import LLM, SamplingParams
from nanovllm_tpu.ops.attention import ragged_paged_attention_ref
from nanovllm_tpu.ops.kv_cache import _quantize_rows, write_kv_pages
from nanovllm_tpu.ops.ragged_paged_attention import (
    _unpack_int4_kv,
    ragged_paged_attention_pallas,
)

from util_tiny_model import make_tiny_qwen3

PAGE = 16


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    kv = jnp.asarray(rng.standard_normal((5, 4, 8)).astype(np.float32))
    packed, scale = _quantize_rows(kv, bits=4)
    assert packed.shape == (5, 2, 8) and packed.dtype == jnp.int8
    k, v = map(np.asarray, _unpack_int4_kv(packed))
    assert min(k.min(), v.min()) >= -7 and max(k.max(), v.max()) <= 7
    s = np.asarray(scale)
    deq_k = k * s[:, 0::2][..., None]
    deq_v = v * s[:, 1::2][..., None]
    kv_np = np.asarray(kv)
    np.testing.assert_allclose(deq_k, kv_np[:, 0::2], atol=s.max())
    np.testing.assert_allclose(deq_v, kv_np[:, 1::2], atol=s.max())


def _build_case(rng, kv_lens_list, kvh, hd, layers=2, num_pages=32):
    ppl = num_pages
    cache4 = {
        "data": jnp.zeros((layers * ppl, PAGE, kvh * hd), jnp.int8),
        "scale": jnp.zeros((layers * ppl, 2 * kvh, PAGE), jnp.float32),
    }
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
            cache4 = write_kv_pages(cache4, layer, ppl, k, v, slots)
    return cache4, jnp.asarray(page_indices)


def test_pallas_kernel_matches_ref_on_int4_cache():
    """Decode + prefill tiles through the manual kernel vs the jnp oracle,
    both reading the same KV4 cache (dequant error cancels)."""
    rng = np.random.default_rng(1)
    nh, kvh, hd = 4, 2, 64
    kv_lens_list = [7, 33, 20]
    cache4, page_indices = _build_case(rng, kv_lens_list, kvh, hd)
    s = len(kv_lens_list)
    q = jnp.asarray(rng.standard_normal((s, nh, hd)).astype(np.float32))
    kv_lens = jnp.asarray(kv_lens_list, jnp.int32)
    tile_seq = jnp.arange(s, dtype=jnp.int32)
    tile_kvpos = kv_lens - 1
    for layer in range(2):
        out = ragged_paged_attention_pallas(
            q, cache4, layer, 32, kv_lens, page_indices, tile_seq, tile_kvpos,
            sm_scale=0.125, q_tile=1, interpret=True,
        )
        ref = ragged_paged_attention_ref(
            q, cache4, layer, 32, page_indices, tile_seq, tile_kvpos,
            sm_scale=0.125,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
        )


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_kv4"))
    make_tiny_qwen3(path)
    return path


def test_kv4_generation_close_to_fp(ckpt):
    """KV4 end-to-end generation through the engine: outputs stay on the fp
    reference's trajectory for the first few tokens (4-bit KV drifts later)."""
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    kw = dict(num_kvcache_blocks=64, kvcache_block_size=16, max_model_len=256,
              max_num_seqs=4, enforce_eager=True)
    prompts = [[3, 17, 99, 5, 42, 7, 23, 88]]
    fp = LLM(ckpt, **kw).generate(prompts, sp, use_tqdm=False)[0]["token_ids"]
    q4 = LLM(ckpt, kv_cache_dtype="int4", **kw).generate(
        prompts, sp, use_tqdm=False)[0]["token_ids"]
    assert len(q4) == 12
    assert q4[:2] == fp[:2], (q4, fp)
