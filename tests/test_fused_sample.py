"""Fused LM-head + Gumbel-max sampling kernel vs numpy oracle (interpret
mode on CPU).

The hardware PRNG path (noise_mode="prng") has no interpret-mode lowering;
these tests exercise the full scoring/argmax/masking logic by injecting the
Gumbel noise as an operand, which shares every code path but the bit source.
The PRNG path itself is validated on hardware by tools/bench_sampler.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovllm_tpu.ops.fused_sample import fused_lm_sample


def oracle(sel, lm, temps, gumbel, vocab_start, vocab_size):
    logits = np.einsum("sh,vh->sv", sel, lm).astype(np.float32)
    s, v_l = logits.shape
    gidx = vocab_start + np.arange(v_l)[None, :]
    greedy = temps <= 0.0
    safe_t = np.where(greedy, 1.0, temps)
    if gumbel is None:
        score = logits
    else:
        score = np.where(greedy[:, None], logits,
                         logits / safe_t[:, None] + gumbel)
    score = np.where(gidx < vocab_size, score, -np.inf)
    tok = score.argmax(axis=1) + vocab_start
    return tok.astype(np.int32), score.max(axis=1).astype(np.float32)


def make_case(rng, s, h, v_l):
    sel = rng.standard_normal((s, h), dtype=np.float32)
    lm = rng.standard_normal((v_l, h), dtype=np.float32)
    return sel, lm


@pytest.mark.parametrize("s,h,v_l,vocab_size,vocab_start", [
    (8, 128, 512, 512, 0),
    (16, 256, 1024, 900, 0),      # padded vocab tail masked
    (8, 128, 512, 900, 512),      # a middle shard
    (8, 128, 512, 300, 512),      # shard entirely past the true vocab
])
def test_greedy_matches_oracle(s, h, v_l, vocab_size, vocab_start):
    rng = np.random.default_rng(0)
    sel, lm = make_case(rng, s, h, v_l)
    temps = np.zeros(s, np.float32)
    tok, best = fused_lm_sample(
        jnp.asarray(sel), jnp.asarray(lm), jnp.asarray(temps),
        jnp.zeros(4, jnp.int32), vocab_start,
        vocab_size=vocab_size, stochastic=False, block_v=256, interpret=True,
    )
    want_tok, want_best = oracle(sel, lm, temps, None, vocab_start, vocab_size)
    all_masked = vocab_start >= vocab_size
    if all_masked:
        assert np.all(np.asarray(best) == -np.inf)
    else:
        np.testing.assert_array_equal(np.asarray(tok), want_tok)
        np.testing.assert_allclose(np.asarray(best), want_best, rtol=1e-6)


def test_injected_noise_matches_oracle():
    rng = np.random.default_rng(1)
    s, h, v_l, vocab = 16, 128, 1024, 1000
    sel, lm = make_case(rng, s, h, v_l)
    # mixed greedy / sampled rows
    temps = rng.uniform(0.2, 1.5, size=s).astype(np.float32)
    temps[::3] = 0.0
    gumbel = rng.gumbel(size=(s, v_l)).astype(np.float32)
    tok, best = fused_lm_sample(
        jnp.asarray(sel), jnp.asarray(lm), jnp.asarray(temps),
        jnp.zeros(4, jnp.int32), 0,
        vocab_size=vocab, noise=jnp.asarray(gumbel),
        block_v=256, interpret=True,
    )
    want_tok, want_best = oracle(sel, lm, temps, gumbel, 0, vocab)
    np.testing.assert_array_equal(np.asarray(tok), want_tok)
    np.testing.assert_allclose(np.asarray(best), want_best, rtol=1e-6)


def test_tie_breaks_to_lowest_index():
    # identical logit columns: duplicate every row of the LM head
    rng = np.random.default_rng(2)
    s, h = 8, 128
    half = rng.standard_normal((128, h), dtype=np.float32)
    lm = np.concatenate([half, half], axis=0)      # col v and v+128 tie
    sel = rng.standard_normal((s, h), dtype=np.float32)
    temps = np.zeros(s, np.float32)
    tok, _ = fused_lm_sample(
        jnp.asarray(sel), jnp.asarray(lm), jnp.asarray(temps),
        jnp.zeros(4, jnp.int32), 0,
        vocab_size=256, stochastic=False, block_v=128, interpret=True,
    )
    assert np.all(np.asarray(tok) < 128)


def test_int8_head_matches_dequant_oracle():
    """Per-row int8 LM head: fused greedy picks must equal an argmax over
    oracle-dequantized logits (the kernel's dequant is exact per channel)."""
    from nanovllm_tpu.utils.loader import quantize_lm_head

    rng = np.random.default_rng(5)
    s, h, v = 8, 64, 512
    lm = rng.standard_normal((v, h)).astype(np.float32)
    sel = rng.standard_normal((s, h)).astype(np.float32)
    q = quantize_lm_head(lm)
    tok, best = fused_lm_sample(
        jnp.asarray(sel), jnp.asarray(q["w"]),
        jnp.zeros(s, jnp.float32), jnp.zeros(4, jnp.int32), 0,
        vocab_size=v, lm_scale=jnp.asarray(q["s"]),
        stochastic=False, block_v=128, interpret=True,
    )
    logits = (sel @ (q["w"].astype(np.float32) * q["s"].T).T)
    np.testing.assert_array_equal(np.asarray(tok), logits.argmax(axis=1))
    np.testing.assert_allclose(
        np.asarray(best), logits.max(axis=1), rtol=1e-5
    )
    # quantization error vs the fp head is small (sanity on the scheme)
    ref = sel @ lm.T
    err = np.abs(logits - ref).max() / np.abs(ref).max()
    assert err < 0.02, err


def test_uniform_from_bits_range():
    from nanovllm_tpu.ops.fused_sample import _uniform_from_bits

    bits = jnp.asarray([0, 1, 0x7FFFFFFF, 0xFFFFFFFF, 0x80000000],
                       dtype=jnp.uint32)
    u = np.asarray(_uniform_from_bits(bits))
    assert np.all(u > 0.0) and np.all(u < 1.0)
