"""Logits parity: our JAX Qwen3 vs HuggingFace transformers (torch CPU).

The reference validates end-to-end by eyeball only (SURVEY.md §4); we check
numerically against HF on a tiny random checkpoint: prefill logits and a
prefill+decode step through the paged KV cache must match.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nanovllm_tpu.engine.batch import StepBatch
from nanovllm_tpu.models.qwen3 import ModelSpec, compute_logits_local, forward_local
from nanovllm_tpu.utils.loader import load_qwen3_params

BLOCK = 16


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from tests.util_tiny_model import make_tiny_qwen3

    path = str(tmp_path_factory.mktemp("tiny_qwen3"))
    cfg = make_tiny_qwen3(path)
    return path, cfg


def hf_logits(path, input_ids):
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(path, torch_dtype=torch.float32).eval()
    with torch.no_grad():
        out = model(torch.tensor([input_ids])).logits[0]
    return out.numpy()


def make_batch(token_ids, start_pos, kv_len, num_pages, t_pad=None, temperature=0.0):
    """Single-sequence batch writing tokens at positions [start_pos, kv_len)."""
    n = len(token_ids)
    t_pad = t_pad or n
    tok = np.zeros(t_pad, np.int32)
    tok[:n] = token_ids
    pos = np.zeros(t_pad, np.int32)
    pos[:n] = np.arange(start_pos, start_pos + n)
    slots = np.full(t_pad, -1, np.int32)
    slots[:n] = np.arange(start_pos, start_pos + n)  # identity block table
    return StepBatch(
        token_ids=jnp.asarray(tok),
        positions=jnp.asarray(pos),
        slot_mapping=jnp.asarray(slots),
        token_seq=jnp.zeros(t_pad, jnp.int32),
        fb_idx=jnp.full((t_pad,), -1, jnp.int32),
        kv_lens=jnp.asarray([kv_len], np.int32),
        page_indices=jnp.arange(num_pages, dtype=jnp.int32)[None, :],
        logits_indices=jnp.asarray([n - 1], np.int32),
        temperatures=jnp.asarray([temperature], np.float32),
    )


def run_ours(path, cfg, prompt, decode_tokens=()):
    """Prefill `prompt`, then single-token decode steps; returns the logits
    row after each phase, computed through the paged KV path."""
    spec = ModelSpec.from_hf(cfg, tp_size=1, dtype="float32")
    params = load_qwen3_params(path, spec)
    params = jax.tree.map(jnp.asarray, params)
    num_pages = 8
    # split-plane 3D cache: K at plane 2*gp, V at 2*gp + 1 (ops/kv_cache.py)
    kv_pages = jnp.zeros(
        (2 * spec.num_layers * num_pages, BLOCK,
         spec.num_kv_heads * spec.head_dim),
        jnp.float32,
    )
    rows = []

    batch = make_batch(prompt, 0, len(prompt), num_pages)
    hidden, kv_pages = forward_local(params, kv_pages, batch, (0, 0, 0), spec, None, "ref")
    rows.append(compute_logits_local(params, hidden[: len(prompt)], spec))

    n = len(prompt)
    for tok in decode_tokens:
        batch = make_batch([tok], n, n + 1, num_pages)
        hidden, kv_pages = forward_local(params, kv_pages, batch, (0, 0, 0), spec, None, "ref")
        rows.append(compute_logits_local(params, hidden[:1], spec))
        n += 1
    return rows


def test_prefill_logits_match_hf(tiny_ckpt):
    path, cfg = tiny_ckpt
    prompt = [3, 17, 99, 5, 42, 7, 23, 88, 1, 64]
    ours = run_ours(path, cfg, prompt)[0][:, : cfg.vocab_size]  # drop vocab pad
    theirs = hf_logits(path, prompt)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


def test_decode_through_paged_kv_matches_hf(tiny_ckpt):
    path, cfg = tiny_ckpt
    prompt = [3, 17, 99, 5, 42]
    decode = [11, 29]
    rows = run_ours(path, cfg, prompt, decode)
    full = prompt + decode
    theirs = hf_logits(path, full)
    # decode-step logits must equal the HF full-context rows
    v = cfg.vocab_size
    np.testing.assert_allclose(np.asarray(rows[1][0][:v]), theirs[len(prompt)], rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(rows[2][0][:v]), theirs[len(prompt) + 1], rtol=3e-4, atol=3e-4)


def test_padded_tokens_do_not_corrupt_state(tiny_ckpt):
    """Padding lanes (slot=-1) must not write KV or change real logits."""
    path, cfg = tiny_ckpt
    prompt = [3, 17, 99, 5, 42]
    spec = ModelSpec.from_hf(cfg, tp_size=1, dtype="float32")
    params = jax.tree.map(jnp.asarray, load_qwen3_params(path, spec))
    kv = jnp.zeros((2 * spec.num_layers * 8, BLOCK,
                spec.num_kv_heads * spec.head_dim), jnp.float32)

    exact = make_batch(prompt, 0, len(prompt), 8)
    h1, kv1 = forward_local(params, kv, exact, (0, 0, 0), spec, None, "ref")
    padded = make_batch(prompt, 0, len(prompt), 8, t_pad=16)
    h2, kv2 = forward_local(params, kv, padded, (0, 0, 0), spec, None, "ref")
    np.testing.assert_allclose(np.asarray(h1[:5]), np.asarray(h2[:5]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kv1), np.asarray(kv2), rtol=0, atol=0)
