"""Ragged paged attention over a block-table KV cache.

TPU-native replacement for the reference's FlashAttention-2 calls
(reference attention.py:222-248): one op covers mixed chunked-prefill and
decode in a single ragged batch, reading K/V through per-sequence page
tables — the same contract as ``flash_attn_varlen_func(block_table=...)``.

Backends:
  * ``ref``    — pure-jnp reference implementation (correct on any backend;
                 O(T * max_ctx) memory, used on CPU and as the test oracle).
  * ``pallas`` — our Pallas kernel (ops/ragged_paged_attention.py), the
                 production path on TPU.

Inputs follow the vLLM-v1-style metadata (SURVEY.md §3.2):
  q            [T, n_heads, head_dim] — all scheduled tokens, ragged-concat
  kv_pages     [P, page_size, 2*kv_heads, head_dim] (interleaved K/V per head)
  kv_lens      [S] context length per sequence *after* this step's KV write
  page_indices [S, pages_per_seq] block table (padding entries must point at
               a valid page; they are masked via kv_lens)
  cu_q_lens    [S+1] cumulative query lengths; padding repeats the total
"""

import functools

import jax
import jax.numpy as jnp

MASK_VALUE = -1e30  # finite: keeps fully-masked (padding) rows NaN-free


def ragged_paged_attention_ref(
    q: jnp.ndarray,
    kv_pages: jnp.ndarray,
    kv_lens: jnp.ndarray,
    page_indices: jnp.ndarray,
    cu_q_lens: jnp.ndarray,
    *,
    sm_scale: float,
) -> jnp.ndarray:
    t, nh, hd = q.shape
    _, page_size, kvh2, _ = kv_pages.shape
    kvh = kvh2 // 2
    s, pages_per_seq = page_indices.shape
    ctx = pages_per_seq * page_size

    kv = kv_pages[page_indices]                       # [S, PPS, page, 2kvh, hd]
    kv = kv.reshape(s, ctx, kvh, 2, hd)
    k, v = kv[:, :, :, 0, :], kv[:, :, :, 1, :]       # [S, C, kvh, hd]

    tok = jnp.arange(t, dtype=jnp.int32)
    tsid = jnp.searchsorted(cu_q_lens[1:], tok, side="right").astype(jnp.int32)
    tsid = jnp.clip(tsid, 0, s - 1)
    q_pos = tok - cu_q_lens[tsid]                     # position within own query chunk
    q_len = cu_q_lens[tsid + 1] - cu_q_lens[tsid]
    kv_len = kv_lens[tsid]

    k_t = k[tsid]                                     # [T, C, kvh, hd]
    v_t = v[tsid]
    group = nh // kvh
    qg = q.reshape(t, kvh, group, hd).astype(jnp.float32)
    scores = jnp.einsum("tkgd,tckd->tkgc", qg, k_t.astype(jnp.float32)) * sm_scale

    # causal visibility: token sees kv slots [0, kv_len - q_len + q_pos + 1)
    visible_upto = kv_len - q_len + q_pos + 1         # [T]
    visible = jnp.arange(ctx, dtype=jnp.int32)[None, :] < visible_upto[:, None]
    scores = jnp.where(visible[:, None, None, :], scores, MASK_VALUE)

    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("tkgc,tckd->tkgd", p, v_t.astype(jnp.float32))
    return out.reshape(t, nh, hd).astype(q.dtype)


def ragged_paged_attention(
    q, kv_pages, kv_lens, page_indices, cu_q_lens, *, sm_scale, impl="ref"
):
    if impl == "ref":
        return ragged_paged_attention_ref(
            q, kv_pages, kv_lens, page_indices, cu_q_lens, sm_scale=sm_scale
        )
    if impl == "pallas":
        from nanovllm_tpu.ops.ragged_paged_attention import ragged_paged_attention_pallas

        return ragged_paged_attention_pallas(
            q, kv_pages, kv_lens, page_indices, cu_q_lens, sm_scale=sm_scale
        )
    raise ValueError(f"unknown attention impl: {impl}")
