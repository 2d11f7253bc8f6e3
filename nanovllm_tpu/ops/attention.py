"""Ragged paged attention over a block-table KV cache.

TPU-native replacement for the reference's FlashAttention-2 calls
(reference attention.py:222-248): one logical op covers mixed chunked-prefill
and decode in a single ragged batch, reading K/V through per-sequence page
tables — the same contract as ``flash_attn_varlen_func(block_table=...)``.

Token layout (built by engine/batch.py): the step's token axis is split into
two *segments*, described by the static triple ``(dec_end, p_start, p_end)``:

  rows [0, dec_end)        decode tokens, one row per decoding sequence
  rows [dec_end, p_start)  inert padding (alignment gap)
  rows [p_start, p_end)    prefill chunks, each sequence's rows padded to a
                           PREFILL_TILE boundary
  rows [p_end, T)          inert tail padding to the bucket size

Per-token metadata makes the layout self-describing for any backend:
  token_seq [T]  sequence lane index of each row
  positions [T]  absolute position of the token within its sequence

Backends:
  * ``ref``    — pure-jnp (any backend; O(T * max_ctx) memory; test oracle)
  * ``pallas`` — our kernel (ops/ragged_paged_attention.py): q_tile=1 over the
    decode segment (no row inflation — decode linears stay weight-bound),
    q_tile=PREFILL_TILE over the prefill segment (MXU-sized tiles).
"""

import jax
import jax.numpy as jnp

from nanovllm_tpu.constants import PREFILL_TILE  # noqa: F401 (re-export)

MASK_VALUE = -1e30  # finite: keeps fully-masked (padding) rows NaN-free


def ragged_paged_attention_ref(
    q: jnp.ndarray,            # [T, nh, hd]
    kv_pages: jnp.ndarray,     # [2*L*PPL, page, kvh*hd] — flat split-plane cache
    layer,                     # scalar int32 layer index
    pages_per_layer: int,
    page_indices: jnp.ndarray,  # [S, PPS]
    token_seq: jnp.ndarray,    # [T]
    positions: jnp.ndarray,    # [T]
    *,
    sm_scale: float,
    sliding_window: int | None = None,
) -> jnp.ndarray:
    from nanovllm_tpu.ops.kv_cache import is_quantized_cache

    from nanovllm_tpu.ops.kv_cache import cache_kv_bits

    t, nh, hd = q.shape
    quant = is_quantized_cache(kv_pages)
    data = kv_pages["data"] if quant else kv_pages
    page_size = data.shape[1]
    kvh = data.shape[2] // hd  # plane row width kvh*hd in every layout
    s, pages_per_seq = page_indices.shape
    ctx = pages_per_seq * page_size

    gpages = layer * pages_per_layer + page_indices   # logical pages [S, PPS]
    if quant and cache_kv_bits(kv_pages) == 4:
        # KV4: head h's K in the low nibble, V in the high; interleaved
        # scale rows (kv_cache.py)
        from nanovllm_tpu.ops.ragged_paged_attention import _unpack_int4_kv

        kv = data[gpages].reshape(s, pages_per_seq, page_size, kvh, hd)
        scale = kv_pages["scale"][gpages]             # [S, PPS, 2kvh, page]
        kq, vq = _unpack_int4_kv(kv)
        sk = scale[..., 0::2, :].transpose(0, 1, 3, 2)[..., None]
        sv = scale[..., 1::2, :].transpose(0, 1, 3, 2)[..., None]
        k = (kq.astype(jnp.float32) * sk).reshape(s, ctx, kvh, hd)
        v = (vq.astype(jnp.float32) * sv).reshape(s, ctx, kvh, hd)
    else:
        # split planes: K at plane 2*gp, V at 2*gp + 1
        k = data[2 * gpages].reshape(s, pages_per_seq, page_size, kvh, hd)
        v = data[2 * gpages + 1].reshape(s, pages_per_seq, page_size, kvh, hd)
        if quant:
            scale = kv_pages["scale"][gpages]         # [S, PPS, 2kvh, page] blocked
            sk = scale[..., :kvh, :].transpose(0, 1, 3, 2)[..., None]
            sv = scale[..., kvh:, :].transpose(0, 1, 3, 2)[..., None]
            k = k.astype(jnp.float32) * sk
            v = v.astype(jnp.float32) * sv
        k = k.reshape(s, ctx, kvh, hd)                # [S, C, kvh, hd]
        v = v.reshape(s, ctx, kvh, hd)

    tsid = jnp.clip(token_seq, 0, s - 1)
    k_t = k[tsid]                                     # [T, C, kvh, hd]
    v_t = v[tsid]
    group = nh // kvh
    qg = q.reshape(t, kvh, group, hd).astype(jnp.float32)
    scores = jnp.einsum("tkgd,tckd->tkgc", qg, k_t.astype(jnp.float32)) * sm_scale

    # causal visibility: a token at absolute position p sees kv slots [0, p+1)
    # — or [p+1-W, p+1) with a sliding window of W (Mistral)
    cols = jnp.arange(ctx, dtype=jnp.int32)[None, :]
    visible = cols < (positions + 1)[:, None]
    if sliding_window is not None:
        visible &= cols >= (positions + 1 - sliding_window)[:, None]
    scores = jnp.where(visible[:, None, None, :], scores, MASK_VALUE)

    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("tkgc,tckd->tkgd", p, v_t.astype(jnp.float32))
    return out.reshape(t, nh, hd).astype(q.dtype)


def paged_attention(
    q,
    kv_pages,
    layer,
    pages_per_layer,
    kv_lens,
    page_indices,
    token_seq,
    positions,
    segments: tuple[int, int, int],
    *,
    sm_scale: float,
    impl: str = "ref",
    sliding_window: int | None = None,
    knobs=None,
    new_kv=None,
):
    """Dispatch over the segmented layout; returns [T, nh, hd] — or
    (out, updated kv_pages) when ``new_kv`` requests the fused decode write.

    ``knobs`` (ops.ragged_paged_attention.AttnKnobs) carries the kernel
    tuning parameters; None resolves from env/defaults.  ``new_kv`` is the
    decode segment's (rows, scale) pair (see ragged_paged_attention_pallas);
    pallas-only."""
    if impl == "ref":
        assert new_kv is None, "fused KV write is pallas-only"
        return ragged_paged_attention_ref(
            q, kv_pages, layer, pages_per_layer, page_indices, token_seq,
            positions, sm_scale=sm_scale, sliding_window=sliding_window,
        )
    if impl != "pallas":
        raise ValueError(f"unknown attention impl: {impl}")

    from nanovllm_tpu.ops.ragged_paged_attention import ragged_paged_attention_pallas

    interpret = jax.default_backend() != "tpu"
    dec_end, p_start, p_end = segments
    out = jnp.zeros_like(q)
    if dec_end > 0:
        dec = ragged_paged_attention_pallas(
            q[:dec_end], kv_pages, layer, pages_per_layer, kv_lens,
            page_indices, token_seq[:dec_end], positions[:dec_end],
            sm_scale=sm_scale, q_tile=1, interpret=interpret,
            sliding_window=sliding_window, knobs=knobs, new_kv=new_kv,
        )
        if new_kv is not None:
            dec, kv_pages = dec
        out = out.at[:dec_end].set(dec)
    if p_end > p_start:
        pre = ragged_paged_attention_pallas(
            q[p_start:p_end], kv_pages, layer, pages_per_layer, kv_lens,
            page_indices, token_seq[p_start:p_end:PREFILL_TILE],
            positions[p_start:p_end:PREFILL_TILE],
            sm_scale=sm_scale, q_tile=PREFILL_TILE, interpret=interpret,
            sliding_window=sliding_window, knobs=knobs,
        )
        out = out.at[p_start:p_end].set(pre)
    return (out, kv_pages) if new_kv is not None else out
