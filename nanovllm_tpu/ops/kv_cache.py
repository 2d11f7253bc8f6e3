"""Paged KV-cache write (slot scatter).

TPU-native equivalent of the reference's Triton ``store_kvcache_kernel``
(reference attention.py:34-90): scatter each new token's K/V row into the
block-table cache at ``slot_mapping[t]``; ``slot == -1`` marks padding and is
skipped — here by mapping it to an out-of-bounds page index and scattering
with ``mode="drop"``.

Cache layout: ``[num_pages, 2 * num_kv_heads, page_size, head_dim]`` with K/V
interleaved on the head axis (head j's K at 2j, V at 2j+1).  Heads lead the
page axis so the attention kernel can slice K and V off a loaded page with
leading-axis strides (address arithmetic) instead of lane shuffles, and one
page DMA fetches both K and V.
"""

import jax.numpy as jnp


def write_kv_pages(
    kv_pages: jnp.ndarray,      # [P, 2*kvh, page_size, hd]
    k: jnp.ndarray,             # [T, kvh, hd]
    v: jnp.ndarray,             # [T, kvh, hd]
    slot_mapping: jnp.ndarray,  # [T] int32 global slots; -1 = skip (padding)
) -> jnp.ndarray:
    num_pages, _, page_size, _ = kv_pages.shape
    t, kvh, hd = k.shape
    slot = slot_mapping
    # -1 slots -> page index num_pages (out of bounds) -> dropped by scatter
    page_idx = jnp.where(slot >= 0, slot // page_size, num_pages).astype(jnp.int32)
    offset = jnp.where(slot >= 0, slot % page_size, 0).astype(jnp.int32)
    kv = jnp.stack([k, v], axis=2).reshape(t, 2 * kvh, hd).astype(kv_pages.dtype)
    return kv_pages.at[page_idx, :, offset].set(kv, mode="drop")


def split_kv_pages(kv_pages: jnp.ndarray):
    """View the interleaved cache as (k, v): each [P, kvh, page, hd]."""
    p, kvh2, page, hd = kv_pages.shape
    kv = kv_pages.reshape(p, kvh2 // 2, 2, page, hd)
    return kv[:, :, 0], kv[:, :, 1]
