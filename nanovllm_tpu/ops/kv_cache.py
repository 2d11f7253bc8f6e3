"""Paged KV-cache write (slot scatter).

TPU-native equivalent of the reference's Triton ``store_kvcache_kernel``
(reference attention.py:34-90): scatter each new token's K/V row into the
block-table cache at ``slot_mapping[t]``; ``slot == -1`` marks padding and is
skipped — here by mapping it to an out-of-bounds page index and scattering
with ``mode="drop"``.

Cache layout: ``[L * pages_per_layer, page_size, 2 * num_kv_heads, head_dim]``
with K/V interleaved on the head axis (head j's K at 2j, V at 2j+1), layer
folded into the leading page axis.  Page-major-then-slot order makes each
token's written row ``[2kvh, hd]`` *contiguous*, which is what lets XLA keep
the scatter in place in the array's default layout — a head-major layout made
XLA pick a transposed internal layout and insert a full-cache copy (12.6 GB)
at program entry.  One page DMA still fetches both K and V.
"""

import jax.numpy as jnp


def write_kv_pages(
    kv_pages: jnp.ndarray,      # [L * pages_per_layer, page, 2*kvh, hd]
    layer,                      # scalar int32 layer index
    pages_per_layer: int,
    k: jnp.ndarray,             # [T, kvh, hd]
    v: jnp.ndarray,             # [T, kvh, hd]
    slot_mapping: jnp.ndarray,  # [T] int32 global slots; -1 = skip (padding)
) -> jnp.ndarray:
    """Scatter directly into the full multi-layer cache.

    The cache is FLAT 4D with the layer folded into the leading page axis
    (global page = layer * pages_per_layer + page).  This shape is
    load-bearing, measured on v5e (see module docstring): flat dim-0 advanced
    indexing + contiguous written rows are what keep the scatter truly
    in place on the loop-carried buffer — 5D [L, P, ...] indexing or a
    head-major layout each cost an extra full-cache HBM copy per step.
    """
    total_pages = kv_pages.shape[0]
    page_size = kv_pages.shape[1]
    t, kvh, hd = k.shape
    slot = slot_mapping
    # -1 slots -> out-of-bounds page -> dropped by the scatter
    page_idx = jnp.where(
        slot >= 0, layer * pages_per_layer + slot // page_size, total_pages
    ).astype(jnp.int32)
    offset = jnp.where(slot >= 0, slot % page_size, 0).astype(jnp.int32)
    kv = jnp.stack([k, v], axis=2).reshape(t, 2 * kvh, hd).astype(kv_pages.dtype)
    return kv_pages.at[page_idx, offset].set(kv, mode="drop")


def split_kv_pages(kv_pages: jnp.ndarray):
    """View the interleaved cache as (k, v): each [LP, page, kvh, hd]."""
    lp, page, kvh2, hd = kv_pages.shape
    kv = kv_pages.reshape(lp, page, kvh2 // 2, 2, hd)
    return kv[:, :, :, 0], kv[:, :, :, 1]
