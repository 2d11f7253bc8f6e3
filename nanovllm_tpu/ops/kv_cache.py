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


def is_quantized_cache(kv_pages) -> bool:
    """True when the cache is the INT8 {"data", "scale"} pair."""
    return isinstance(kv_pages, dict)


def write_kv_pages(
    kv_pages,                   # [LP, page, 2*kvh, hd] array, or
                                # {"data": int8 [LP, page, 2kvh, hd],
                                #  "scale": f32 [LP, page, 2kvh]} for KV8
    layer,                      # scalar int32 layer index
    pages_per_layer: int,
    k: jnp.ndarray,             # [T, kvh, hd]
    v: jnp.ndarray,             # [T, kvh, hd]
    slot_mapping: jnp.ndarray,  # [T] int32 global slots; -1 = skip (padding)
):
    """Scatter directly into the full multi-layer cache.

    The cache is FLAT 4D with the layer folded into the leading page axis
    (global page = layer * pages_per_layer + page).  This shape is
    load-bearing, measured on v5e (see module docstring): flat dim-0 advanced
    indexing + contiguous written rows are what keep the scatter truly
    in place on the loop-carried buffer — 5D [L, P, ...] indexing or a
    head-major layout each cost an extra full-cache HBM copy per step.

    INT8 KV mode quantizes symmetrically per (token, head) with a dynamic
    scale stored alongside (attention dequantizes in-kernel; ~2x KV capacity
    and read bandwidth, BASELINE "KV8").
    """
    data = kv_pages["data"] if is_quantized_cache(kv_pages) else kv_pages
    total_pages = data.shape[0]
    page_size = data.shape[1]
    t, kvh, hd = k.shape
    slot = slot_mapping
    # -1 slots -> out-of-bounds page -> dropped by the scatter
    page_idx = jnp.where(
        slot >= 0, layer * pages_per_layer + slot // page_size, total_pages
    ).astype(jnp.int32)
    offset = jnp.where(slot >= 0, slot % page_size, 0).astype(jnp.int32)
    kv = jnp.stack([k, v], axis=2).reshape(t, 2 * kvh, hd)

    if not is_quantized_cache(kv_pages):
        return data.at[page_idx, offset].set(kv.astype(data.dtype), mode="drop")

    kvf = kv.astype(jnp.float32)
    scale = jnp.max(jnp.abs(kvf), axis=-1) / 127.0          # [T, 2kvh]
    safe = jnp.maximum(scale, 1e-10)
    q = jnp.clip(jnp.round(kvf / safe[..., None]), -127, 127).astype(jnp.int8)
    # scale layout [LP, 2kvh, page]: page on the lane axis — a [.., page, 2kvh]
    # layout lane-pads 2kvh (16) up to 128, an 8x HBM blowup
    return {
        "data": data.at[page_idx, offset].set(q, mode="drop"),
        "scale": kv_pages["scale"].at[page_idx, :, offset].set(
            scale, mode="drop"
        ),
    }


def split_kv_pages(kv_pages: jnp.ndarray):
    """View the interleaved cache as (k, v): each [LP, page, kvh, hd]."""
    lp, page, kvh2, hd = kv_pages.shape
    kv = kv_pages.reshape(lp, page, kvh2 // 2, 2, hd)
    return kv[:, :, :, 0], kv[:, :, :, 1]
