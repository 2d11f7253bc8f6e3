"""Paged KV-cache write (slot scatter).

TPU-native equivalent of the reference's Triton ``store_kvcache_kernel``
(reference attention.py:34-90): scatter each new token's K/V row into the
block-table cache at ``slot_mapping[t]``; ``slot == -1`` marks padding and is
skipped — here by mapping it to an out-of-bounds page index and scattering
with ``mode="drop"``.

Cache layout (bf16 / INT8): ``[2 * L * pages_per_layer, page_size,
kvh * hd]`` — *split planes*: logical page ``gp`` stores its K rows in plane
``2*gp`` and its V rows in plane ``2*gp + 1``, layer folded into the leading
plane axis, head rows pre-flattened to ``kvh*hd`` lanes (head h = lane
window ``[h*hd, (h+1)*hd)``).  The flat 3-D plane-major order keeps each
written row contiguous, which is what lets XLA keep the scatter in place in
the array's default layout — a head-major layout made XLA pick a transposed
internal layout and insert a full-cache copy (12.6 GB) at program entry.
The flattened row matters because XLA tiles HBM arrays: a [.., kvh, hd] ->
[.., kvh*hd] reshape at attention time materialized a full cache copy per
step (7.9 ms measured).

Why split planes instead of per-head K/V interleaved rows (the round-1..3
layout): the decode kernel's block-diagonal dot contracts over a whole page
row — with K/V interleaved, the V columns ride along as zero blocks in the
score dot and the K columns in the PV dot, doubling both dots' width.  With
split planes the kernel gets each plane as a contiguous ``[w, kvh*hd]``
matrix with no in-kernel slicing (an attempted same-buffer head-axis slice
cost a Mosaic relayout copy worth ~2.5 us/page-group), halving the MXU work
per page.  KV4 is the exception: it packs head j's K and V nibbles into one
byte, so it keeps ONE plane per logical page and its scale plane keeps the
per-head interleaved row order (K at 2j, V at 2j+1); the split-plane caches
use blocked scale rows (K at j, V at kvh + j).
"""

import jax.numpy as jnp
from jax import lax


def is_quantized_cache(kv_pages) -> bool:
    """True when the cache is the INT8 {"data", "scale"} pair."""
    return isinstance(kv_pages, dict)


PAGE_SENTINEL = 1 << 30  # padded prefill_pages entry: clamps to a real plane, matches no slot -> no-op rewrite


def _quantize_rows(kv: jnp.ndarray, bits: int = 8):
    """Dynamic per-(token, head) symmetric int8/int4 quantization.

    Returns (q, scale [T, 2kvh]): int8 -> q [T, 2kvh, hd] int8; int4 ->
    head h's K element in the LOW nibble and its V element in the HIGH
    nibble of one byte, q [T, kvh, hd] int8.  K/V-paired packing keeps every
    row/page slice 128 lanes wide (head_dim intact) — the TPU DMA tiling
    rejects 64-lane slices, and nibble-interleave unpacks are "unsupported
    shape cast" in Mosaic, while this layout unpacks with two shifts and no
    relayout at all."""
    kvf = kv.astype(jnp.float32)
    qmax = 127.0 if bits == 8 else 7.0
    scale = jnp.max(jnp.abs(kvf), axis=-1) / qmax
    safe = jnp.maximum(scale, 1e-10)
    q = jnp.clip(jnp.round(kvf / safe[..., None]), -qmax, qmax)
    if bits == 8:
        return q.astype(jnp.int8), scale
    qi = q.astype(jnp.int32)
    packed = (qi[..., 0::2, :] & 0xF) | ((qi[..., 1::2, :] & 0xF) << 4)
    packed = lax.bitcast_convert_type(packed.astype(jnp.uint8), jnp.int8)
    return packed, scale


def cache_kv_bits(kv_pages) -> int:
    """8 or 4: KV4 packs K and V of a head into one byte, so it has ONE data
    plane per logical page (same leading count as the scale plane); the
    split-plane INT8 cache has two."""
    if not is_quantized_cache(kv_pages):
        return 8
    return 4 if kv_pages["data"].shape[0] == kv_pages["scale"].shape[0] else 8


def _write_rows_scatter(kv_pages, layer, pages_per_layer, kv, slot):
    """Row-scatter write (decode-scale batches: XLA scatter serializes at
    ~13us per update row, so this path is reserved for small T)."""
    quant = is_quantized_cache(kv_pages)
    data = kv_pages["data"] if quant else kv_pages
    bits = cache_kv_bits(kv_pages)
    total_planes = data.shape[0]
    page_size = data.shape[1]
    lpage = (layer * pages_per_layer + slot // page_size).astype(jnp.int32)
    valid = slot >= 0
    offset = jnp.where(valid, slot % page_size, 0).astype(jnp.int32)

    if quant:
        rows, scale = _quantize_rows(kv, bits=bits)
    else:
        rows, scale = kv.astype(data.dtype), None

    t = kv.shape[0]
    if bits == 4:
        pidx = jnp.where(valid, lpage, total_planes)
        new_data = data.at[pidx, offset].set(rows.reshape(t, -1), mode="drop")
    else:
        # split planes: token's K row -> plane 2*lpage, V row -> 2*lpage + 1;
        # one scatter with 2T row updates (invalid rows map past the plane
        # count -> drop).  NOTE a windowed lax.scatter of [2, 1, D] blocks
        # (T updates) made XLA pick a transposed operand layout and insert a
        # full-cache copy (11.7 GB OOM) — the plain dim-0/dim-1 .at[] row
        # scatter is the form XLA keeps in place.
        kvh = rows.shape[1] // 2
        pk = jnp.where(valid, 2 * lpage, total_planes)
        idx = jnp.concatenate([pk, pk + 1])
        off2 = jnp.concatenate([offset, offset])
        rows2 = jnp.concatenate(
            [rows[:, :kvh], rows[:, kvh:]]
        ).reshape(2 * t, -1)
        new_data = data.at[idx, off2].set(rows2, mode="drop")

    if not quant:
        return new_data
    # scale layout [LP, 2kvh, page] (ONE plane per logical page): page on the
    # lane axis — a [.., page, 2kvh] layout lane-pads 2kvh (16) up to 128,
    # an 8x HBM blowup
    spidx = jnp.where(valid, lpage, kv_pages["scale"].shape[0])
    return {
        "data": new_data,
        "scale": kv_pages["scale"].at[spidx, :, offset].set(
            scale, mode="drop"
        ),
    }


def _write_rows_planes(kv_pages, layer, pages_per_layer, kv, slot, pages):
    """Page-plane write for prefill chunks.

    ``pages`` is [PP, 2] int32: (layer-relative page id, token-row offset of
    that page's first written slot within this segment), host-enumerated.
    For each written page: slice the <= page_size candidate token rows
    (prefill slots are contiguous per chunk, so one page's writers form one
    run), build the page's new contents with a one-hot matmul (each written
    slot is hit by exactly one token, so the bf16 matmul is exact), merge
    with the old plane, and dynamic-update-slice it back in place.

    Why this shape: XLA's row scatter serializes per update row (~13us/row =
    ~27ms for a 2048-token chunk, per array, per layer), and a whole-cache
    gather formulation (`data[gpp]`) made XLA materialize a half-cache
    (5.9 GB) temp.  Per-page dynamic slices keep temps at one page and the
    work pure MXU/vector.  Sentinel pages clamp to a real plane but match no
    slots, so they rewrite the old contents verbatim (a no-op).
    """
    quant = is_quantized_cache(kv_pages)
    data = kv_pages["data"] if quant else kv_pages
    bits = cache_kv_bits(kv_pages)
    split = bits != 4
    planes = 2 if split else 1
    total = data.shape[0] // planes            # logical pages
    page_size = data.shape[1]
    t = kv.shape[0]
    pp = pages.shape[0]
    d = data.shape[2]                          # per-plane row width (kvh*hd)

    if quant:
        # int8/int4-packed rows; packed bytes are integers in [-128, 127] and
        # survive the bf16 one-hot matmul below exactly
        rows, scale_rows = _quantize_rows(kv, bits=bits)
        scale = kv_pages["scale"]
    else:
        rows, scale_rows, scale = kv, None, None
    rows = rows.reshape(t, -1)                 # [T, planes * d]

    sl = min(page_size, t)
    offs = jnp.arange(page_size, dtype=jnp.int32)
    for i in range(pp):                                    # static unroll
        page_i = pages[i, 0]
        tok0 = jnp.clip(pages[i, 1], 0, t - sl)
        gp = jnp.clip(layer * pages_per_layer + page_i, 0, total - 1)
        rslot = lax.dynamic_slice_in_dim(slot, tok0, sl)
        hit = (
            (rslot[:, None] >= 0)
            & ((rslot[:, None] // page_size) == page_i)
            & ((rslot[:, None] % page_size) == offs[None, :])
        )                                                  # [sl, page] bool
        oh = hit.astype(jnp.bfloat16 if quant else data.dtype)
        new = lax.dot_general(
            oh, lax.dynamic_slice_in_dim(rows, tok0, sl).astype(oh.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),    # [page, planes*D]
            preferred_element_type=jnp.float32,
        )
        written = jnp.any(hit, axis=0)                     # [page]
        old = lax.dynamic_slice_in_dim(data, planes * gp, planes)
        # split planes: new's row is [K row | V row] — regroup to plane-major
        new_pm = new.reshape(page_size, planes, d).transpose(1, 0, 2)
        merged = jnp.where(
            written[None, :, None],
            new_pm.astype(data.dtype),
            old.reshape(planes, page_size, d),
        )
        data = lax.dynamic_update_slice_in_dim(
            data, merged.reshape(old.shape), planes * gp, 0
        )
        if quant:
            snew = lax.dot_general(
                hit.astype(jnp.float32),
                lax.dynamic_slice_in_dim(scale_rows, tok0, sl),
                dimension_numbers=(((0,), (0,)), ((), ())),  # [page, 2kvh]
            )
            sold = lax.dynamic_slice_in_dim(scale, gp, 1)    # [1, 2kvh, page]
            smerged = jnp.where(written[None, :], snew.T, sold[0])
            scale = lax.dynamic_update_slice_in_dim(scale, smerged[None], gp, 0)

    return {"data": data, "scale": scale} if quant else data


def write_kv_pages(
    kv_pages,                   # [2*LP, page, kvh*hd] split-plane array, or
                                # {"data": int8 [2*LP, page, kvh*hd],
                                #  "scale": f32 [LP, 2kvh, page]} for KV8
    layer,                      # scalar int32 layer index
    pages_per_layer: int,
    k: jnp.ndarray,             # [T, kvh, hd]
    v: jnp.ndarray,             # [T, kvh, hd]
    slot_mapping: jnp.ndarray,  # [T] int32 global slots; -1 = skip (padding)
    segments: tuple[int, int, int] | None = None,
    prefill_pages: jnp.ndarray | None = None,  # [PP, 2] (page id, token-row start)
    impl: str = "ref",          # accepted for API symmetry with attention;
                                # the decode write is always the row scatter
    interpret: bool | None = None,  # unused (kept for call-site symmetry)
    skip_decode: bool = False,  # decode rows written by the FUSED attention
                                # kernel instead (ragged_paged_attention
                                # new_kv); only the prefill segment written
):
    """Scatter directly into the full multi-layer cache.

    The cache is FLAT 3D with the layer folded into the leading plane axis
    (logical page = layer * pages_per_layer + page; split-plane caches store
    K at plane 2*gp and V at 2*gp + 1).  This shape is load-bearing,
    measured on v5e (see module docstring): flat dim-0 advanced indexing +
    contiguous written rows are what keep the scatter truly in place on the
    loop-carried buffer — 5D [L, P, ...] indexing or a head-major layout
    each cost an extra full-cache HBM copy per step.

    INT8 KV mode quantizes symmetrically per (token, head) with a dynamic
    scale stored alongside (attention dequantizes in-kernel; ~2x KV capacity
    and read bandwidth, BASELINE "KV8").
    """
    del impl, interpret
    t, kvh, hd = k.shape
    # Decode-segment writes are the batched XLA row scatter: the 3-D
    # [planes, page, kvh*hd] cache puts the page slot on the second-minor
    # (sublane-tiled) dim, where Mosaic rejects single-row DMA slices
    # ("slice shape along dimension 1 must be aligned to tiling") — the
    # round-1..3 raw-DMA decode write kernel needed the retired 4-D
    # [.., page, 2kvh, hd] layout whose slot dim was untiled.  Measured:
    # the scatter costs ~the same as that kernel did (~28 us/layer at 256
    # lanes) while the 3-D layout wins ~7 ms/iter on the attention side.
    if cache_kv_bits(kv_pages) == 4:
        # KV4 packs head j's K/V nibbles into one byte: _quantize_rows pairs
        # ADJACENT rows, so the row order must interleave (K at 2j, V at 2j+1)
        kv = jnp.stack([k, v], axis=2).reshape(t, 2 * kvh, hd)
    else:
        # blocked row [K heads | V heads] — see module docstring
        kv = jnp.concatenate([k, v], axis=1)
    write_rows = _write_rows_scatter

    if segments is None or prefill_pages is None or segments[2] <= segments[1]:
        if skip_decode:
            return kv_pages
        return write_rows(kv_pages, layer, pages_per_layer, kv, slot_mapping)

    dec_end, p_start, p_end = segments
    out = kv_pages
    if dec_end > 0 and not skip_decode:
        out = write_rows(
            out, layer, pages_per_layer, kv[:dec_end], slot_mapping[:dec_end]
        )
    # gap/tail padding rows carry slot -1 and are outside both slices
    return _write_rows_planes(
        out, layer, pages_per_layer, kv[p_start:p_end],
        slot_mapping[p_start:p_end], prefill_pages,
    )


def split_kv_pages(kv_pages: jnp.ndarray):
    """View the split-plane cache as (k, v): each [LP, page, kvh * hd]."""
    return kv_pages[0::2], kv_pages[1::2]
