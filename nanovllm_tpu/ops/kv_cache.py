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

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    """8 or 4: a KV4 cache's data plane carries kvh head rows against the
    scale plane's 2kvh (K and V share a byte per head)."""
    if not is_quantized_cache(kv_pages):
        return 8
    return 4 if kv_pages["data"].shape[-2] * 2 == kv_pages["scale"].shape[-2] else 8


def _write_rows_scatter(kv_pages, layer, pages_per_layer, kv, slot):
    """Row-scatter write (decode-scale batches: XLA scatter serializes at
    ~13us per update row, so this path is reserved for small T)."""
    data = kv_pages["data"] if is_quantized_cache(kv_pages) else kv_pages
    total_pages = data.shape[0]
    page_size = data.shape[1]
    page_idx = jnp.where(
        slot >= 0, layer * pages_per_layer + slot // page_size, total_pages
    ).astype(jnp.int32)
    offset = jnp.where(slot >= 0, slot % page_size, 0).astype(jnp.int32)

    if not is_quantized_cache(kv_pages):
        return data.at[page_idx, offset].set(kv.astype(data.dtype), mode="drop")

    q, scale = _quantize_rows(kv, bits=cache_kv_bits(kv_pages))
    # scale layout [LP, 2kvh, page]: page on the lane axis — a [.., page, 2kvh]
    # layout lane-pads 2kvh (16) up to 128, an 8x HBM blowup
    return {
        "data": data.at[page_idx, offset].set(q, mode="drop"),
        "scale": kv_pages["scale"].at[page_idx, :, offset].set(
            scale, mode="drop"
        ),
    }


def _dma_write_kernel(layer_ref, slots_ref, *refs, pages_per_layer, page_size,
                      quant: bool, t: int):
    """Decode KV write as raw DMAs: token i's [2kvh, hd] row lands at
    (page, offset) decoded from ``slots_ref[i]``; slot < 0 rows are skipped.

    XLA's row scatter costs ~25 us/layer for 256 rows (it serializes update
    rows); here all rows are in flight at once — two fori_loops issue every
    start, then collect every wait, all on one semaphore per plane (every
    copy of a plane moves the same byte count, so waits are exchangeable).
    """
    # the aliased cache input (_din) still appears as a ref; the kernel only
    # touches the output side of the alias
    rows_ref, _din, data_out, sem = refs
    del quant
    layer = layer_ref[0]

    def copy(i):
        s = slots_ref[i]
        gp = layer * pages_per_layer + s // page_size
        off = s % page_size
        return pltpu.make_async_copy(rows_ref.at[i], data_out.at[gp, off], sem)

    def run(phase):
        def body(i, _):
            @pl.when(slots_ref[i] >= 0)
            def _():
                getattr(copy(i), phase)()
            return 0
        lax.fori_loop(0, t, body, 0)

    run("start")
    run("wait")


def _write_rows_dma(kv_pages, layer, pages_per_layer, kv, slot,
                    interpret=False):
    """Pallas decode-segment DATA write: in-place (aliased) DMA scatter.

    INT8 scales keep the XLA scatter: a token's scale column is a 1-lane
    slice of the [LP, 2kvh, page] plane, below the (8, 128) DMA tiling.
    """
    quant = is_quantized_cache(kv_pages)
    data = kv_pages["data"] if quant else kv_pages
    page_size = data.shape[1]
    t = kv.shape[0]
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    if quant:
        rows, scale = _quantize_rows(kv, bits=cache_kv_bits(kv_pages))
    else:
        rows, scale = kv.astype(data.dtype), None

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    kernel = functools.partial(
        _dma_write_kernel,
        pages_per_layer=pages_per_layer,
        page_size=page_size,
        quant=quant,
        t=t,
    )
    new_data = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(data.shape, data.dtype),
        # alias indices count the pallas_call operand list INCLUDING the
        # scalar-prefetch args (layer, slots) at positions 0-1
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(layer_arr, slot, rows, data)
    if not quant:
        return new_data

    total_pages = data.shape[0]
    page_idx = jnp.where(
        slot >= 0, layer * pages_per_layer + slot // page_size, total_pages
    ).astype(jnp.int32)
    offset = jnp.where(slot >= 0, slot % page_size, 0).astype(jnp.int32)
    return {
        "data": new_data,
        "scale": kv_pages["scale"].at[page_idx, :, offset].set(
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
    total = data.shape[0]
    page_size = data.shape[1]
    t = kv.shape[0]
    pp = pages.shape[0]
    d = data.shape[2] * data.shape[3]  # packed row width (int4: hd//2)

    if quant:
        # int8/int4-packed rows; packed bytes are integers in [-128, 127] and
        # survive the bf16 one-hot matmul below exactly
        rows, scale_rows = _quantize_rows(kv, bits=cache_kv_bits(kv_pages))
        scale = kv_pages["scale"]
    else:
        rows, scale_rows, scale = kv, None, None
    rows = rows.reshape(t, -1)

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
            dimension_numbers=(((0,), (0,)), ((), ())),    # [page, D]
            preferred_element_type=jnp.float32,
        )
        written = jnp.any(hit, axis=0)                     # [page]
        old = lax.dynamic_slice_in_dim(data, gp, 1)        # [1, page, 2kvh, hd]
        merged = jnp.where(
            written[:, None], new.astype(data.dtype), old.reshape(page_size, d)
        )
        data = lax.dynamic_update_slice_in_dim(
            data, merged.reshape(old.shape), gp, 0
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
    kv_pages,                   # [LP, page, 2*kvh, hd] array, or
                                # {"data": int8 [LP, page, 2kvh, hd],
                                #  "scale": f32 [LP, 2kvh, page]} for KV8
    layer,                      # scalar int32 layer index
    pages_per_layer: int,
    k: jnp.ndarray,             # [T, kvh, hd]
    v: jnp.ndarray,             # [T, kvh, hd]
    slot_mapping: jnp.ndarray,  # [T] int32 global slots; -1 = skip (padding)
    segments: tuple[int, int, int] | None = None,
    prefill_pages: jnp.ndarray | None = None,  # [PP, 2] (page id, token-row start)
    impl: str = "ref",          # "pallas" = DMA scatter for the decode segment
    interpret: bool | None = None,  # None: interpret iff not on a real TPU
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
    t, kvh, hd = k.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kv = jnp.stack([k, v], axis=2).reshape(t, 2 * kvh, hd)
    write_rows = (
        functools.partial(_write_rows_dma, interpret=interpret)
        if impl == "pallas" else _write_rows_scatter
    )

    if segments is None or prefill_pages is None or segments[2] <= segments[1]:
        return write_rows(kv_pages, layer, pages_per_layer, kv, slot_mapping)

    dec_end, p_start, p_end = segments
    out = kv_pages
    if dec_end > 0:
        out = write_rows(
            out, layer, pages_per_layer, kv[:dec_end], slot_mapping[:dec_end]
        )
    # gap/tail padding rows carry slot -1 and are outside both slices
    return _write_rows_planes(
        out, layer, pages_per_layer, kv[p_start:p_end],
        slot_mapping[p_start:p_end], prefill_pages,
    )


def split_kv_pages(kv_pages: jnp.ndarray):
    """View the interleaved cache as (k, v): each [LP, page, kvh, hd]."""
    lp, page, kvh2, hd = kv_pages.shape
    kv = kv_pages.reshape(lp, page, kvh2 // 2, 2, hd)
    return kv[:, :, :, 0], kv[:, :, :, 1]
