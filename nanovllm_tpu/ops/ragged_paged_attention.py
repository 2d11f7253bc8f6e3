"""Pallas TPU kernel: ragged paged attention (mixed prefill + decode).

Our Pallas replacement for the reference's FlashAttention-2 CUDA calls
(reference attention.py:222-248).  Design:

  * **One seq per query tile.**  The host lays out query tokens so every
    Q_TILE-row tile belongs to exactly one sequence (tokens scattered to
    tile-aligned rows; see engine/batch.py tile metadata).  Decode steps use a
    small Q_TILE (8), prefill/mixed steps a large one (128) — tile size is a
    static bucket parameter, so each mode compiles once.
  * **Grid = (num_tiles, max_pages).**  The page axis walks the sequence's
    block table; the KV page for step (t, p) is DMA'd by the BlockSpec
    index_map reading the scalar-prefetched page table
    (``page_indices[tile_seq[t], p]``) — the classic TPU paged-attention
    pattern, giving automatic double-buffering of page fetches.
  * **Flash-style online softmax** in fp32 scratch across the page axis
    (m/l/acc), GQA packed as [kvh, Q_TILE * group, hd] so the per-kv-head
    matmuls hit the MXU with batched dot_general.
  * Pages past a sequence's ``kv_len`` are skipped with ``@pl.when`` (their
    index_map clamps to the table's padding entry, page 0).

KV cache layout: [2*L*pages_per_layer, page_size, kvh*hd] (flat, plane-major;
see ops/kv_cache.py for why that exact order is load-bearing): logical page
gp's K rows live in plane 2*gp, its V rows in 2*gp + 1.  One strided DMA
fetches both planes, and each lands contiguous in the slot buffer, so the
kernel gets separate [w, kvh*hd] K and V matrices with no in-kernel slicing —
halving the width of both block-diagonal MXU dots vs the old interleaved
layout (V columns rode along as zero blocks in the score dot and vice versa).
Pages are stored pre-flattened to [page, kvh*hd] rows because XLA tiles HBM
arrays: a per-step [.., kvh, hd] -> [.., kvh*hd] reshape materialized a full
cache copy (measured 7.9 ms/step), and the same reshape inside the kernel is
a sublane->lane relayout (measured ~2.5 us/page-group).  Head h of a plane is
the 128-aligned lane window [h*hd, (h+1)*hd) — sliced for free.
KV4 is the exception: its packed byte plane carries one plane per logical
page and its scale plane keeps the per-head interleaved order (K at 2j, V at
2j+1); split-plane scales are blocked (K at j, V at kvh + j).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e30


def _unpack_int4_kv(x):
    """KV4 K/V-paired bytes [..., kvh, hd] -> (k, v) int32, each
    [..., kvh, hd] (K = low nibble, V = high — see kv_cache._quantize_rows).
    Two shifts, zero relayout; shifts run in int32 (no int8 shli
    legalization in Mosaic)."""
    p32 = x.astype(jnp.int32)
    k = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    v = jnp.right_shift(jnp.left_shift(p32, 24), 28)
    return k, v

import dataclasses
import os as _os


@dataclasses.dataclass(frozen=True)
class AttnKnobs:
    """Kernel tuning knobs (hashable; carried on ModelSpec so they are part
    of every jitted program's identity — two engines in one process can
    diverge).  Resolution order: NVT_* env var > Config field > default.

    decode_npp — KV pages fetched+processed per decode loop iteration.
      Raising it widens the per-head dots and cuts loop-iteration count at
      the price of VMEM (2 * npp * page bytes) and tail-group fetch waste
      on short sequences.
    decode_xlane — cross-lane DMA prefetch: while lane t computes, the next
      live lane's first page group is already in flight (see _decode_kernel).
      Measured: 843 -> 560 us/layer (1.80x -> 1.19x HBM speed-of-light) at
      128 live lanes / ctx 1024 / KV8; bench.py 3215 -> 4228 tok/s.
    decode_ring — depth of the cross-lane DMA ring (work items in flight).
      2 = the plain double buffer; deeper rings hide per-DMA issue latency
      at short contexts where one lane's fetch (~1.5us) exceeds its compute
      (~1us).  VMEM cost: ring * npp * page * 2kvh * hd bytes.
    decode_tpp — tail-phase width (pages per narrow sub-step) for the
      decode kernel's final partial page group; 0 disables the tail phase.
    prefill_manual — route prefill tiles (q_tile > 1) through the same
      manual-DMA kernel instead of the BlockSpec-grid kernel: grid steps
      cover only real page groups and the online softmax is carried as loop
      values instead of VMEM scratch round-trips per (tile, page).
    prefill_npp / prefill_ring — prefill variant sizing: the per-head loop
      is statically unrolled and Mosaic keeps every head's [qg, npp*page]
      temporaries live, so the group width must stay inside the scoped-VMEM
      budget; long prefill page walks double-buffer fine in-lane, so a
      2-deep ring suffices.
    """

    decode_npp: int = 8
    decode_xlane: bool = True
    decode_ring: int = 4
    decode_tpp: int = 2
    prefill_manual: bool = True
    prefill_npp: int = 4
    prefill_ring: int = 2
    # Fuse the decode-segment KV write into the decode kernel: the kernel
    # patches the fetched current page in VMEM from dense per-lane new-K/V
    # inputs and DMAs the tiling-aligned 32-row slab back to HBM — the page
    # READ is free (attention fetches it anyway), replacing the XLA row
    # scatter whose tile read-modify-write cost 2.17 ms/iter at 256 lanes
    # (ops/kv_cache.py).  KV4 keeps the scatter (nibble packing).
    fused_kv_write: bool = True

    def __post_init__(self):
        object.__setattr__(self, "decode_ring", max(2, self.decode_ring))
        object.__setattr__(self, "prefill_ring", max(2, self.prefill_ring))
        assert self.decode_npp >= 1 and self.prefill_npp >= 1

    @classmethod
    def resolve(cls, config=None) -> "AttnKnobs":
        """Env > config > default, per field (env kept as the A/B override
        so bench tools keep working without config plumbing)."""
        env = {
            "decode_npp": ("NVT_DECODE_NPP", int),
            "decode_xlane": ("NVT_DECODE_XLANE", lambda v: v == "1"),
            "decode_ring": ("NVT_DECODE_RING", int),
            "decode_tpp": ("NVT_DECODE_TPP", int),
            "prefill_manual": ("NVT_PREFILL_MANUAL", lambda v: v == "1"),
            "prefill_npp": ("NVT_PREFILL_NPP", int),
            "prefill_ring": ("NVT_PREFILL_RING", int),
            "fused_kv_write": ("NVT_FUSED_KV", lambda v: v == "1"),
        }
        vals = {}
        for field, (name, cast) in env.items():
            raw = _os.environ.get(name)
            if raw is not None:
                vals[field] = cast(raw)
                continue
            cfg = getattr(config, "attn_" + field, None) if config else None
            if cfg is not None:
                vals[field] = cfg
        return cls(**vals)


def _attn_kernel(
    # scalar prefetch
    layer_ref,       # [1] int32: which layer of the full cache to read
    tile_seq_ref,    # [NT] int32: sequence id per query tile
    tile_kvpos_ref,  # [NT] int32: kv position of the tile's first query token
    kv_lens_ref,     # [S] int32
    page_indices_ref,  # [S, PPS] int32
    # inputs: q_ref, kv_ref[, scale_ref], then outputs and scratch
    *refs,
    sm_scale: float,
    page_size: int,
    group: int,
    q_tile: int,
    kv_int8: bool,
    window: int | None = None,
):
    if kv_int8:
        q_ref, kv_ref, scale_ref, out_ref, m_ref, l_ref, acc_ref = refs
    else:
        q_ref, kv_ref, out_ref, m_ref, l_ref, acc_ref = refs
        scale_ref = None
    # q_ref    [1, kvh, QG, hd]  (QG = Q_TILE * group)
    # kv_ref   [2, page, kvh*hd] — the page's K/V planes chosen by index_map
    # scale_ref[1, 2*kvh, page] f32 (INT8 KV only; page on lanes, blocked rows)
    # out_ref  [1, kvh, QG, hd]
    # m/l_ref  [kvh, QG, 128] f32 online-softmax state; acc_ref [kvh, QG, hd]
    t = pl.program_id(0)
    b = pl.program_id(1)
    seq = tile_seq_ref[t]
    kv_len = kv_lens_ref[seq]
    # causal extent of THIS tile: its last query token sees kv positions
    # < tile_kvpos + q_tile.  Pages past that are never visible — skipping
    # them here (and clamping their fetch in the index_map) makes chunked
    # prefill O(sum of causal extents) instead of O(tiles x full context).
    limit_t = jnp.minimum(tile_kvpos_ref[t] + q_tile, kv_len)
    num_blocks = jnp.maximum(pl.cdiv(limit_t, page_size), 1)

    @pl.when(b == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(b < num_blocks)
    def _compute():
        q = q_ref[0]                                   # [kvh, QG, hd]
        kvh = q.shape[0]
        qg = q.shape[1]

        # causal visibility: row r belongs to query token r // group whose kv
        # extent is tile_kvpos + r//group + 1; also clip to kv_len.
        row_tok = lax.broadcasted_iota(jnp.int32, (qg, page_size), 0) // group
        col = lax.broadcasted_iota(jnp.int32, (qg, page_size), 1) + b * page_size
        limit = jnp.minimum(tile_kvpos_ref[t] + row_tok + 1, kv_len)
        mask = col < limit                             # [QG, page]
        if window is not None:
            # sliding window: row sees [max(0, p+1-W), p+1)
            mask &= col >= tile_kvpos_ref[t] + row_tok + 1 - window

        # static loop over local kv heads: plain 2D matmuls (Mosaic requires
        # dot_general batch dims at equal positions, so no batched form here)
        hd = q.shape[2]
        for h in range(kvh):
            # head h = 128-aligned lane window of the flattened plane row
            k_h = kv_ref[0, :, h * hd:(h + 1) * hd]    # [page, hd]
            v_h = kv_ref[1, :, h * hd:(h + 1) * hd]
            # dots run in q's dtype (bf16 in production = full MXU rate;
            # int8 KV is exact in bf16), accumulating in f32
            scores = lax.dot_general(
                q[h], k_h.astype(q.dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale                               # [QG, page]
            if kv_int8:
                # K dequant folds into a per-column rescale after the dot
                scores = scores * scale_ref[0, h][None, :]
            scores = jnp.where(mask, scores, MASK_VALUE)

            m_prev = m_ref[h, :, 0]                    # [QG]
            m_cur = jnp.max(scores, axis=-1)
            m_new = jnp.maximum(m_prev, m_cur)
            # fully-masked tiles keep m at -inf; exp(-inf - -inf) -> use 0
            alpha = jnp.where(m_prev == -jnp.inf, 0.0, jnp.exp(m_prev - m_new))
            p = jnp.exp(scores - m_new[:, None])       # [QG, page]
            p = jnp.where(mask, p, 0.0)

            l_new = l_ref[h, :, 0] * alpha + jnp.sum(p, axis=-1)
            if kv_int8:
                # V dequant folds into p (cheaper: QG x page vs page x hd)
                p = p * scale_ref[0, kvh + h][None, :]
            pv = lax.dot_general(
                p.astype(q.dtype), v_h.astype(q.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # [QG, hd]
            acc_ref[h] = acc_ref[h] * alpha[:, None] + pv
            m_ref[h] = jnp.broadcast_to(m_new[:, None], m_ref.shape[1:])
            l_ref[h] = jnp.broadcast_to(l_new[:, None], l_ref.shape[1:])

    @pl.when(b == num_blocks - 1)
    def _finalize():
        l = l_ref[:, :, 0]
        denom = jnp.where(l == 0.0, 1.0, l)            # padding rows: avoid NaN
        out_ref[0] = (acc_ref[...] / denom[:, :, None]).astype(out_ref.dtype)


def _decode_kernel(
    # scalar prefetch
    layer_ref, tile_seq_ref, tile_kvpos_ref, kv_lens_ref, page_indices_ref,
    # inputs / outputs / scratch (assembled by the wrapper)
    *refs,
    sm_scale: float,
    page_size: int,
    pages_per_layer: int,
    kv_int8: bool,
    npp: int,
    xlane: bool,
    nt: int,
    ring: int = 2,
    q_tile: int = 1,
    group: int = 1,
    kv_int4: bool = False,
    tpp: int = 2,
    window: int | None = None,
    fuse: bool = False,
):
    """Decode-mode kernel: grid (num_tiles,), one token's q heads per tile.

    The BlockSpec-pipelined kernel pays per-grid-step overhead on every
    (tile, page) pair; at decode scale (hundreds of tiles x pages x layers)
    that overhead dominated the step (~2us x 2048 steps x 28 layers).  Here
    the page walk is a *dynamic* fori_loop with manually double-buffered
    DMAs: grid steps = tiles only, no padded-page fetches, online softmax
    carried as loop values.

    ``npp`` pages are fetched and processed per loop iteration (separate DMAs
    into one buffer group, one wide dot per head over npp*page columns):
    ablation showed the loop body cost is per-iteration overhead, not
    bandwidth — ~3.8us x tiles x pages x layers was 89% of a decode step.
    Pages past ``kv_len`` inside the last group read the page table's padding
    entry (page 0) and are masked in the scores.

    ``xlane=True`` extends the double buffer into ONE pipeline across lanes:
    at production decode shapes a lane has a single page group (ctx <=
    npp*page), so in-lane double buffering never overlaps anything — each
    lane pays its full DMA latency serially.  Instead, the grid-persistent
    slot parity lives in SMEM and a lane's last loop iteration issues the
    *next live lane's* first group (``nxt_ref``, scalar-prefetched: first
    live lane >= i) into the opposite slot, so lane t+1's fetch flies while
    lane t computes and writes out.  A previous attempt bundled this with
    unrolling 8 lanes per grid step and regressed 2.3x (see BENCHMARKS.md);
    this variant keeps the grid and lane body identical to the baseline.
    """
    if xlane:
        nxt_ref, *refs = refs
    else:
        nxt_ref = None
    it = iter(refs)
    q_ref = next(it)
    kv_hbm = next(it)
    scale_hbm = next(it) if kv_int8 else None
    newk_ref = next(it) if fuse else None             # [NT, D] whole (VMEM)
    newv_ref = next(it) if fuse else None             # [NT, D] whole (VMEM)
    newscale_ref = next(it) if (fuse and kv_int8) else None  # [NT, 2kvh]
    out_ref = next(it)
    kv_out = next(it) if fuse else None               # aliased full cache
    scale_out = next(it) if (fuse and kv_int8) else None
    kv_buf = next(it)
    scale_buf = next(it) if kv_int8 else None
    sems = next(it)
    scale_sems = next(it) if kv_int8 else None
    par_ref = next(it) if xlane else None
    stg = next(it) if fuse else None                  # [2, planes, SLAB, D]
    stg_s = next(it) if (fuse and kv_int8) else None  # [2, 2kvh, page]
    wsem = next(it) if fuse else None                 # DMA (2, planes + 1)
    pend_ref = next(it) if fuse else None             # SMEM (2,)

    t = pl.program_id(0)
    seq = tile_seq_ref[t]
    kv_len = kv_lens_ref[seq]
    # the tile's LAST row bounds the page walk (q_tile == 1: one token per
    # tile).  Inert tiles (padding lanes, non-decoding lanes in the all-lanes
    # decode segment, prefill pad tiles) carry position < 0 => limit <= 0 =>
    # zero loop iterations, zero fetches.
    limit = jnp.clip(tile_kvpos_ref[t] + q_tile, 0, kv_len)
    num_blocks = pl.cdiv(limit, page_size)
    num_groups = pl.cdiv(num_blocks, npp)
    layer = layer_ref[0]
    gp = npp * page_size  # kv columns per group

    # Sliding window (Mistral): a token at position p sees kv columns
    # [max(0, p+1-W), p+1).  ``lo_t`` = the tile's FIRST row's lower bound;
    # the page walk starts at its group (g0 <= nfull always: lo <= limit-1),
    # and sub_step masks columns below each row's own bound.
    if window is None:
        lo_t = None
        g0 = jnp.int32(0)
    else:
        lo_t = jnp.maximum(tile_kvpos_ref[t] + 1 - window, 0)
        g0 = lo_t // gp

    def g0_of(tt):
        if window is None:
            return jnp.int32(0)
        return jnp.maximum(tile_kvpos_ref[tt] + 1 - window, 0) // gp

    def nblocks_of(tt):
        lim = jnp.clip(
            tile_kvpos_ref[tt] + q_tile, 0, kv_lens_ref[tile_seq_ref[tt]]
        )
        return pl.cdiv(lim, page_size)

    # split-plane caches (int8/bf16): logical page b lives in data planes
    # [2b, 2b+2) (K then V); ONE strided copy fetches both into the slot's
    # [2, npp, ...] buffer so each plane lands contiguous per group.  KV4
    # packs K/V in one byte: planes == 1.
    planes = 1 if kv_int4 else 2

    # ---- fused decode KV write (fuse=True, q_tile == 1) ----------------
    # The row scatter that used to run BEFORE attention is replaced by the
    # kernel itself: the current page is fetched for attention anyway, so
    # patch the new token's row in VMEM (compute sees it) and DMA the
    # tiling-aligned SLAB rows containing it back to the ALIASED cache
    # output.  Write-backs pipeline one lane deep through two staging
    # parities (t % 2); pend_ref tracks in-flight DMAs per parity.
    if fuse:
        SLAB = min(32, page_size)                  # 32 | int8/bf16/f32 tiles
        pos_new = jnp.maximum(tile_kvpos_ref[t], 0)
        b_new = pos_new // page_size
        off_new = pos_new - b_new * page_size
        slab0 = pl.multiple_of((off_new // SLAB) * SLAB, SLAB)
        g_new = b_new // npp
        j_new = b_new - g_new * npp
        gpage_new = layer * pages_per_layer + page_indices_ref[seq, b_new]
        par_w = lax.rem(t, 2)

        @pl.when(t == 0)
        def _init_pend():
            pend_ref[0] = 0
            pend_ref[1] = 0

        def wb_copies(par):
            # wait() only consumes (sem, transfer size) — both static — so
            # these descriptors also serve to drain a PREVIOUS lane's DMAs
            out = [
                pltpu.make_async_copy(
                    stg.at[par, p],
                    kv_out.at[planes * gpage_new + p, pl.ds(slab0, SLAB)],
                    wsem.at[par, p],
                )
                for p in range(planes)
            ]
            if kv_int8:
                out.append(pltpu.make_async_copy(
                    stg_s.at[par], scale_out.at[gpage_new],
                    wsem.at[par, planes],
                ))
            return out

        def stage_and_issue(slot):
            """Patch the fetched group buffer (compute reads it), stage the
            patched slab, and DMA it back to the aliased cache output."""
            @pl.when(pend_ref[par_w] == 1)
            def _():  # the parity's previous lane's write-back must land
                for c in wb_copies(par_w):
                    c.wait()
            # Mosaic rejects dynamic single-row VMEM loads at unaligned
            # sublane indices ("cannot statically prove multiple of 8"):
            # load the aligned 8-row window and one-hot-reduce the lane's row
            t8 = pl.multiple_of((t // 8) * 8, 8)
            rio8 = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
            rows = (newk_ref, newv_ref)
            rio = lax.broadcasted_iota(jnp.int32, (SLAB, 1), 0)
            sel = rio == (off_new - slab0)
            for p in range(planes):
                w8 = rows[p][pl.ds(t8, 8), :].astype(jnp.float32)
                row = jnp.sum(jnp.where(rio8 == (t - t8), w8, 0.0), axis=0)
                sl = kv_buf[slot, p, j_new, pl.ds(slab0, SLAB), :]
                patched = jnp.where(
                    sel, row[None, :].astype(kv_buf.dtype), sl
                )
                kv_buf[slot, p, j_new, pl.ds(slab0, SLAB), :] = patched
                stg[par_w, p] = patched
            if kv_int8:
                cio = lax.broadcasted_iota(jnp.int32, (1, page_size), 1)
                win = pl.ds(
                    pl.multiple_of(j_new * page_size, page_size), page_size
                )
                sw8 = newscale_ref[pl.ds(t8, 8), :]          # [8, 2kvh]
                news = jnp.sum(
                    jnp.where(rio8 == (t - t8), sw8, 0.0), axis=0
                )
                sc = scale_buf[slot, :, win]       # [2kvh, page]
                s_patched = jnp.where(
                    cio == off_new, news[:, None], sc,
                )
                scale_buf[slot, :, win] = s_patched
                stg_s[par_w] = s_patched
            for c in wb_copies(par_w):
                c.start()
            pend_ref[par_w] = 1
    else:
        g_new = stage_and_issue = None

    def copies(slot, g, j, tt, nb):
        b = jnp.minimum(g * npp + j, jnp.maximum(nb - 1, 0))
        gpage = layer * pages_per_layer + page_indices_ref[tile_seq_ref[tt], b]
        # one contiguous copy per plane (a single strided 2-plane copy into
        # kv_buf[slot, :, j] measured 3x slower end-to-end)
        out = [
            pltpu.make_async_copy(
                kv_hbm.at[planes * gpage + p],
                kv_buf.at[slot, p, j],
                sems.at[slot, j],
            )
            for p in range(planes)
        ]
        if kv_int8:
            # scale scratch is [2kvh, npp*page] per slot: page j lands in a
            # lane-aligned column window, so the compute side gets head-major
            # scales by static slicing alone (a [npp, 2kvh, page] layout
            # would need a 3D strided gather, which Mosaic cannot lower, and
            # a [2kvh, npp, page] one a width-1 sublane-dim DMA slice, which
            # violates the (8, 128) tiling)
            out.append(pltpu.make_async_copy(
                scale_hbm.at[gpage],
                scale_buf.at[slot, :, pl.ds(j * page_size, page_size)],
                scale_sems.at[slot, j],
            ))
        return out

    # INT8 KV: tail-group pages past ``nb`` are SKIPPED (no fetch) — stale
    # VMEM there is harmless because int8 always casts to a finite bf16 and
    # the score/p masks zero those columns (the stale f32 *scales* are
    # re-masked after the V-side multiply in ``body``).  bf16 KV instead
    # clamps tail fetches to the last valid page: a skipped fetch could leave
    # a NaN bit pattern in kv_buf and 0 * NaN = NaN inside the p @ v dot.
    def start(slot, g, tt=None):
        ttv = t if tt is None else tt
        nb = num_blocks if tt is None else nblocks_of(ttv)
        for j in range(npp):
            if kv_int8:
                @pl.when(g * npp + j < nb)
                def _(j=j):
                    for c in copies(slot, g, j, ttv, nb):
                        c.start()
            else:
                for c in copies(slot, g, j, ttv, nb):
                    c.start()

    def wait_pages(slot, g, j0, j1):
        for j in range(j0, j1):
            if kv_int8:
                @pl.when(g * npp + j < num_blocks)
                def _(j=j):
                    for c in copies(slot, g, j, t, num_blocks):
                        c.wait()
            else:
                for c in copies(slot, g, j, t, num_blocks):
                    c.wait()

    def wait(slot, g):
        wait_pages(slot, g, 0, npp)

    def groups_of(tt):
        return pl.cdiv(nblocks_of(tt), npp)

    def issue_and_advance(slot, ti, gi):
        """Issue work item (lane ti, group gi) into ``slot`` and return the
        cursor of the next work item in consumption order (lane-major, then
        group; inert lanes skipped via the nxt table; (nt, 0) = exhausted)."""
        @pl.when(ti < nt)
        def _():
            start(slot, gi, ti)

        tis = jnp.minimum(ti, nt - 1)
        in_lane = gi + 1 < groups_of(tis)
        nti = jnp.where(in_lane, ti, nxt_ref[jnp.minimum(ti + 1, nt)])
        ngi = jnp.where(in_lane, gi + 1, g0_of(jnp.minimum(nti, nt - 1)))
        return (
            jnp.where(ti < nt, nti, nt),
            jnp.where(ti < nt, ngi, 0),
        )

    if xlane:
        # prime the pipeline once: grid step 0 issues the first ring-1 work
        # items into slots 0..ring-2 and parks the issue cursor at the next
        @pl.when(t == 0)
        def _prime():
            par_ref[0] = 0
            ti = nxt_ref[0]
            gi = g0_of(jnp.minimum(ti, nt - 1))
            for k in range(ring - 1):
                ti, gi = issue_and_advance(jnp.int32(k), ti, gi)
            par_ref[1] = ti
            par_ref[2] = gi
    else:
        @pl.when(num_groups > 0)
        def _prime():
            start(0, 0)

    # Inert lanes (padding / non-decoding) have num_blocks == 0: skip the
    # whole lane body — q_bd build, loop setup, finalize and the output
    # write cost ~1.5 us/lane otherwise (their out rows are garbage that
    # downstream drops by row; measured 1.41x -> ~1.0x at 50% occupancy).
    @pl.when(num_blocks > 0)
    def _lane_compute():
        q = q_ref[0]                                        # [kvh, QG, hd]
        kvh, qg, hd = q.shape
        r = kvh * qg                                        # stacked score rows

        # Block-diagonal q: row block h carries q[h] at column block h (the K
        # head) and zeros elsewhere — ONE [r, khw] x [khw, cols] MXU dot then
        # yields every head's scores stacked as [r, cols].  FLOPs inflate by kvh,
        # but per-head [QG, hd] dots leave the MXU idle and pay ~8 VPU-bound
        # softmax passes per page group; stacking makes both one wide pass
        # (measured: the per-head kernel was 89% of a decode step at 5x
        # speed-of-light).
        perhead = q_tile > 1
        if not perhead:
            # all cache layouts present K (and V) as a separate [w, kvh*hd]
            # matrix — blocked rows for int8/bf16 (sliced below), nibble unpack
            # for KV4 — so the contraction width is kvh*hd, half the old
            # interleaved layout's 2*kvh*hd (measured: 0.25 -> 0.19 us per
            # page-slot of per-lane compute at the 0.6B decode shape).
            bd_stride = hd
            bd_width = kvh * hd
            # (a repeat+mask build of the same matrix measured WORSE: 487 ->
            # 529 us/layer at ctx 256 — the pad/concat lowers better)
            q_bd = jnp.concatenate(
                [
                    jnp.pad(q[h], ((0, 0),
                                   (h * bd_stride, bd_width - h * bd_stride - hd)))
                    for h in range(kvh)
                ],
                axis=0,
            )                                               # [r, bd_width]
            # fold the softmax scale into q once per tile instead of per group
            q_bd = (q_bd.astype(jnp.float32) * sm_scale).astype(q.dtype)
        else:
            # prefill tiles: qg = q_tile * group rows fill the MXU on their own,
            # so per-head [qg, hd] x [hd, W] dots are the right shape (the
            # block-diagonal trick would inflate FLOPs 2*kvh-fold); softmax state
            # is carried as loop VALUES (the BlockSpec-grid kernel carried it in
            # VMEM scratch, re-reading/writing [kvh, qg, 128] per (tile, page)).
            qs = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
            row_tok = lax.broadcasted_iota(jnp.int32, (qg, 1), 0) // group
            row_lim = jnp.minimum(tile_kvpos_ref[t] + row_tok + 1, kv_len)
            if window is not None:
                row_lo = jnp.maximum(
                    tile_kvpos_ref[t] + row_tok + 1 - window, 0
                )

        def stack_scales(sc, first):
            # [2kvh, W] -> [r, W] rows grouped per head; int8 scale rows are
            # blocked (K: h, V: kvh+h), KV4's interleaved (K: 2h, V: 2h+1)
            w = sc.shape[-1]
            if kv_int4:
                per_head = sc.reshape(kvh, 2, w)[:, first, :]  # static slice
            else:
                per_head = sc.reshape(2, kvh, w)[first]
            return jnp.broadcast_to(per_head[:, None, :], (kvh, qg, w)).reshape(r, w)

        def sub_step(kv_raw, sc, col0, m, l, acc):
            """Online-softmax update over one column window.

            kv_raw [planes, np_win, page, kvh*hd] (the slot buffer, or a narrow
            page window of it in the tail phase), sc [2kvh, W] f32 scales (int8
            KV only), col0 = global kv position of the window's first column.
            """
            w = kv_raw.shape[1] * kv_raw.shape[2]
            if kv_int4:
                k_all, v_all = _unpack_int4_kv(kv_raw[0].reshape(w, bd_width))
                k_mat = k_all.astype(q.dtype)
                v_mat = v_all.astype(q.dtype)
            else:
                # split planes land contiguous per group AND pre-flattened to
                # [page, kvh*hd] rows (the wrapper reshapes the HBM side), so
                # these reshapes merge leading dims only — no relayout (an
                # in-kernel [.., kvh, hd] -> [.., kvh*hd] sublane->lane reshape
                # measured 3x slower; int8 KV casts to bf16 exactly)
                k_mat = kv_raw[0].reshape(w, bd_width).astype(q.dtype)
                v_mat = kv_raw[1].reshape(w, bd_width).astype(q.dtype)
            col = lax.broadcasted_iota(jnp.int32, (1, w), 1) + col0
            mask = col < limit                              # [1, W]
            if window is not None:
                mask &= col >= lo_t

            scores = lax.dot_general(
                q_bd, k_mat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # [r, W]
            if kv_int8:
                scores = scores * stack_scales(sc, 0)
            scores = jnp.where(mask, scores, MASK_VALUE)

            m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
            alpha = jnp.where(m == -jnp.inf, 0.0, jnp.exp(m - m_new))
            p = jnp.where(mask, jnp.exp(scores - m_new[:, None]), 0.0)
            l_new = l * alpha + jnp.sum(p, axis=-1)
            if kv_int8:
                # re-mask after the scale multiply: skipped tail pages leave
                # stale f32 scales in scratch, and 0 * NaN = NaN
                p = jnp.where(mask, p * stack_scales(sc, 1), 0.0)
            full = lax.dot_general(
                p.astype(q.dtype), v_mat,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # [r, bd_width]
            # extract each head's V block from the diagonal
            pv = jnp.concatenate(
                [
                    full[h * qg:(h + 1) * qg, h * hd:(h + 1) * hd]
                    for h in range(kvh)
                ],
                axis=0,
            )                                               # [r, hd]
            return m_new, l_new, acc * alpha[:, None] + pv

        # NOTE: a "half-split" variant (each group computed as two half-width
        # windows, the high one skipped via lax.cond when past the causal limit)
        # measured 3x SLOWER across the board — lax.cond carrying the (m, l, acc)
        # state wrecks Mosaic's loop body.  Do not retry with lax.cond; see
        # BENCHMARKS.md.

        def body(g, carry):
            m, l, acc = carry                               # [r] [r] [r, hd]
            if xlane:
                slot = par_ref[0]
                # issue the work item ring-1 ahead (tracked by the SMEM cursor)
                # into the slot just past the in-flight window, before waiting on
                # our own — slots cur..cur+ring-2 hold in-flight fetches
                nti, ngi = issue_and_advance(
                    lax.rem(slot + (ring - 1), ring), par_ref[1], par_ref[2]
                )
                par_ref[1] = nti
                par_ref[2] = ngi
                par_ref[0] = lax.rem(slot + 1, ring)
            else:
                slot = jax.lax.rem(g, 2)

                @pl.when(g + 1 < num_groups)
                def _():
                    start(jax.lax.rem(g + 1, 2), g + 1)

            wait(slot, g)
            if fuse:
                @pl.when(g == g_new)
                def _():
                    stage_and_issue(slot)
            sc = scale_buf[slot] if kv_int8 else None
            if not perhead:
                return sub_step(kv_buf[slot], sc, g * gp, m, l, acc)
            return sub_step_perhead(kv_buf[slot], sc, g * gp, m, l, acc)

        def sub_step_perhead(kv_raw, sc, col0, m, l, acc):
            """Per-head online-softmax update over one page group.

            kv_raw [planes, npp, page, kvh*hd]; m/l [kvh, qg]; acc [kvh, qg, hd].
            """
            if kv_int4:
                k_allm, v_allm = _unpack_int4_kv(kv_raw[0].reshape(gp, kvh * hd))
            else:
                k_allm = kv_raw[0].reshape(gp, kvh * hd)
                v_allm = kv_raw[1].reshape(gp, kvh * hd)
            col = lax.broadcasted_iota(jnp.int32, (1, gp), 1) + col0
            mask = col < row_lim                            # [qg, gp]
            if window is not None:
                mask &= col >= row_lo
            ms, ls, accs = [], [], []
            for h in range(kvh):
                # head h = lane columns [h*hd, (h+1)*hd): 128-aligned lane
                # slices of the flattened [gp, kvh*hd] plane, no relayout
                k_h = k_allm[:, h * hd:(h + 1) * hd].astype(q.dtype)  # [gp, hd]
                v_h = v_allm[:, h * hd:(h + 1) * hd].astype(q.dtype)
                if kv_int4:
                    sk, sv = 2 * h, 2 * h + 1               # interleaved scales
                else:
                    sk, sv = h, kvh + h                     # blocked scales
                scores = lax.dot_general(
                    qs[h], k_h,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                           # [qg, gp]
                if kv_int8:
                    scores = scores * sc[sk][None, :]
                scores = jnp.where(mask, scores, MASK_VALUE)
                m_new = jnp.maximum(m[h], jnp.max(scores, axis=-1))
                alpha = jnp.where(m[h] == -jnp.inf, 0.0, jnp.exp(m[h] - m_new))
                p = jnp.where(mask, jnp.exp(scores - m_new[:, None]), 0.0)
                l_new = l[h] * alpha + jnp.sum(p, axis=-1)
                if kv_int8:
                    # re-mask after the V-scale multiply (stale scales of skipped
                    # tail pages: 0 * NaN = NaN)
                    p = jnp.where(mask, p * sc[sv][None, :], 0.0)
                pv = lax.dot_general(
                    p.astype(q.dtype), v_h,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                           # [qg, hd]
                ms.append(m_new)
                ls.append(l_new)
                accs.append(acc[h] * alpha[:, None] + pv)
            return jnp.stack(ms), jnp.stack(ls), jnp.stack(accs)

        if perhead:
            m0 = jnp.full((kvh, qg), -jnp.inf, jnp.float32)
            l0 = jnp.zeros((kvh, qg), jnp.float32)
            acc0 = jnp.zeros((kvh, qg, hd), jnp.float32)
            # xlane: start consuming at the SAME group the producer starts
            # issuing at (g0, the window's lower-bound group) — consuming from
            # 0 while the ring produces from g0 desyncs slot parity whenever a
            # windowed prefill tile's lower bound crosses a page-group
            # boundary (each tile then eats items produced for later tiles).
            # Groups below g0 are invisible to every row of the tile: lo_t is
            # the tile's minimum lower bound, so skipping them is exact.
            start_g = g0 if xlane else jnp.int32(0)
            m, l, acc = lax.fori_loop(start_g, num_groups, body, (m0, l0, acc0))
            denom = jnp.where(l == 0.0, 1.0, l)
            out_ref[0] = (acc / denom[:, :, None]).astype(out_ref.dtype)
        else:
            m0 = jnp.full((r,), -jnp.inf, jnp.float32)
            l0 = jnp.zeros((r,), jnp.float32)
            acc0 = jnp.zeros((r, hd), jnp.float32)
            init = (m0, l0, acc0)
            if not (xlane and 0 < tpp < npp):
                start_g = g0 if xlane else jnp.int32(0)
                m, l, acc = lax.fori_loop(start_g, num_groups, body, init)
            else:
                # Tail-proportional compute: FULL npp-page groups run the wide
                # sub_step; the final partial group (if any) is consumed in
                # narrow tpp-page sub-steps over its already-fetched buffer, so
                # compute scales with the VALID page count instead of paying a
                # full npp-wide pass for 1..npp-1 pages (ctx just past a group
                # boundary measured 1.18x its KV-fetch floor; see BENCHMARKS.md).
                # Two sequential fori_loops carry (m, l, acc) as plain values —
                # no lax.cond around softmax state (see NOTE above).
                nfull = limit // gp
                m, l, acc = lax.fori_loop(g0, nfull, body, init)
                ntail_steps = pl.cdiv(num_blocks - nfull * npp, tpp)

                def tail_body(j, carry):
                    mj, lj, accj = carry

                    @pl.when(j == 0)
                    def _():
                        # consume the tail group's ring slot exactly like body
                        slot0 = par_ref[0]
                        nti, ngi = issue_and_advance(
                            lax.rem(slot0 + (ring - 1), ring),
                            par_ref[1], par_ref[2],
                        )
                        par_ref[1] = nti
                        par_ref[2] = ngi
                        par_ref[0] = lax.rem(slot0 + 1, ring)
                        wait(slot0, nfull)
                        if fuse:
                            # the newest token usually lives in the partial
                            # tail group — patch + write back here
                            @pl.when(g_new == nfull)
                            def _():
                                stage_and_issue(slot0)

                    slot = lax.rem(par_ref[0] + ring - 1, ring)
                    kv_win = kv_buf[slot, :, pl.ds(j * tpp, tpp)]
                    sc = (
                        scale_buf[slot, :, pl.ds(j * tpp * page_size,
                                                 tpp * page_size)]
                        if kv_int8 else None
                    )
                    col0 = (nfull * npp + j * tpp) * page_size
                    return sub_step(kv_win, sc, col0, mj, lj, accj)

                m, l, acc = lax.fori_loop(0, ntail_steps, tail_body, (m, l, acc))
            denom = jnp.where(l == 0.0, 1.0, l)
            out_ref[0] = (acc / denom[:, None]).reshape(kvh, qg, hd).astype(out_ref.dtype)

    if fuse:
        # drain outstanding write-backs before the kernel exits (an unwaited
        # DMA at kernel end is undefined behavior)
        @pl.when(t == nt - 1)
        def _drain():
            for parv in range(2):
                @pl.when(pend_ref[parv] == 1)
                def _(parv=parv):
                    for c in wb_copies(parv):
                        c.wait()


def ragged_paged_attention_pallas(
    q: jnp.ndarray,             # [T, nh, hd] (T = NT * q_tile, tile-aligned)
    kv_pages,                   # [L*PPL, page, 2*kvh, hd] flat cache, or the
                                # INT8 {"data", "scale"} pair (KV8)
    layer,                      # scalar int32 layer index
    pages_per_layer: int,
    kv_lens: jnp.ndarray,       # [S]
    page_indices: jnp.ndarray,  # [S, PPS]
    tile_seq: jnp.ndarray,      # [NT]
    tile_kvpos: jnp.ndarray,    # [NT]
    *,
    sm_scale: float,
    q_tile: int,
    interpret: bool = False,
    sliding_window: int | None = None,
    knobs: AttnKnobs | None = None,
    new_kv=None,
) -> jnp.ndarray:
    """``new_kv`` (decode fused write, q_tile == 1 only): a tuple
    (k_rows [NT, kvh*hd], v_rows [NT, kvh*hd], scale [NT, 2kvh] | None) in
    the cache dtype (already quantized for int8 caches).  When given, the
    kernel writes each live lane's new token row into the cache (patch
    fetched page + aliased slab write-back) and the call returns
    (attn_out, updated kv_pages) instead of attn_out alone."""
    from nanovllm_tpu.ops.kv_cache import is_quantized_cache

    if knobs is None:
        knobs = AttnKnobs.resolve()

    kv_int8 = is_quantized_cache(kv_pages)
    kv_scales = kv_pages["scale"] if kv_int8 else None
    if kv_int8:
        kv_pages = kv_pages["data"]
    t, nh, hd = q.shape
    # KV4 packs head h's K (low nibble) and V (high) in one byte: ONE data
    # plane per logical page (same leading count as the scale plane); the
    # split-plane int8/bf16 caches have two (K at 2*gp, V at 2*gp + 1)
    kv_int4 = kv_int8 and kv_pages.shape[0] == kv_scales.shape[0]
    planes = 1 if kv_int4 else 2
    page_size = kv_pages.shape[1]
    kvh = kv_pages.shape[2] // q.shape[2]  # plane row width D = kvh * hd
    kvh2 = 2 * kvh
    group = nh // kvh
    nt = t // q_tile
    assert nt * q_tile == t, "query rows must be tile-aligned"
    qg = q_tile * group
    s, pps = page_indices.shape

    # [T, nh, hd] -> [NT, kvh, QG, hd]: rows of one tile grouped per kv head
    qk = q.reshape(nt, q_tile, kvh, group, hd)
    qk = qk.transpose(0, 2, 1, 3, 4).reshape(nt, kvh, qg, hd)

    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    if q_tile == 1 or knobs.prefill_manual:
        # manual-DMA kernel, grid over tiles only; npp pages per loop
        # iteration (iteration overhead, not bandwidth, bounds the loop).
        # q_tile == 1 -> decode (block-diagonal compute); q_tile > 1 ->
        # prefill tiles (per-head compute); same DMA ring either way.
        npp = knobs.decode_npp if q_tile == 1 else knobs.prefill_npp
        if q_tile == 1 and pps < npp:
            # short-context programs (page-table width < the group width,
            # static per program — p_pad is a jit bucket key): fetch exactly
            # the table width in ONE group and drop the tail machinery.
            # Measured at ctx 384 / 256 live lanes / page 128: npp 8 tpp 2 =
            # 2.82x the KV-fetch floor, npp 3 tpp 0 = 1.63x (the per-sub-step
            # and per-issue overheads bind when pages-per-lane is tiny).
            npp = pps
        if q_tile > 1:
            # the unrolled per-head loop keeps every head's [qg, npp*page]
            # f32 score/probability temporaries live, so the live set scales
            # with the GQA group size.  Hold the known-good VMEM envelope
            # (kvh * qg * gp words, validated at the 0.6B geometry: kvh 8,
            # qg 256, gp 512) by narrowing the page group: at group 4
            # (Qwen3-4B/8B, 32h/8kv) npp 4 compiles to 16.9 MB > the 16 MB
            # scoped budget; npp 2 restores the envelope.
            envelope = 8 * 256 * 512
            while npp > 1 and kvh * qg * npp * page_size > envelope:
                npp //= 2
        xlane = knobs.decode_xlane
        scalars = [layer_arr, tile_seq, tile_kvpos, kv_lens, page_indices]
        if xlane:
            # nxt[i] = first live lane >= i (live = nonzero causal extent),
            # with an nt sentinel; computed in XLA, fused for free
            live = (tile_kvpos >= 0) & (kv_lens[tile_seq] > 0)
            idx = jnp.where(live, jnp.arange(nt, dtype=jnp.int32), nt)
            nxt = jnp.concatenate(
                [lax.cummin(idx[::-1])[::-1], jnp.full((1,), nt, jnp.int32)]
            )
            scalars.append(nxt)
        ring = (knobs.decode_ring if q_tile == 1 else knobs.prefill_ring) \
            if xlane else 2
        if q_tile == 1 and xlane and pps < knobs.decode_npp:
            # short-context programs: per-DMA issue latency dominates a
            # lane's 1-3-page fetch, so a deeper cross-lane ring pays
            # (1.69x -> 1.60x of floor at ctx 384; VMEM cost is tiny at
            # these page counts)
            ring = max(ring, 6)
        # the ring buffer must leave room in the 16 MB scoped-VMEM budget
        # (bf16 KV pages are 2x int8: ring 4 x npp 8 x 512 KB alone is 16 MB)
        page_bytes = page_size * planes * kvh * hd * kv_pages.dtype.itemsize
        while ring > 2 and ring * npp * page_bytes > 12 * 1024 * 1024:
            ring -= 1
        # f32 KV pages (4x int8) can exceed the budget even at ring 2 —
        # narrow the page group too (observed: f32 decode at page 128
        # overflowed scoped VMEM by 36 KB)
        while npp > 1 and ring * npp * page_bytes > 12 * 1024 * 1024:
            npp //= 2
        # tail-phase width must divide the group width: the tail loop slices
        # kv_buf[slot, :, j*tpp : (j+1)*tpp] for cdiv(rem, tpp) steps, which
        # runs past the npp axis when tpp does not divide npp (e.g. tpp 3,
        # npp 8, 7-page tail -> window [6, 9) on an axis of size 8).  Fall
        # back to full-width groups (tail phase off) for invalid knob values.
        tpp = knobs.decode_tpp
        if q_tile == 1 and npp == pps and npp < knobs.decode_npp:
            tpp = 0  # short-context single-group programs: no tail phase
        if tpp > 0 and npp % tpp != 0:
            tpp = 0
        fuse = new_kv is not None and q_tile == 1 and not kv_int4
        in_specs = [
            pl.BlockSpec((1, kvh, qg, hd), lambda ti, *_: (ti, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        inputs = [qk, kv_pages]
        if kv_int8:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            inputs.append(kv_scales)
        if fuse:
            # whole-array VMEM refs (KB..MB-scale; a blocked spec would both
            # violate the (8, 128) block-tiling rule on the small dims and
            # force XLA layout copies of the stacked rows — measured 0.39
            # ms/iter for the retired [NT, 2, D] stacked form).  Rows padded
            # to a multiple of 8 so the kernel's aligned 8-row window load
            # stays in bounds at any lane count.
            nt8 = -(-nt // 8) * 8
            for a in new_kv:
                if a is None:
                    continue
                if a.shape[0] < nt8:
                    a = jnp.pad(a, ((0, nt8 - a.shape[0]), (0, 0)))
                in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
                inputs.append(a)
        scratch = [
            pltpu.VMEM(
                (ring, planes, npp, page_size, kvh * hd),
                kv_pages.dtype,
            ),
        ]
        if kv_int8:
            scratch.append(pltpu.VMEM((ring, kvh2, npp * page_size), jnp.float32))
        scratch.append(pltpu.SemaphoreType.DMA((ring, npp)))
        if kv_int8:
            scratch.append(pltpu.SemaphoreType.DMA((ring, npp)))
        if xlane:
            # [cur slot, issue-cursor lane, issue-cursor group]
            scratch.append(pltpu.SMEM((3,), jnp.int32))
        out_shape = jax.ShapeDtypeStruct((nt, kvh, qg, hd), q.dtype)
        out_specs = pl.BlockSpec((1, kvh, qg, hd), lambda ti, *_: (ti, 0, 0, 0))
        aliases = {}
        if fuse:
            slab = min(32, page_size)
            scratch.append(
                pltpu.VMEM((2, planes, slab, kvh * hd), kv_pages.dtype)
            )
            if kv_int8:
                scratch.append(pltpu.VMEM((2, kvh2, page_size), jnp.float32))
            scratch.append(pltpu.SemaphoreType.DMA((2, planes + 1)))
            scratch.append(pltpu.SMEM((2,), jnp.int32))
            out_shape = [out_shape, jax.ShapeDtypeStruct(
                kv_pages.shape, kv_pages.dtype)]
            out_specs = [out_specs, pl.BlockSpec(memory_space=pl.ANY)]
            # alias the cache input(s) to the cache output(s): input index
            # counts the flattened args INCLUDING scalar prefetch
            aliases[len(scalars) + 1] = 1
            if kv_int8:
                out_shape.append(jax.ShapeDtypeStruct(
                    kv_scales.shape, kv_scales.dtype))
                out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
                aliases[len(scalars) + 2] = 2
            out_shape = tuple(out_shape)
            out_specs = tuple(out_specs)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalars),
            grid=(nt,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        kernel = functools.partial(
            _decode_kernel,
            sm_scale=sm_scale,
            page_size=page_size,
            pages_per_layer=pages_per_layer,
            kv_int8=kv_int8,
            npp=npp,
            xlane=xlane,
            ring=ring,
            nt=nt,
            q_tile=q_tile,
            group=group,
            kv_int4=kv_int4,
            tpp=tpp,
            window=sliding_window,
            fuse=fuse,
        )
        res = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            input_output_aliases=aliases,
            interpret=interpret,
        )(*scalars, *inputs)
        if fuse:
            out = res[0]
            cache = (
                {"data": res[1], "scale": res[2]} if kv_int8 else res[1]
            )
        else:
            out = res
        out = out.reshape(nt, kvh, q_tile, group, hd).transpose(0, 2, 1, 3, 4)
        out = out.reshape(t, nh, hd)
        return (out, cache) if fuse else out

    # BlockSpec-grid fallback path (prefill_manual=False).  DECISION
    # (round 5, VERDICT r4 weakness 6): KEPT, as the only implementation of
    # prefill attention that does not use manual DMA — a correctness
    # fallback and differential-test partner for the manual ring (it is
    # slower: the grid walks the full padded page-table width per tile and
    # round-trips softmax state through VMEM scratch, which is why manual
    # is the default).  Exercised by tests/test_kernels.py grid-path tests;
    # KV4 is manual-only by design (nibble unpack needs the ring buffers).
    assert not kv_int4, "KV4 requires the manual-DMA kernel (NVT_PREFILL_MANUAL=1)"
    grid = (nt, pps)

    def q_map(ti, bi, *_refs):
        return (ti, 0, 0, 0)

    def _clamped_page(ti, bi, tile_seq_ref, tile_kvpos_ref, kv_lens_ref,
                      page_indices_ref):
        # clamp past-causal-extent grid steps to the tile's last visible page:
        # Pallas skips refetching when consecutive steps map to the same
        # block, so skipped pages cost no HBM bandwidth
        seq = tile_seq_ref[ti]
        limit_t = jnp.minimum(tile_kvpos_ref[ti] + q_tile, kv_lens_ref[seq])
        last = jnp.maximum(pl.cdiv(limit_t, page_size) - 1, 0)
        return page_indices_ref[seq, jnp.minimum(bi, last)]

    def kv_map(ti, bi, layer_ref, tile_seq_ref, tile_kvpos_ref, kv_lens_ref,
               page_indices_ref):
        page = _clamped_page(ti, bi, tile_seq_ref, tile_kvpos_ref, kv_lens_ref,
                             page_indices_ref)
        return (layer_ref[0] * pages_per_layer + page, 0, 0)

    def scale_map(ti, bi, layer_ref, tile_seq_ref, tile_kvpos_ref, kv_lens_ref,
                  page_indices_ref):
        page = _clamped_page(ti, bi, tile_seq_ref, tile_kvpos_ref, kv_lens_ref,
                             page_indices_ref)
        return (layer_ref[0] * pages_per_layer + page, 0, 0)

    in_specs = [
        pl.BlockSpec((1, kvh, qg, hd), q_map),
        # block dim0 = 2: block index gp covers data planes [2*gp, 2*gp + 2)
        pl.BlockSpec((2, page_size, kvh * hd), kv_map),
    ]
    inputs = [qk, kv_pages]
    if kv_int8:
        in_specs.append(pl.BlockSpec((1, kvh2, page_size), scale_map))
        inputs.append(kv_scales)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, kvh, qg, hd), q_map),
        scratch_shapes=[
            pltpu.VMEM((kvh, qg, 128), jnp.float32),
            pltpu.VMEM((kvh, qg, 128), jnp.float32),
            pltpu.VMEM((kvh, qg, hd), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _attn_kernel,
        sm_scale=sm_scale,
        page_size=page_size,
        group=group,
        q_tile=q_tile,
        kv_int8=kv_int8,
        window=sliding_window,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, kvh, qg, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(layer_arr, tile_seq, tile_kvpos, kv_lens, page_indices, *inputs)

    # [NT, kvh, QG, hd] -> [T, nh, hd]
    out = out.reshape(nt, kvh, q_tile, group, hd).transpose(0, 2, 1, 3, 4)
    return out.reshape(t, nh, hd)
