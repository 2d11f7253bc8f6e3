"""Per-step batch assembly: Sequences -> padded, bucketed device arrays.

TPU-native replacement for the reference's ``prepare_model_input`` +
CUDA-Graph machinery (reference model_runner.py:400-495, :640-715): XLA
compiles one executable per input shape, so batch shapes are padded to a
small ladder of buckets — the bucket ladder *is* the CUDA-Graph equivalent,
and it covers prefill shapes too (the reference only graphs decode).

Token layout is *segmented* for the Pallas attention kernel
(ops/attention.py): decode tokens (num_new == 1) first, one row each; then
prefill chunks, each padded to a PREFILL_TILE boundary; then tail padding to
the bucket.  The static triple (dec_end, p_start, p_end) describes the split
and is part of the jit cache key.

Padding conventions (reference model_runner.py:588-596 parity):
  * token lanes: slot_mapping = -1 (KV write skipped), token id 0; pad rows
    inside a prefill chunk carry their sequence's lane index, gap/tail rows
    carry lane 0 — all are masked or discarded downstream
  * sequence lanes: kv_len 0, page_indices 0
  * logits_indices of padded lanes point at row 0 (discarded on host)
"""

from typing import NamedTuple

import numpy as np

from nanovllm_tpu.constants import PREFILL_TILE, bucket, round_up as _round_up
from nanovllm_tpu.engine.sequence import Sequence

# positions value of inert rows: causal limits become <= 0, so the decode
# kernel skips the row entirely and a prefill pad tile is fully masked
INERT_POS = -PREFILL_TILE


class StepBatch(NamedTuple):
    """Attention/sampling metadata for one engine step (a jit-able pytree).

    The explicit-argument replacement for the reference's module-global
    Context (reference utils/context.py:48-55).
    """

    token_ids: np.ndarray      # [T] int32
    positions: np.ndarray      # [T] int32
    slot_mapping: np.ndarray   # [T] int32, -1 = padding (no KV write)
    token_seq: np.ndarray      # [T] int32 sequence lane of each row
    # async scheduling: lane in the PREVIOUS program's token output that
    # supplies this row's input token (-1 = use token_ids).  Lets a decode
    # step consume the in-flight step's sample without a host round-trip.
    fb_idx: np.ndarray         # [T] int32
    kv_lens: np.ndarray        # [S] int32, 0 = padded lane
    page_indices: np.ndarray   # [S, PAGES] int32
    logits_indices: np.ndarray  # [S] int32 (row of each lane's last token)
    temperatures: np.ndarray   # [S] float32
    # pages written by the prefill segment, for the page-plane KV write path
    # (ops/kv_cache.py): (layer-relative page id, token-row offset of the
    # page's first written slot within the prefill segment).  PAGE_SENTINEL
    # pads unused entries.  None on paths with no prefill rows (decode bursts).
    prefill_pages: np.ndarray | None = None  # [PP, 2] int32


class PackedBatch(NamedTuple):
    """StepBatch packed into 4 transfer buffers.

    Host->device copies over a tunneled PJRT backend pay a per-array RPC
    cost (~5 ms each measured), so the 8 logical StepBatch fields travel as 4
    arrays and are re-sliced on device (free under jit).  The reference's
    analogue is its 7 pinned async H2D copies (model_runner.py:486-492).
    """

    tok: np.ndarray    # [5, T] int32: token_ids, positions, slot_mapping, token_seq, fb_idx
    seq: np.ndarray    # [2, S] int32: kv_lens, logits_indices
    temps: np.ndarray  # [S] float32
    pages: np.ndarray  # [S, PAGES] int32
    ppages: np.ndarray  # [PP, 2] int32: prefill-written (page id, token start)

    @classmethod
    def pack(cls, b: StepBatch) -> "PackedBatch":
        return cls(
            tok=np.stack([b.token_ids, b.positions, b.slot_mapping,
                          b.token_seq, b.fb_idx]),
            seq=np.stack([b.kv_lens, b.logits_indices]),
            temps=b.temperatures,
            pages=b.page_indices,
            ppages=b.prefill_pages,
        )

    def unpack(self) -> StepBatch:
        return StepBatch(
            token_ids=self.tok[0],
            positions=self.tok[1],
            slot_mapping=self.tok[2],
            token_seq=self.tok[3],
            fb_idx=self.tok[4],
            kv_lens=self.seq[0],
            page_indices=self.pages,
            logits_indices=self.seq[1],
            temperatures=self.temps,
            prefill_pages=self.ppages,
        )


def _written_pages(seq: Sequence, block_size: int) -> list[tuple[int, int]]:
    """(page id, token offset within the chunk) pairs covered by this step's
    written slots of a prefill chunk.  Offset = where the page's first written
    slot falls among the chunk's tokens (0 for the first, partially resumed
    page)."""
    start, end = seq.num_cached_tokens, seq.num_context_tokens
    first = start // block_size
    return [
        (page, max(0, (first + k) * block_size - start))
        for k, page in enumerate(
            seq.block_table[first: (end - 1) // block_size + 1]
        )
    ]


def lane_ladder(s_cap: int) -> list[int]:
    """Distinct decode-lane paddings for an engine with ``s_cap`` max seqs:
    every power of two from 8 up to ``bucket(s_cap)``.

    Round 1-2 used a two-value ladder {8, s_cap} on the argument that padded
    lanes are nearly free.  That holds when decode is KV-fetch-bound (0.6B:
    attention skips inert lanes), but at flagship geometries the quantized
    matmuls are COMPUTE-bound at the padded row count: a 14B decode step
    with ~60 live lanes padded to 256 spends ~34 ms of MXU time on 4/5
    empty rows (measured: burst iterations 74 ms vs a 17.6 ms byte floor).
    Mid tiers cut the padded matmul work for the low-occupancy regimes that
    KV capacity forces at 8B/14B (cap/4: +31% e2e at 14B, cap/2: +13% at
    8B), and the {16, 32} tiers serve the drain windows where 14B bursts
    ran ~21 live lanes padded to 64 (45% of speed-of-light).  The compile
    cost of the full ladder is NOT paid before serving readiness: only the
    {8, cap} tiers warm eagerly; mid tiers compile in a background thread
    and steps route to the nearest ready tier until they land
    (model_runner.warmup_buckets)."""
    cap = bucket(max(s_cap, 8))
    vals, v = [], 8
    while v < cap:
        vals.append(v)
        v *= 2
    vals.append(cap)
    return vals


def seq_pad(n: int, s_cap: int | None, tiers=None) -> int:
    """Smallest lane-ladder padding holding ``n`` sequence lanes.

    ``tiers`` (optional) restricts the choice to an iterable of READY tier
    values (programs already compiled); the ladder's cap is always expected
    to be ready, so routing rounds up rather than failing."""
    if s_cap is None:
        return bucket(n)
    allowed = lane_ladder(s_cap) if tiers is None else sorted(tiers)
    for v in allowed:
        if n <= v:
            return v
    return bucket(max(s_cap, n))


def step_layout(
    seqs: list[Sequence], block_size: int, s_cap: int | None = None,
    tiers=None,
) -> tuple[int, ...]:
    """Bucketed layout tuple (dec_end, p_start, p_end, s_pad, p_pad) for the
    scheduled sequences.  Segment boundaries are part of the jit cache key,
    so the layout is designed to collapse onto a tiny program ladder:

      * the decode segment ALWAYS spans all s_pad lanes (row = lane; lanes
        not decoding this step carry inert rows the kernel skips), removing
        the decode count from the cache key,
      * the prefill segment always extends to the padded buffer end
        (p_end = t_pad; tail tiles are inert), removing the tile count from
        the cache key,
      * s_pad uses the lane ladder of ``seq_pad`` (powers of two, 8..cap),
        restricted to ``tiers`` when the runner's background warmup has not
        yet compiled every tier.

    Net cache key: (s_pad, t_pad) — a handful of programs per engine config
    (each first execution costs seconds of compile + device load)."""
    prefill_idx = [i for i, s in enumerate(seqs) if s.num_new_tokens != 1]
    s_pad = seq_pad(len(seqs), s_cap, tiers)
    dec_end = s_pad
    n_tiles = sum(
        _round_up(seqs[i].num_new_tokens, PREFILL_TILE) // PREFILL_TILE
        for i in prefill_idx
    )
    if n_tiles:
        p_start = _round_up(dec_end, PREFILL_TILE)
        p_end = bucket(p_start + n_tiles * PREFILL_TILE)
    else:
        p_start = p_end = dec_end
    # minimum 4 (not the default 8): short-context steps get ONE extra
    # p_pad bucket, and the decode kernel specializes npp/ring/tail to the
    # table width (ragged_paged_attention: 2.82x -> ~1.6x of the KV-fetch
    # floor at ctx 384) — the 128-in/100-out reference serving workload
    # lives at 2-3 pages.  Minimum 2 was measured and reverted: decode-
    # burst block reserve grows 2-page tables to 3 mid-trace, so the 2-
    # bucket forced a mid-serving jump to a cold 4-bucket program (13.5 s
    # TTFT p50 at 8 req/s); with 4 as the floor the same growth stays in
    # one warm bucket.
    p_pad = bucket(max((len(s.block_table) for s in seqs), default=1),
                   minimum=4)
    return dec_end, p_start, p_end, s_pad, p_pad


def prefill_pages_pad(p_start: int, p_end: int, block_size: int) -> int:
    """Width of the prefill-written pages array, a pure function of the
    prefill segment so it adds NO jit-bucket dimension.  Bound: each chunk of
    c tokens spans <= ceil(c/block)+1 pages and occupies ceil(c/TILE) tiles,
    and (ceil(c/block)+1) <= 2*ceil(c/TILE) for every c >= 2 when
    block >= 2*TILE; summed over chunks that is 2*(p_end-p_start)/TILE.
    For small blocks the per-chunk page span dominates instead."""
    rows = p_end - p_start
    if rows <= 0:
        return 1
    per_tile = max(2 * PREFILL_TILE // block_size + 1, 2)
    return per_tile * rows // PREFILL_TILE


def merge_layouts(layouts) -> tuple[int, int, int, int, int]:
    """Elementwise max — the common (forced) layout for dp-stacked groups.
    Derived widths (t_pad, pp_pad) are pure functions of these dims, so the
    merged layout stays a valid upper bound for every group."""
    return tuple(max(vals) for vals in zip(*layouts))


def prepare_step_batch(
    seqs: list[Sequence],
    block_size: int,
    layout: tuple[int, ...] | None = None,
    fb_lane: dict[int, int] | None = None,
) -> tuple[StepBatch, list[int], tuple[int, int, int]]:
    """Build the padded StepBatch for the scheduled sequences.

    ``layout`` forces the bucketed dims (dp-stacked groups must agree on
    shapes); None computes this group's natural layout.

    Row assignment: lane i's decode row IS row i (the decode segment spans
    all lanes); prefill chunks start at p_start, each padded to a
    PREFILL_TILE boundary.  Inert rows (non-decoding lanes, alignment gap,
    tail tiles) carry position INERT_POS so their causal limit is <= 0 —
    the decode kernel skips them, prefill pad tiles are fully masked.

    Returns (batch, sampled_seq_indices, segments):
      * sampled_seq_indices — positions in ``seqs`` whose scheduled chunk
        reaches the end of their tokens; only those produce a sampled token
        this step (reference model_runner.py:448-451).
      * segments — static (dec_end, p_start, p_end) token-layout triple.
    """
    decode_idx = [i for i, s in enumerate(seqs) if s.num_new_tokens == 1]
    prefill_idx = [i for i, s in enumerate(seqs) if s.num_new_tokens != 1]

    if layout is None:
        layout = step_layout(seqs, block_size)
    dec_end, p_start, p_end, s_pad, p_pad = layout
    t_pad = bucket(max(p_end, 1))
    pp_pad = prefill_pages_pad(p_start, p_end, block_size)

    token_ids = np.zeros(t_pad, dtype=np.int32)
    positions = np.full(t_pad, INERT_POS, dtype=np.int32)
    slot_mapping = np.full(t_pad, -1, dtype=np.int32)
    token_seq = np.zeros(t_pad, dtype=np.int32)
    fb_idx = np.full(t_pad, -1, dtype=np.int32)
    # every lane owns its decode row, even when not decoding this step
    token_seq[:dec_end] = np.arange(dec_end, dtype=np.int32)
    kv_lens = np.zeros(s_pad, dtype=np.int32)
    page_indices = np.zeros((s_pad, p_pad), dtype=np.int32)
    logits_indices = np.zeros(s_pad, dtype=np.int32)
    temperatures = np.zeros(s_pad, dtype=np.float32)

    sampled: list[int] = []

    def fill(i: int, row0: int):
        seq = seqs[i]
        n_new = seq.num_new_tokens
        start, end = seq.num_cached_tokens, seq.num_context_tokens
        sl = slice(row0, row0 + n_new)
        if seq.num_pending and end > len(seq) - seq.num_pending:
            # the chunk's input includes a placeholder whose value is still on
            # device: only the single decode input token may be pending, and
            # it is sourced from the previous program's output lane
            assert n_new == 1 and end == len(seq), (
                "placeholder token inside a prefill chunk"
            )
            assert fb_lane is not None and seq.seq_id in fb_lane, (
                "pending token with no feedback lane"
            )
            fb_idx[row0] = fb_lane[seq.seq_id]
        token_ids[sl] = seq.token_ids[start:end]
        pos = np.arange(start, end, dtype=np.int32)
        positions[sl] = pos
        table = np.asarray(seq.block_table, dtype=np.int32)
        slot_mapping[sl] = table[pos // block_size] * block_size + pos % block_size
        kv_lens[i] = end
        page_indices[i, : len(table)] = table
        logits_indices[i] = row0 + n_new - 1
        temperatures[i] = seq.temperature
        if end == len(seq):
            sampled.append(i)

    for i in decode_idx:
        fill(i, i)  # decode row = lane index

    row = p_start
    written_pages: list[tuple[int, int]] = []
    for i in prefill_idx:
        n_new = seqs[i].num_new_tokens
        fill(i, row)
        written_pages.extend(
            (page, row - p_start + off)
            for page, off in _written_pages(seqs[i], block_size)
        )
        rows_padded = _round_up(n_new, PREFILL_TILE)
        token_seq[row: row + rows_padded] = i  # pad rows inherit the lane
        row += rows_padded

    from nanovllm_tpu.ops.kv_cache import PAGE_SENTINEL

    prefill_pages = np.full((pp_pad, 2), PAGE_SENTINEL, dtype=np.int32)
    prefill_pages[:, 1] = 0
    if written_pages:
        prefill_pages[: len(written_pages)] = written_pages

    batch = StepBatch(
        token_ids=token_ids,
        positions=positions,
        slot_mapping=slot_mapping,
        token_seq=token_seq,
        fb_idx=fb_idx,
        kv_lens=kv_lens,
        page_indices=page_indices,
        logits_indices=logits_indices,
        temperatures=temperatures,
        prefill_pages=prefill_pages,
    )
    return batch, sampled, (dec_end, p_start, p_end)
