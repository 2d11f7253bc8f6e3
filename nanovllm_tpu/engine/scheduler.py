"""vLLM-v1-style continuous-batching scheduler.

Pure-Python and device-free — the control plane never touches jax (same
layering as the reference, scheduler.py:30-34).

Policy reproduced from the reference (nanovllm/engine/scheduler.py:101-267,
SURVEY.md §3.2):

  Phase 1 — running queue, in order, while token budget remains: each sequence
  advances by ``len(seq) - num_cached_tokens`` tokens (clamped to the budget
  when chunked prefill is on, and to ``max_model_len - 1 - num_cached``).  If
  the block manager cannot grow the sequence, the *most recently admitted*
  running sequence is preempted (LIFO) — released and pushed to the *front* of
  the waiting queue — and the check retries.

  Phase 2 — waiting queue, only if nothing was preempted this round (avoids
  admit->preempt livelock, reference scheduler.py:173): probe the prefix
  cache, clamp the chunk, and admit iff the chunk fits the remaining budget
  and the free list can hold (free-list prefix hits + miss tokens).

  postprocess — append sampled tokens for sequences that produced logits;
  finish on EOS (unless ignore_eos) / max_tokens / max_model_len; then commit
  progress (num_cached += num_new; num_new = 0) for every unfinished scheduled
  sequence.  Committing *after* sampling leaves the freshly appended token
  uncached, so the next schedule() round gives every decode >= 1 new token.
"""

from collections import deque

from nanovllm_tpu.config import Config
from nanovllm_tpu.constants import PREFILL_TILE, bucket, round_up
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.sequence import Sequence, SequenceStatus


class SchedulerStats:
    """Per-step counters (observability beyond the reference)."""

    def __init__(self):
        self.num_preempted = 0
        self.num_prefix_cached_tokens = 0
        self.num_scheduled_tokens = 0
        self.num_steps = 0


class Scheduler:
    """One logical scheduler over ``data_parallel_size`` KV partitions.

    Each dp group owns an independent BlockManager (its chips' HBM); a
    sequence is pinned to the group with the most free blocks at admission
    and never migrates.  With dp=1 this degenerates to the reference design.
    """

    def __init__(self, config: Config):
        self.chunked_prefill = config.chunked_prefill
        self.max_model_len = config.max_model_len
        self.max_num_seqs = config.max_num_seqs
        self.max_num_batched_tokens = config.max_num_batched_tokens
        self.eos = config.eos
        assert config.num_kvcache_blocks > 0, "num_kvcache_blocks must be set before Scheduler init"
        self.dp_size = config.data_parallel_size
        self.block_managers = [
            BlockManager(config.num_kvcache_blocks, config.kvcache_block_size)
            for _ in range(self.dp_size)
        ]
        self.waiting: deque[Sequence] = deque()
        self.running: deque[Sequence] = deque()
        self.stats = SchedulerStats()
        # Prefill ROW budget (TPU-native, beyond the reference's token
        # budget): each prefill chunk occupies ceil(c / PREFILL_TILE) query
        # tiles in the padded batch, and the batch buffer also reserves one
        # decode row per sequence lane.  Capping padded rows (not just raw
        # tokens) at max_num_batched_tokens keeps the compiled buffer size
        # t_pad <= the budget — without it, many small chunks inflate t_pad
        # (and the matmul work) up to 4x past the budget.  Disabled for tiny
        # test configs where a single tile exceeds the budget.
        self.prefill_rows_cap = 0
        if config.max_num_batched_tokens >= 4 * PREFILL_TILE:
            lane_reserve = round_up(
                bucket(min(config.max_num_seqs, config.max_num_batched_tokens)),
                PREFILL_TILE,
            )
            self.prefill_rows_cap = max(
                (config.max_num_batched_tokens - lane_reserve)
                // PREFILL_TILE * PREFILL_TILE,
                PREFILL_TILE,
            )

    @property
    def block_manager(self) -> BlockManager:
        """The dp group 0 manager (dp=1 compatibility accessor)."""
        return self.block_managers[0]

    def bm(self, seq: Sequence) -> BlockManager:
        return self.block_managers[seq.dp_group]

    def is_finished(self) -> bool:
        return not self.waiting and not self.running

    def abort(self, seq_id: int) -> bool:
        """Cancel a request by id (no reference equivalent — its engine can
        only drain).  Frees the sequence's blocks if it was running.

        Must be called between engine steps (the engine is single-threaded,
        so this holds by construction for any caller of LLMEngine.step)."""
        for q in (self.waiting, self.running):
            for seq in q:
                if seq.seq_id == seq_id:
                    if seq.block_table:
                        self.bm(seq).deallocate(seq)
                    seq.status = SequenceStatus.FINISHED
                    q.remove(seq)
                    return True
        return False

    def add(self, seq: Sequence) -> None:
        assert len(seq) <= self.max_model_len - 1, "sequence length exceeds max_model_len"
        self.waiting.append(seq)

    def preempt(self, seq: Sequence) -> None:
        """Release the sequence's cache and push it to the *front* of waiting
        (reference scheduler.py:204-220)."""
        seq.status = SequenceStatus.WAITING
        self.bm(seq).deallocate(seq)
        self.waiting.appendleft(seq)
        self.stats.num_preempted += 1

    def schedule(self) -> list[Sequence]:
        budget = self.max_num_batched_tokens
        scheduled_running: list[Sequence] = []
        scheduled_new: list[Sequence] = []
        preempted = False

        # ---- phase 1: advance running sequences ----
        def pop_victim(group: int, min_index: int):
            """Most recently admitted running seq of ``group`` past
            ``min_index`` (LIFO within the victim's own KV partition —
            evicting another group's sequence frees the wrong HBM)."""
            for j in range(len(self.running) - 1, min_index, -1):
                if self.running[j].dp_group == group:
                    victim = self.running[j]
                    del self.running[j]
                    return victim
            return None

        prefill_rows = 0

        def rows_fit(num_new: int, scheduled_any: bool) -> int:
            """Clamp a prefill chunk to the remaining row budget.

            Returns the (possibly clamped) chunk size, or 0 when it cannot be
            scheduled this step.  A chunk that can never fit the cap is let
            through when nothing else is scheduled yet (progress guarantee —
            the batch buffer just grows one bucket)."""
            if num_new <= 1 or not self.prefill_rows_cap:
                return num_new
            avail = self.prefill_rows_cap - prefill_rows
            if self.chunked_prefill:
                num_new = min(num_new, avail)
            if num_new < 1 or round_up(num_new, PREFILL_TILE) > avail:
                return num_new if not scheduled_any and prefill_rows == 0 else 0
            return num_new

        i = 0
        while i < len(self.running) and budget > 0:
            seq = self.running[i]
            num_new = len(seq) - seq.num_cached_tokens
            if self.chunked_prefill:
                num_new = min(num_new, budget)
            num_new = min(num_new, self.max_model_len - 1 - seq.num_cached_tokens)
            num_new = rows_fit(num_new, bool(scheduled_running))
            if num_new <= 0:
                break  # row budget exhausted; later seqs wait for next step
            while not self.bm(seq).can_append(seq, num_new):
                victim = pop_victim(seq.dp_group, i)
                if victim is None:
                    # nothing in this group left behind us: seq itself yields
                    break
                self.preempt(victim)
                preempted = True
            else:
                seq.num_new_tokens = num_new
                self.bm(seq).may_append(seq)
                scheduled_running.append(seq)
                budget -= num_new
                if num_new > 1:
                    prefill_rows += round_up(num_new, PREFILL_TILE)
                i += 1
                continue
            # can_append still failing: preempt seq itself
            del self.running[i]
            self.preempt(seq)
            preempted = True
            break

        # ---- phase 2: admit waiting sequences (skip after any preemption) ----
        if not preempted:
            while self.waiting and budget > 0 and len(self.running) < self.max_num_seqs:
                seq = self.waiting[0]
                assert not seq.block_table
                # pin to the dp group whose prefix cache + free list serves
                # this prompt best: most cached tokens, then most free blocks
                best, best_key = None, None
                for g, bm_g in enumerate(self.block_managers):
                    hu, hf, miss = bm_g.get_token_layout(seq)
                    key = (hu + hf, bm_g.num_free_blocks)
                    if best_key is None or key > best_key:
                        best, best_key = (g, hu, hf, miss), key
                g, hit_used, hit_free, num_new = best
                seq.dp_group = g
                bm = self.block_managers[g]
                if self.chunked_prefill:
                    num_new = min(num_new, budget)
                num_new = rows_fit(
                    num_new, bool(scheduled_running or scheduled_new)
                )
                if num_new <= 0:
                    break  # row budget exhausted
                # free-list hits still consume free blocks on allocate
                if num_new > budget or not bm.can_allocate(hit_free + num_new):
                    break
                seq.num_new_tokens = num_new
                bm.allocate(seq)
                assert seq.num_cached_tokens == hit_used + hit_free
                self.stats.num_prefix_cached_tokens += seq.num_cached_tokens
                budget -= num_new
                if num_new > 1:
                    prefill_rows += round_up(num_new, PREFILL_TILE)
                seq.status = SequenceStatus.RUNNING
                self.waiting.popleft()
                self.running.append(seq)
                scheduled_new.append(seq)

        scheduled = scheduled_running + scheduled_new
        assert scheduled, "scheduler made no progress"
        self.stats.num_scheduled_tokens += sum(s.num_new_tokens for s in scheduled)
        self.stats.num_steps += 1
        return scheduled

    def burst_window(self, seqs: list[Sequence], w_max: int) -> int:
        """Largest decode-burst width W for the scheduled sequences, or 0.

        Eligible only when every scheduled sequence is a pure decode
        (num_new == 1) and nothing is waiting (bursting must not starve
        admissions).  W is capped so no sequence outgrows its allocated block
        table: burst writes reach position len+W-2, so
        W <= table_capacity - len + 1 per sequence.  Sequences short of
        capacity get one block *reserved* up front (with many lanes, some
        sequence is always near a block boundary — without the reserve the
        min-capacity cap collapses W to 1 and every decode pays a full host
        round-trip).  The growing/reserved tail block is always exclusively
        owned (prefix cache shares only full blocks), so in-burst KV writes
        cannot corrupt shared blocks.
        """
        if w_max < 2 or self.waiting:
            return 0
        if any(s.num_new_tokens != 1 for s in seqs):
            return 0
        w = w_max
        bs = self.block_managers[0].block_size
        for s in seqs:
            capacity = len(s.block_table) * bs
            if capacity - len(s) + 1 < w_max:
                if self.bm(s).reserve_append_block(s):
                    capacity += bs
            w = min(w, capacity - len(s) + 1)
        return w if w >= 2 else 0

    def postprocess_burst(self, seqs: list[Sequence], tokens_ws: list[list[int]]) -> None:
        """Accept burst tokens: per sequence, append until EOS / max_tokens /
        max_model_len; tokens past the stop point are discarded (their KV was
        written but is never referenced).  Surviving sequences commit
        progress and register hashes of blocks that became full."""
        w = len(tokens_ws)
        for i, seq in enumerate(seqs):
            for step in range(w):
                token_id = tokens_ws[step][i]
                seq.append_token(token_id)
                hit_eos = not seq.ignore_eos and token_id == self.eos
                if hit_eos or seq.num_completion_tokens == seq.max_tokens or \
                        len(seq) >= self.max_model_len:
                    seq.status = SequenceStatus.FINISHED
                    # register hashes of blocks that filled inside this burst
                    # BEFORE releasing them: the reference hashes blocks as
                    # they fill (may_append), so its lazily-freed blocks stay
                    # prefix-hittable after the sequence finishes
                    seq.num_cached_tokens = len(seq) - 1
                    self.bm(seq).commit_full_blocks(seq)
                    self.bm(seq).deallocate(seq)
                    self.running.remove(seq)
                    break
            if not seq.is_finished:
                seq.num_cached_tokens = len(seq) - 1
                seq.num_new_tokens = 0
                self.bm(seq).commit_full_blocks(seq)

    # -- async scheduling (no reference equivalent; vLLM-v1's async scheduling
    # analogue).  postprocess splits in two: the COUNTS phase runs right after
    # dispatch with token VALUES still on device — it appends placeholder
    # tokens, applies the length-based finish rules (max_tokens /
    # max_model_len), and commits chunk progress, which is everything the next
    # schedule() needs.  The VALUES phase runs after the next step has been
    # dispatched: it patches placeholders, applies EOS (one step late — the
    # finished sequence's extra in-flight tokens are discarded, exactly like
    # decode-burst overshoot), and releases blocks/registers deferred prefix
    # hashes once a sequence's values are complete. ------------------------

    def postprocess_counts(
        self,
        seqs: list[Sequence],
        sampled_seq_indices: list[int],
        pending_out: list,
    ) -> list[Sequence]:
        """Async counts phase for a single step.  Appends a placeholder per
        sampled sequence (recorded as (seq_index, token_index) in
        ``pending_out``) and returns sequences finished by length rules."""
        finished = []
        for seq_index in sampled_seq_indices:
            seq = seqs[seq_index]
            if seq.is_finished:
                continue
            seq.append_token(0)
            seq.num_pending += 1
            pending_out.append((seq_index, len(seq) - 1))
            if seq.num_completion_tokens == seq.max_tokens or \
                    len(seq) >= self.max_model_len:
                seq.status = SequenceStatus.FINISHED
                self.running.remove(seq)
                finished.append(seq)
        for seq in seqs:
            if not seq.is_finished or seq.num_pending:
                seq.num_cached_tokens += seq.num_new_tokens
                seq.num_new_tokens = 0
        return finished

    def postprocess_burst_counts(
        self, seqs: list[Sequence], w: int, pending_out: list
    ) -> list[Sequence]:
        """Async counts phase for a W-step burst: every sequence samples once
        per in-burst step, truncated by the length rules."""
        finished = []
        for i, seq in enumerate(seqs):
            if seq.is_finished:
                continue
            for _ in range(w):
                seq.append_token(0)
                seq.num_pending += 1
                pending_out.append((i, len(seq) - 1))
                if seq.num_completion_tokens == seq.max_tokens or \
                        len(seq) >= self.max_model_len:
                    seq.status = SequenceStatus.FINISHED
                    self.running.remove(seq)
                    finished.append(seq)
                    break
            seq.num_cached_tokens = len(seq) - 1
            seq.num_new_tokens = 0
            # blocks that filled inside the burst get their prefix hashes
            # once the values arrive (postprocess_values)
            seq.hash_deferred = True
        return finished

    def postprocess_values(self, resolved: list) -> list[Sequence]:
        """Async values phase: ``resolved`` is [(seq, token_index, value)] in
        per-sequence append order.  Patches placeholders, EOS-finishes, and
        releases/commits fully-patched sequences.  Returns sequences finished
        here (by EOS)."""
        finished = []
        touched = {}
        for seq, idx, val in resolved:
            touched[id(seq)] = seq
            if idx >= len(seq.token_ids):
                continue  # overshoot discarded by an earlier EOS truncation
            seq.token_ids[idx] = val
            if seq.num_pending:
                seq.num_pending -= 1
            if seq.is_finished:
                continue
            if not seq.ignore_eos and val == self.eos:
                # discard in-flight overshoot past the EOS (burst overshoot
                # semantics: its KV was written but is never referenced)
                del seq.token_ids[idx + 1:]
                seq.num_pending = 0
                seq.status = SequenceStatus.FINISHED
                finished.append(seq)
                if seq in self.running:
                    self.running.remove(seq)
                elif seq in self.waiting:
                    self.waiting.remove(seq)
                if seq.block_table:
                    seq.num_cached_tokens = min(
                        seq.num_cached_tokens, len(seq) - 1
                    )
                    self.bm(seq).commit_full_blocks(seq)
                    self.bm(seq).deallocate(seq)
                seq.hash_deferred = False
        for seq in touched.values():
            if seq.is_finished:
                if seq.num_pending == 0 and seq.block_table:
                    # finished by a length rule at counts time: release now
                    # that every token value is known
                    seq.num_cached_tokens = min(
                        seq.num_cached_tokens, len(seq) - 1
                    )
                    self.bm(seq).commit_full_blocks(seq)
                    self.bm(seq).deallocate(seq)
                    seq.hash_deferred = False
            elif seq.hash_deferred and seq.block_table:
                # deferred full-block hashes: commit only blocks whose tokens
                # are ALL patched — a newer counts phase may have appended
                # placeholders inside the cached range (burst lookahead)
                known = len(seq) - seq.num_pending
                self.bm(seq).commit_full_blocks(seq, known)
                if seq.num_cached_blocks * self.block_managers[0].block_size <= known:
                    seq.hash_deferred = False
        return finished

    def postprocess(
        self,
        seqs: list[Sequence],
        token_ids: list[int],
        sampled_seq_indices: list[int],
    ) -> None:
        """Append sampled tokens and commit per-step progress.

        ``sampled_seq_indices`` selects which of ``seqs`` produced a logit/token
        this step (sequences mid-chunked-prefill do not; reference
        scheduler.py:222-267, model_runner.py:448-451).
        """
        assert len(token_ids) == len(sampled_seq_indices)
        for seq_index, token_id in zip(sampled_seq_indices, token_ids):
            seq = seqs[seq_index]
            seq.append_token(token_id)
            hit_eos = not seq.ignore_eos and token_id == self.eos
            if hit_eos or seq.num_completion_tokens == seq.max_tokens or len(seq) >= self.max_model_len:
                seq.status = SequenceStatus.FINISHED
                self.bm(seq).deallocate(seq)
                self.running.remove(seq)
        for seq in seqs:
            if not seq.is_finished:
                seq.num_cached_tokens += seq.num_new_tokens
                seq.num_new_tokens = 0
