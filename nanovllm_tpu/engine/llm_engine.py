"""Engine composition root: Config -> ModelRunner -> Scheduler -> step loop.

API parity with the reference LLMEngine (reference engine/llm_engine.py:64-270):
``add_request``/``step``/``generate``/``is_finished``, same output shapes and
ordering (outputs sorted by seq_id = input order).  Differences:

  * No worker processes, events, SharedMemory, or atexit teardown — the JAX
    single-controller design has exactly one process (SURVEY.md §7.1).
  * ``add_request`` returns the sequence id (the reference's serving bench
    reads ``scheduler.waiting[-1].seq_id``; SURVEY.md §3.4 calls the id the
    de-facto interface).
  * Works without a tokenizer when prompts are token-id lists (random-weight
    bench mode has no checkpoint directory).
  * ``exit()`` (reference llm_engine.py:120-135) needs no worker shutdown —
    it drains the in-flight async step and releases the device arrays so a
    second engine can be constructed in the same process.
"""

import atexit
import time
from collections import deque
from dataclasses import fields

from nanovllm_tpu.config import Config
from nanovllm_tpu.constants import PREFILL_TILE, round_up as _round_up
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.engine.scheduler import Scheduler
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams
from nanovllm_tpu.utils.profiling import EngineStats


def _exit_weak(ref) -> None:
    """atexit trampoline: tear down the engine iff it is still alive."""
    engine = ref()
    if engine is not None:
        engine.exit()


class LLMEngine:
    def __init__(self, model: str = "", **kwargs):
        config_fields = {f.name for f in fields(Config)}
        unknown = set(kwargs) - config_fields
        if unknown:
            raise TypeError(f"unknown config options: {sorted(unknown)}")
        config = Config(model=model, **kwargs)
        self.config = config
        self.model_runner = ModelRunner(config)  # sets config.num_kvcache_blocks
        self.tokenizer = self._load_tokenizer(model)
        if self.tokenizer is not None and self.tokenizer.eos_token_id is not None:
            config.eos = self.tokenizer.eos_token_id
        self.scheduler = Scheduler(config)
        self.stats = EngineStats()
        if self.stats.enabled:
            self.model_runner.stats = self.stats
        # async scheduling state: the in-flight dispatched step, plus finished
        # sequences awaiting their device-side token values before emission
        self._pending = None
        self._finished_buf: list[Sequence] = []
        self._exited = False
        # reference llm_engine.py:118 parity: clean teardown on interpreter
        # exit even when the user never calls exit().  Registered through a
        # weakref so the hook does NOT keep the engine alive — a strong
        # atexit reference pinned every engine (and its device arrays) for
        # the life of the process.
        import weakref

        atexit.register(_exit_weak, weakref.ref(self))

    # -- lifecycle ------------------------------------------------------------

    def wait_for_warmup(self) -> None:
        """Block until the background lane-tier compile finishes.

        Serving deployments need not call this (steps route to ready tiers);
        offline benchmarks should, so compile RPCs don't contend with the
        timed section (model_runner.wait_warm)."""
        self.model_runner.wait_warm()

    def exit(self) -> None:
        """Deterministic teardown (reference llm_engine.py:120-135 parity).

        Drains the in-flight async step (its sampled tokens are applied, so
        no KV accounting is left dangling), prints collected stats, and
        releases the KV cache / parameter device arrays — freeing HBM so a
        second engine can be constructed in the same process.  Idempotent;
        also registered atexit.  The single-controller design has no worker
        processes, shared memory, or process groups to tear down.
        """
        if self._exited:
            return
        self._exited = True
        try:
            self._drain_pending()
        except Exception:
            pass  # teardown must not raise on a wedged in-flight step
        if self.stats.enabled:
            import sys

            print(self.stats.summary(), file=sys.stderr)
        self.model_runner.release()
        # the weakref atexit hook stays registered; exit() is idempotent

    def __enter__(self) -> "LLMEngine":
        return self

    def __exit__(self, *exc) -> bool:
        self.exit()
        return False

    @staticmethod
    def _load_tokenizer(model: str):
        if not model:
            return None
        try:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(model, use_fast=True)
        except Exception:
            return None

    # -- online API -----------------------------------------------------------

    def add_request(self, prompt, sampling_params: SamplingParams) -> int:
        if isinstance(prompt, str):
            assert self.tokenizer is not None, "string prompts need a tokenizer"
            prompt = self.tokenizer.encode(prompt)
        seq = Sequence(prompt, sampling_params, block_size=self.config.kvcache_block_size)
        seq.arrival_time = time.perf_counter()
        self.scheduler.add(seq)
        return seq.seq_id

    def abort_request(self, seq_id: int) -> bool:
        """Cancel a queued or running request (frees its KV blocks).

        No reference equivalent; online serving needs it for client
        disconnects and deadline enforcement (SURVEY.md §5.3 notes the
        reference has no request timeouts at all).
        """
        self._drain_pending()
        return self.scheduler.abort(seq_id)

    def step(self):
        """One schedule -> run -> postprocess round.

        Returns (outputs, num_total_tokens): outputs is
        [(seq_id, completion_token_ids)] for sequences finished this step;
        num_total_tokens counts their full lengths (throughput accounting,
        reference llm_engine.py:159-189).

        Async scheduling (config.async_scheduling): step N+1 is dispatched
        BEFORE step N's tokens are fetched, so outputs lag the dispatch by
        one call; the final call drains the last in-flight step.
        """
        if not self.config.async_scheduling:
            return self._step_sync()
        prev = self._pending
        self._pending = None
        if not self.scheduler.is_finished():
            with self.stats.measure("-", "schedule"):
                seqs = self.scheduler.schedule()
                w = self.scheduler.burst_window(seqs, self.config.decode_burst)
            if w >= 2:
                w = 1 << (w.bit_length() - 1)  # power-of-two jit buckets
                handle = self.model_runner.run_burst_async(seqs, w)
                self._finished_buf.extend(
                    self.scheduler.postprocess_burst_counts(
                        seqs, handle.w, handle.pending
                    )
                )
            else:
                kind = (
                    "decode" if all(s.num_new_tokens == 1 for s in seqs)
                    else "prefill" if all(s.num_new_tokens > 1 for s in seqs)
                    else "mixed"
                )
                handle = self.model_runner.run_async(seqs, kind)
                self._finished_buf.extend(
                    self.scheduler.postprocess_counts(
                        seqs, handle.sampled, handle.pending
                    )
                )
            self._pending = handle
        if prev is not None:
            self._resolve_handle(prev)
        ready = [s for s in self._finished_buf if s.num_pending == 0]
        self._finished_buf = [s for s in self._finished_buf if s.num_pending > 0]
        outputs = [(s.seq_id, s.completion_token_ids) for s in ready]
        return outputs, sum(len(s) for s in ready)

    def _resolve_handle(self, handle) -> None:
        """Fetch an in-flight step's tokens and run the values postprocess."""
        tokens = self.model_runner.resolve(handle)
        resolved = []
        step_count: dict[int, int] = {}
        for i, idx in handle.pending:
            g, lane = handle.lane_of[i]
            if handle.w >= 2:
                k = step_count.get(i, 0)
                step_count[i] = k + 1
                val = int(tokens[g, k, lane])
            else:
                val = int(tokens[g, lane])
            resolved.append((handle.seqs[i], idx, val))
        with self.stats.measure(handle.kind, "post"):
            self._finished_buf.extend(self.scheduler.postprocess_values(resolved))

    def _drain_pending(self) -> None:
        if self._pending is not None:
            handle = self._pending
            self._pending = None
            self._resolve_handle(handle)

    def _step_sync(self):
        with self.stats.measure("-", "schedule"):
            seqs = self.scheduler.schedule()
            w = self.scheduler.burst_window(seqs, self.config.decode_burst)
        if w >= 2:
            w = 1 << (w.bit_length() - 1)  # power-of-two jit buckets
            tokens_ws = self.model_runner.run_burst(seqs, w)
            with self.stats.measure("burst", "post"):
                self.scheduler.postprocess_burst(seqs, tokens_ws)
        else:
            kind = (
                "decode" if all(s.num_new_tokens == 1 for s in seqs)
                else "prefill" if all(s.num_new_tokens > 1 for s in seqs)
                else "mixed"
            )
            token_ids, sampled_indices = self.model_runner.run(seqs, kind)
            with self.stats.measure(kind, "post"):
                self.scheduler.postprocess(seqs, token_ids, sampled_indices)
        outputs = [
            (seq.seq_id, seq.completion_token_ids) for seq in seqs if seq.is_finished
        ]
        num_total_tokens = sum(len(seq) for seq in seqs if seq.is_finished)
        return outputs, num_total_tokens

    def is_finished(self) -> bool:
        return (
            self.scheduler.is_finished()
            and self._pending is None
            and not self._finished_buf
        )

    # -- scoring / perplexity API (not in the reference; BASELINE ppl gates) --

    def score(self, token_ids_list: list[list[int]]) -> list[list[float]]:
        """Per-token log-probabilities (teacher forcing) for each document.

        Returns, for each document, logprob(x_i | x_<i) for i = 1..n-1
        (the first token is unconditioned).  Documents are BATCHED: as many
        as fit the KV pool run as concurrent prefill lanes per step, spread
        round-robin across all dp groups (the retired path ran one document
        per step on dp group 0 — a WikiText eval serialized its windows).
        Each step packs budget-sized chunks of every active document; the
        prefix cache is bypassed (fresh hashless blocks, no hash
        registration) so every position is computed.
        """
        import numpy as np

        self._drain_pending()
        sched = self.scheduler
        block_size = self.config.kvcache_block_size
        budget = self.config.max_num_batched_tokens
        dp = self.model_runner.dp
        lane_cap = self.config.max_num_seqs  # lanes per dp group

        results: list = [None] * len(token_ids_list)
        queue = deque(enumerate(token_ids_list))
        active: list[dict] = []   # {idx, seq, lps}
        rr = 0                    # round-robin dp-group cursor
        try:
            while queue or active:
                # admit documents while blocks + lanes are available
                while queue:
                    idx, token_ids = queue[0]
                    assert len(token_ids) >= 2, "need at least 2 tokens to score"
                    placed = False
                    for off in range(dp):
                        g = (rr + off) % dp
                        bm = sched.block_managers[g]
                        lanes_g = sum(
                            1 for a in active if a["seq"].dp_group == g
                        )
                        if lanes_g >= lane_cap or not bm.can_allocate(
                            len(token_ids)
                        ):
                            continue
                        seq = Sequence(token_ids, SamplingParams(),
                                       block_size=block_size)
                        seq.dp_group = g
                        # fresh hashless blocks through the allocator's own
                        # accounting (reserve_append_block); the prefix cache
                        # is deliberately not consulted or populated
                        for _ in range(seq.num_blocks):
                            ok = bm.reserve_append_block(seq)
                            assert ok, "document exceeds KV capacity"
                        active.append(
                            {"idx": idx, "seq": seq,
                             "lps": np.zeros(len(token_ids), np.float64)}
                        )
                        queue.popleft()
                        rr = g + 1
                        placed = True
                        break
                    if not placed:
                        assert active, "document exceeds KV capacity"
                        break

                # one step: a budget-sized chunk of every active document
                # (per-group budgets — each group is its own batch/chips).
                # Chunk cost is tile-padded, and the lane segment (p_start)
                # is reserved out of the budget, so p_end lands exactly on
                # the budget's power-of-two bucket instead of doubling t_pad
                # (16384-row steps for an 8192 budget measured ~2x slower).
                from nanovllm_tpu.constants import bucket as _bucket

                lanes_per_g = [0] * dp
                for a in active:
                    lanes_per_g[a["seq"].dp_group] += 1
                budget_left = [
                    max(budget - _round_up(_bucket(n), PREFILL_TILE),
                        PREFILL_TILE)
                    for n in lanes_per_g
                ]
                stepped: list[dict] = []
                group_has = [False] * dp
                for a in active:
                    seq = a["seq"]
                    g = seq.dp_group
                    rem = len(seq) - seq.num_cached_tokens
                    if budget_left[g] <= 0:
                        continue
                    chunk = min(rem, budget_left[g])
                    if chunk < rem:
                        # mid-stream chunks round DOWN to whole tiles (their
                        # pad rows would eat budget for nothing); a doc that
                        # can't fit a whole tile waits for the next step
                        chunk -= chunk % PREFILL_TILE
                        if chunk == 0:
                            if group_has[g]:
                                continue
                            chunk = min(rem, budget_left[g])  # progress
                    seq.num_new_tokens = chunk
                    budget_left[g] -= _round_up(chunk, PREFILL_TILE)
                    group_has[g] = True
                    stepped.append(a)
                lps_all, group_batches, group_idx = self.model_runner.run_score(
                    [a["seq"] for a in stepped]
                )
                for g, (gi, batch_np) in enumerate(
                    zip(group_idx, group_batches)
                ):
                    rows = np.nonzero(batch_np.slot_mapping >= 0)[0]
                    lanes = batch_np.token_seq[rows]
                    pos = batch_np.positions[rows]
                    vals = lps_all[g][rows]
                    for li in np.unique(lanes):
                        a = stepped[gi[int(li)]]
                        m = lanes == li
                        nxt = pos[m] + 1
                        keep = nxt < len(a["seq"])
                        a["lps"][nxt[keep]] = vals[m][keep]
                for a in stepped:
                    a["seq"].num_cached_tokens += a["seq"].num_new_tokens
                    a["seq"].num_new_tokens = 0

                # retire finished documents
                still = []
                for a in active:
                    if a["seq"].num_cached_tokens >= len(a["seq"]):
                        sched.block_managers[a["seq"].dp_group].deallocate(
                            a["seq"]
                        )
                        results[a["idx"]] = a["lps"][1:].tolist()
                    else:
                        still.append(a)
                active = still
        finally:
            for a in active:  # only on an exception mid-flight
                sched.block_managers[a["seq"].dp_group].deallocate(a["seq"])
        return results

    def perplexity(self, token_ids_list: list[list[int]]) -> float:
        """Corpus perplexity: exp(-mean per-token logprob) over all docs."""
        import math

        total, count = 0.0, 0
        for lps in self.score(token_ids_list):
            total += sum(lps)
            count += len(lps)
        return math.exp(-total / max(count, 1))

    # -- offline API ----------------------------------------------------------

    def generate(
        self,
        prompts,
        sampling_params,
        use_tqdm: bool = True,
    ) -> list[dict]:
        """Submit all prompts, run the step loop to completion, return
        [{"text", "token_ids"}] in input order (reference llm_engine.py:199-270)."""
        if not isinstance(sampling_params, list):
            sampling_params = [sampling_params] * len(prompts)
        assert len(sampling_params) == len(prompts)
        pbar = None
        if use_tqdm:
            from tqdm.auto import tqdm

            pbar = tqdm(total=len(prompts), desc="Generating", dynamic_ncols=True)
        seq_ids = [self.add_request(p, sp) for p, sp in zip(prompts, sampling_params)]
        order = {sid: i for i, sid in enumerate(seq_ids)}
        results: list = [None] * len(prompts)
        num_total_tokens = 0
        t0 = time.perf_counter()
        while not self.is_finished():
            outputs, n = self.step()
            num_total_tokens += n
            if pbar is not None and n:
                pbar.set_postfix(
                    {"tok/s": f"{int(num_total_tokens / (time.perf_counter() - t0))}"}
                )
            for seq_id, completion in outputs:
                results[order[seq_id]] = completion
                if pbar is not None:
                    pbar.update(1)
        if pbar is not None:
            pbar.close()
        if self.stats.enabled:
            import sys

            print(self.stats.summary(), file=sys.stderr)
        decode = (
            self.tokenizer.decode if self.tokenizer is not None else lambda ids: ""
        )
        return [{"text": decode(ids), "token_ids": ids} for ids in results]
