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
from dataclasses import fields

from nanovllm_tpu.config import Config
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
        (the first token is unconditioned).  Documents stream through the
        paged KV cache in budget-sized chunks; the prefix cache is bypassed
        (fresh blocks, no hash registration) so every position is computed.
        """
        self._drain_pending()
        bm = self.scheduler.block_manager
        budget = self.config.max_num_batched_tokens
        results = []
        for token_ids in token_ids_list:
            assert len(token_ids) >= 2, "need at least 2 tokens to score"
            seq = Sequence(token_ids, SamplingParams(),
                           block_size=self.config.kvcache_block_size)
            assert bm.can_allocate(len(token_ids)), "document exceeds KV capacity"
            # fresh hashless blocks through the allocator's own accounting
            # (reserve_append_block); the prefix cache is deliberately not
            # consulted or populated — every position must be computed
            for _ in range(seq.num_blocks):
                ok = bm.reserve_append_block(seq)
                assert ok, "document exceeds KV capacity"
            lps = [0.0] * len(token_ids)
            try:
                while seq.num_cached_tokens < len(seq):
                    chunk = min(budget, len(seq) - seq.num_cached_tokens)
                    seq.num_new_tokens = chunk
                    row_lps, batch_np = self.model_runner.run_score([seq])
                    import numpy as np

                    rows = np.nonzero(batch_np.slot_mapping >= 0)[0]
                    for r in rows:
                        p = int(batch_np.positions[r])
                        if p + 1 < len(seq):
                            lps[p + 1] = float(row_lps[r])
                    seq.num_cached_tokens += chunk
                    seq.num_new_tokens = 0
            finally:
                bm.deallocate(seq)
            results.append(lps[1:])
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
