"""Unit tests for the continuous-batching scheduler.

Covers the vLLM-v1 policy from SURVEY.md §3.2 (reference scheduler.py:101-267):
token-budget accounting, chunked prefill, LIFO preemption, the
no-admission-after-preempt rule, and postprocess finish/commit semantics.
"""

import pytest

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.scheduler import Scheduler
from nanovllm_tpu.engine.sequence import Sequence, SequenceStatus
from nanovllm_tpu.sampling_params import SamplingParams

BS = 4
EOS = 99


class DummyHF:
    max_position_embeddings = 10_000


def make_scheduler(num_blocks=64, max_tokens_per_step=64, max_seqs=8,
                   chunked=False, max_model_len=64):
    cfg = Config(
        model="dummy",
        hf_config=DummyHF(),
        max_num_batched_tokens=max_tokens_per_step,
        max_num_seqs=max_seqs,
        max_model_len=max_model_len,
        kvcache_block_size=BS,
        num_kvcache_blocks=num_blocks,
        chunked_prefill=chunked,
    )
    cfg.eos = EOS
    return Scheduler(cfg)


def make_seq(tokens, max_tokens=16, ignore_eos=False):
    return Sequence(list(tokens), SamplingParams(max_tokens=max_tokens, ignore_eos=ignore_eos),
                    block_size=BS)


def run_step(sched, sampled_tokens=None):
    """One schedule+postprocess round; every fully-scheduled seq samples."""
    seqs = sched.schedule()
    sampled = [i for i, s in enumerate(seqs) if s.num_context_tokens == len(s)]
    if sampled_tokens is None:
        sampled_tokens = [1000 + i for i in sampled]
    sched.postprocess(seqs, sampled_tokens, sampled)
    return seqs, sampled


class TestAdmission:
    def test_prefill_then_decode(self):
        sched = make_scheduler()
        seq = make_seq(range(6), max_tokens=3)
        sched.add(seq)
        seqs, sampled = run_step(sched)
        assert seqs == [seq] and sampled == [0]
        assert seq.num_cached_tokens == 6 and len(seq) == 7
        # decode steps: exactly 1 new token each
        seqs, _ = run_step(sched)
        assert seqs[0].num_new_tokens == 0  # reset by postprocess
        assert len(seq) == 8
        run_step(sched)
        assert seq.is_finished  # max_tokens=3 reached
        assert sched.is_finished()

    def test_add_rejects_prompt_at_max_model_len(self):
        sched = make_scheduler(max_model_len=8)
        with pytest.raises(AssertionError):
            sched.add(make_seq(range(8)))

    def test_token_budget_bounds_admission(self):
        sched = make_scheduler(max_tokens_per_step=10)
        a, b = make_seq(range(6)), make_seq(range(50, 56))
        sched.add(a)
        sched.add(b)
        seqs = sched.schedule()
        # b (6 tokens) does not fit in remaining budget 4 -> only a scheduled
        assert seqs == [a]
        sched.postprocess(seqs, [1], [0])

    def test_max_num_seqs_bounds_admission(self):
        sched = make_scheduler(max_seqs=2)
        seqs_in = [make_seq(range(4)) for _ in range(3)]
        for s in seqs_in:
            sched.add(s)
        scheduled = sched.schedule()
        assert len(scheduled) == 2


class TestChunkedPrefill:
    def test_prompt_split_across_steps_no_sample_midway(self):
        sched = make_scheduler(max_tokens_per_step=8, chunked=True)
        seq = make_seq(range(20), max_tokens=2)
        sched.add(seq)
        seqs, sampled = run_step(sched)
        assert seq.num_cached_tokens == 8 and sampled == []  # chunk 1: no logits
        seqs, sampled = run_step(sched)
        assert seq.num_cached_tokens == 16 and sampled == []
        seqs, sampled = run_step(sched)
        assert sampled == [0]  # final chunk reaches prompt end -> sampled
        assert len(seq) == 21

    def test_decode_interleaves_with_chunked_prefill(self):
        sched = make_scheduler(max_tokens_per_step=8, chunked=True)
        a = make_seq(range(4), max_tokens=8)
        sched.add(a)
        run_step(sched)  # a prefilled + sampled
        b = make_seq(range(300, 320), max_tokens=2)
        sched.add(b)
        seqs, sampled = run_step(sched)
        # a decodes (1 token) + b gets a 7-token chunk in the same step
        assert seqs[0] is a and seqs[1] is b
        assert a.num_cached_tokens == 5 and b.num_cached_tokens == 7
        assert sampled == [0]


class TestPreemption:
    def test_lifo_preempt_frees_newest_seq(self):
        # 4 blocks of 4 tokens = 16 token slots total
        sched = make_scheduler(num_blocks=4, max_tokens_per_step=16, max_model_len=32)
        a = make_seq(range(7), max_tokens=20, ignore_eos=True)   # 2 blocks
        b = make_seq(range(100, 107), max_tokens=20, ignore_eos=True)  # 2 blocks
        sched.add(a)
        sched.add(b)
        run_step(sched)  # both prefill: all 4 blocks used (partial slack 1 each)
        # decodes fit in slack for 1 step, then one seq must be evicted
        for _ in range(4):
            seqs, _ = run_step(sched)
        statuses = {a.status, b.status}
        assert SequenceStatus.WAITING in statuses  # someone was preempted
        assert sched.stats.num_preempted >= 1
        # LIFO: b (admitted last) is the victim
        assert b.status == SequenceStatus.WAITING
        assert b.block_table == [] and b.num_cached_tokens == 0

    def test_no_admission_in_preempting_step(self):
        sched = make_scheduler(num_blocks=4, max_tokens_per_step=32, max_model_len=32)
        a = make_seq(range(7), max_tokens=20, ignore_eos=True)
        b = make_seq(range(100, 107), max_tokens=20, ignore_eos=True)
        sched.add(a)
        sched.add(b)
        run_step(sched)
        c = make_seq(range(200, 204))
        sched.add(c)
        preempt_step_seen = False
        for _ in range(6):
            seqs, sampled = run_step(sched)
            if sched.stats.num_preempted > 0 and not preempt_step_seen:
                preempt_step_seen = True
                # the step that preempted must not have admitted c
                assert c not in seqs
        assert preempt_step_seen

    def test_preempted_seq_resumes_and_finishes(self):
        sched = make_scheduler(num_blocks=4, max_tokens_per_step=32, max_model_len=32)
        a = make_seq(range(7), max_tokens=6, ignore_eos=True)
        b = make_seq(range(100, 107), max_tokens=6, ignore_eos=True)
        sched.add(a)
        sched.add(b)
        for _ in range(40):
            if sched.is_finished():
                break
            run_step(sched)
        assert sched.is_finished()
        assert a.num_completion_tokens == 6 and b.num_completion_tokens == 6


class TestPostprocess:
    def test_eos_finishes_unless_ignored(self):
        sched = make_scheduler()
        a = make_seq(range(4), max_tokens=8)
        b = make_seq(range(10, 14), max_tokens=8, ignore_eos=True)
        sched.add(a)
        sched.add(b)
        seqs = sched.schedule()
        sched.postprocess(seqs, [EOS, EOS], [0, 1])
        assert a.is_finished
        assert not b.is_finished
        assert b.completion_token_ids == [EOS]

    def test_finished_seq_releases_blocks(self):
        sched = make_scheduler()
        free0 = sched.block_manager.num_free_blocks
        seq = make_seq(range(6), max_tokens=1)
        sched.add(seq)
        run_step(sched)
        assert seq.is_finished
        assert sched.block_manager.num_free_blocks == free0

    def test_max_model_len_finishes_sequence(self):
        sched = make_scheduler(max_model_len=8)
        seq = make_seq(range(6), max_tokens=64, ignore_eos=True)
        sched.add(seq)
        run_step(sched)
        run_step(sched)
        assert len(seq) == 8 and seq.is_finished

    def test_output_order_and_prefix_stats(self):
        sched = make_scheduler()
        a = make_seq(range(8), max_tokens=1)
        sched.add(a)
        run_step(sched)
        # identical prompt hits the prefix cache on admission
        b = make_seq(range(8), max_tokens=1)
        sched.add(b)
        run_step(sched)
        assert sched.stats.num_prefix_cached_tokens == BS  # first full block


def test_abort_frees_blocks_and_removes():
    """abort() cancels waiting or running requests and releases their KV."""
    from nanovllm_tpu.config import Config
    from nanovllm_tpu.engine.scheduler import Scheduler
    from nanovllm_tpu.engine.sequence import Sequence
    from nanovllm_tpu.sampling_params import SamplingParams

    class HF:
        max_position_embeddings = 1024

    cfg = Config(model="", hf_config=HF(), max_model_len=256, max_num_seqs=8,
                 kvcache_block_size=16, num_kvcache_blocks=16,
                 max_num_batched_tokens=64)
    sched = Scheduler(cfg)
    a = Sequence(list(range(20)), SamplingParams(max_tokens=4), block_size=16)
    b = Sequence(list(range(30)), SamplingParams(max_tokens=4), block_size=16)
    sched.add(a)
    sched.add(b)
    sched.schedule()  # both admitted
    free_before = sched.block_manager.num_free_blocks
    assert sched.abort(a.seq_id)
    assert a.is_finished and a not in sched.running
    assert sched.block_manager.num_free_blocks > free_before
    assert sched.abort(b.seq_id)
    assert sched.is_finished()
    assert sched.block_manager.num_free_blocks == 16
    assert not sched.abort(12345)  # unknown id
