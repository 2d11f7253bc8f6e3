"""Async scheduling (one-step lookahead with device-side token feedback).

Greedy outputs must be bit-identical to the synchronous engine: the decode
input token rides the feedback operand instead of a host round-trip, EOS is
applied one step late with the overshoot discarded, and deferred prefix
hashes are committed only from patched values.
"""

import pytest

from nanovllm_tpu import LLM, SamplingParams

from util_tiny_model import make_tiny_qwen3


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_async"))
    cfg = make_tiny_qwen3(path)
    return path, cfg


def make_llm(path, async_scheduling, **kw):
    kw.setdefault("num_kvcache_blocks", 64)
    kw.setdefault("kvcache_block_size", 16)
    kw.setdefault("max_model_len", 256)
    kw.setdefault("max_num_seqs", 8)
    kw.setdefault("enforce_eager", True)
    return LLM(path, async_scheduling=async_scheduling, **kw)


def gen(llm, prompts, sp):
    return [o["token_ids"] for o in llm.generate(prompts, sp, use_tqdm=False)]


def test_async_matches_sync_greedy(ckpt):
    path, _ = ckpt
    prompts = [[3, 17, 99, 5], [2, 4, 6, 8, 10, 12], [1] * 20]
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    ref = gen(make_llm(path, False), prompts, sp)
    out = gen(make_llm(path, True), prompts, sp)
    assert out == ref


def test_async_eos_one_step_late_is_invisible(ckpt):
    """A mid-generation EOS must truncate identically even though async
    discovers it one dispatched step late."""
    path, _ = ckpt
    prompt = [3, 17, 99, 5]
    sp_free = SamplingParams(temperature=0.0, max_tokens=32, ignore_eos=True)
    free = gen(make_llm(path, True), [prompt], sp_free)[0]
    target = free[5]

    outs = []
    for mode in (False, True):
        llm = make_llm(path, mode)
        llm.config.eos = target
        llm.scheduler.eos = target
        sp = SamplingParams(temperature=0.0, max_tokens=32, ignore_eos=False)
        outs.append(gen(llm, [prompt], sp)[0])
        # every block released despite the in-flight overshoot step
        assert llm.scheduler.block_manager.num_used_blocks == 0
        assert llm.is_finished()
    assert outs[0] == outs[1]
    assert outs[0] == free[: free.index(target) + 1]


def test_async_decode_burst_matches_sync(ckpt):
    path, _ = ckpt
    prompts = [[9, 8, 7], [5, 5, 5, 5]]
    sp = SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True)
    ref = gen(make_llm(path, False, decode_burst=8), prompts, sp)
    out = gen(make_llm(path, True, decode_burst=8), prompts, sp)
    assert out == ref


def test_async_prefix_cache_from_patched_values(ckpt):
    """Blocks filled by async decode must enter the prefix cache with the
    PATCHED token values (a placeholder-contaminated hash would either miss
    or poison the cache)."""
    path, _ = ckpt
    llm = make_llm(path, True, decode_burst=8)
    prompt = [3, 17, 99, 5, 42, 7, 23, 88, 1, 64]
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    out = gen(llm, [prompt], sp)[0]
    full = prompt + out
    llm.add_request(full[:33], SamplingParams(temperature=0.0, max_tokens=1))
    seqs = llm.scheduler.schedule()
    assert seqs[0].num_cached_tokens == 32  # both full blocks prefix-hit
    token_ids, sampled = llm.model_runner.run(seqs)
    llm.scheduler.postprocess(seqs, token_ids, sampled)


def test_async_under_preemption_pressure(ckpt):
    """Tight KV pool: preemption + re-admission interleaves with in-flight
    steps; outputs must still match the sync engine."""
    path, _ = ckpt
    prompts = [[i + 1] * 12 for i in range(6)]
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)
    ref = gen(make_llm(path, False, num_kvcache_blocks=14), prompts, sp)
    out = gen(make_llm(path, True, num_kvcache_blocks=14), prompts, sp)
    assert out == ref
    ref2 = gen(make_llm(path, False, num_kvcache_blocks=64), prompts, sp)
    assert ref == ref2  # preemption itself must not change results
