"""Data-parallel (dp) engine tests on the simulated 8-device CPU mesh.

The reference is single-node TP-only (SURVEY.md §2.4); dp is our multi-host
axis: one logical scheduler, per-group KV partitions, batches stacked on a
leading dp axis, zero cross-dp collectives.  Greedy output must be identical
to dp=1.
"""

import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from tests.util_tiny_model import make_tiny_qwen3

    path = str(tmp_path_factory.mktemp("tiny_qwen3_dp"))
    cfg = make_tiny_qwen3(path)
    return path, cfg


def make_llm(path, cfg, dp, tp=1, **kw):
    return LLM(
        model=path,
        hf_config=cfg,
        dtype="float32",
        data_parallel_size=dp,
        tensor_parallel_size=tp,
        max_model_len=256,
        max_num_seqs=8,
        kvcache_block_size=16,
        num_kvcache_blocks=32,
        attention_impl="ref",
        decode_burst=4,
        **kw,
    )


PROMPTS = [
    [3, 17, 99, 5, 42, 7, 23, 88],
    [11, 29, 64, 2],
    [101, 55, 9, 81, 33, 6],
    [77, 13],
]


def greedy(llm, prompts, n=10):
    sp = SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True)
    return [o["token_ids"] for o in llm.generate(prompts, sp, use_tqdm=False)]


def test_dp2_matches_dp1(tiny_ckpt):
    path, cfg = tiny_ckpt
    ref = greedy(make_llm(path, cfg, dp=1), PROMPTS)
    out = greedy(make_llm(path, cfg, dp=2), PROMPTS)
    assert out == ref


def test_dp2_tp2_matches_dp1(tiny_ckpt):
    path, cfg = tiny_ckpt
    ref = greedy(make_llm(path, cfg, dp=1), PROMPTS)
    out = greedy(make_llm(path, cfg, dp=2, tp=2), PROMPTS)
    assert out == ref


def test_dp_distributes_sequences(tiny_ckpt):
    """With equal prefix potential, admission balances on free blocks."""
    path, cfg = tiny_ckpt
    llm = make_llm(path, cfg, dp=2)
    sp = SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True)
    for p in PROMPTS:
        llm.add_request(p, sp)
    seqs = llm.scheduler.schedule()
    groups = {s.dp_group for s in seqs}
    assert groups == {0, 1}, [s.dp_group for s in seqs]
    # finish the work so the engine drains cleanly
    while not llm.is_finished():
        llm.step()
    for bm in llm.scheduler.block_managers:
        assert bm.num_free_blocks == 32


def test_dp2_per_group_capacity_preemption(tiny_ckpt):
    """A group under KV pressure preempts within itself and still completes."""
    path, cfg = tiny_ckpt
    llm = make_llm(path, cfg, dp=2)
    # long outputs force block growth; tiny per-group pools force preemption
    sp = SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True)
    prompts = [[i * 7 % 110 + 3 for i in range(30)] for _ in range(6)]
    outs = llm.generate(prompts, sp, use_tqdm=False)
    assert all(len(o["token_ids"]) == 40 for o in outs)
