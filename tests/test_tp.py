"""Tensor-parallel tests on a simulated 8-device CPU mesh.

Validates the shard_map TP design (SURVEY.md §2.4 comm pattern: psum after
o_proj/down_proj, vocab-parallel embed psum, sharded-sampler all_gather):
tp=2/tp=4 must produce the same tokens as tp=1 for greedy decoding.
"""

import pytest

from nanovllm_tpu import LLM, SamplingParams

PROMPTS = [
    [3, 17, 99, 5, 42],
    [7, 7, 23, 88, 1, 64, 2, 19],
]


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from tests.util_tiny_model import make_tiny_qwen3

    path = str(tmp_path_factory.mktemp("tiny_qwen3_tp"))
    cfg = make_tiny_qwen3(path)  # heads=4, kv_heads=2 -> tp in {1, 2}
    return path, cfg


@pytest.fixture(scope="module")
def tiny_ckpt_tp4(tmp_path_factory):
    from tests.util_tiny_model import make_tiny_qwen3

    path = str(tmp_path_factory.mktemp("tiny_qwen3_tp4"))
    cfg = make_tiny_qwen3(path, heads=8, kv_heads=4, intermediate=128, seed=1)
    return path, cfg


def run_greedy(path, tp):
    llm = LLM(
        path,
        dtype="float32",
        tensor_parallel_size=tp,
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        max_num_batched_tokens=64,
        max_num_seqs=8,
        max_model_len=256,
        attention_impl="ref",
    )
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    outs = llm.generate(PROMPTS, sp, use_tqdm=False)
    return [o["token_ids"] for o in outs]


def test_tp2_matches_tp1(tiny_ckpt):
    path, _ = tiny_ckpt
    assert run_greedy(path, 2) == run_greedy(path, 1)


def test_tp4_matches_tp1(tiny_ckpt_tp4):
    path, _ = tiny_ckpt_tp4
    assert run_greedy(path, 4) == run_greedy(path, 1)
