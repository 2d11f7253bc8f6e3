"""End-to-end engine tests on the JAX CPU backend.

The reference cannot run without CUDA (SURVEY.md §4); this engine runs
anywhere JAX does, so e2e behavior is tested directly: greedy generation must
match HF transformers' greedy decode on the same tiny checkpoint, through the
full scheduler -> paged KV -> bucketed jit path, including chunked prefill
and prefix caching.
"""

import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams

PROMPTS = [
    [3, 17, 99, 5, 42],
    [7, 7, 23, 88, 1, 64, 2, 19, 55, 31, 8],
    [101, 45],
]
MAX_TOKENS = 8


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from tests.util_tiny_model import make_tiny_qwen3

    path = str(tmp_path_factory.mktemp("tiny_qwen3_e2e"))
    cfg = make_tiny_qwen3(path)
    return path, cfg


@pytest.fixture(scope="module")
def hf_greedy(tiny_ckpt):
    import torch
    from transformers import AutoModelForCausalLM

    path, _ = tiny_ckpt
    model = AutoModelForCausalLM.from_pretrained(path, dtype=torch.float32).eval()

    def run(prompt, max_tokens=MAX_TOKENS):
        with torch.no_grad():
            out = model.generate(
                torch.tensor([prompt]),
                max_new_tokens=max_tokens,
                do_sample=False,
                eos_token_id=None,
                pad_token_id=0,
            )
        return out[0, len(prompt):].tolist()

    return run


def make_llm(path, **kw):
    defaults = dict(
        dtype="float32",
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        max_num_batched_tokens=64,
        max_num_seqs=8,
        max_model_len=256,
        attention_impl="ref",
    )
    defaults.update(kw)
    return LLM(path, **defaults)


class TestGreedyParity:
    def test_generate_matches_hf_greedy(self, tiny_ckpt, hf_greedy):
        path, _ = tiny_ckpt
        llm = make_llm(path)
        sp = SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS, ignore_eos=True)
        outs = llm.generate(PROMPTS, sp, use_tqdm=False)
        for prompt, out in zip(PROMPTS, outs):
            assert out["token_ids"] == hf_greedy(prompt), f"prompt={prompt}"

    def test_chunked_prefill_same_tokens(self, tiny_ckpt, hf_greedy):
        path, _ = tiny_ckpt
        llm = make_llm(path, chunked_prefill=True, max_num_batched_tokens=8)
        sp = SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS, ignore_eos=True)
        outs = llm.generate(PROMPTS, sp, use_tqdm=False)
        for prompt, out in zip(PROMPTS, outs):
            assert out["token_ids"] == hf_greedy(prompt), f"prompt={prompt}"

    def test_prefix_cache_reuse_same_tokens(self, tiny_ckpt, hf_greedy):
        path, _ = tiny_ckpt
        llm = make_llm(path)
        sp = SamplingParams(temperature=0.0, max_tokens=MAX_TOKENS, ignore_eos=True)
        long_prompt = list(np.random.default_rng(0).integers(3, 100, size=40))
        long_prompt = [int(x) for x in long_prompt]
        first = llm.generate([long_prompt], sp, use_tqdm=False)[0]
        # second submission prefix-hits the first's blocks
        second = llm.generate([long_prompt], sp, use_tqdm=False)[0]
        assert llm.scheduler.stats.num_prefix_cached_tokens > 0
        assert first["token_ids"] == second["token_ids"] == hf_greedy(long_prompt)


class TestOnlineAPI:
    def test_add_request_step_loop(self, tiny_ckpt):
        path, _ = tiny_ckpt
        llm = make_llm(path)
        sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
        rid0 = llm.add_request(PROMPTS[0], sp)
        rid1 = llm.add_request(PROMPTS[1], sp)
        assert rid1 == rid0 + 1
        finished = {}
        steps = 0
        while not llm.is_finished():
            outputs, _ = llm.step()
            finished.update(dict(outputs))
            steps += 1
            assert steps < 50
        assert set(finished) == {rid0, rid1}
        assert all(len(v) == 4 for v in finished.values())

    def test_temperature_sampling_runs_and_respects_maxtokens(self, tiny_ckpt):
        path, _ = tiny_ckpt
        llm = make_llm(path)
        sp = SamplingParams(temperature=1.0, max_tokens=5, ignore_eos=True)
        outs = llm.generate(PROMPTS[:2], sp, use_tqdm=False)
        for out in outs:
            assert len(out["token_ids"]) == 5
            assert all(0 <= t < 128 for t in out["token_ids"])


class TestTeardown:
    """exit() / context-manager parity (reference llm_engine.py:120-135)."""

    def test_exit_then_second_engine_same_process(self, tiny_ckpt, hf_greedy):
        path, _ = tiny_ckpt
        llm = make_llm(path)
        out1 = llm.generate(
            PROMPTS[:1],
            SamplingParams(temperature=0, max_tokens=MAX_TOKENS),
            use_tqdm=False,
        )
        llm.exit()
        # device arrays released, teardown idempotent
        assert llm.model_runner.kv_pages is None
        assert llm.model_runner.params is None
        llm.exit()
        # a second engine constructs and generates in the same process
        with make_llm(path) as llm2:
            out2 = llm2.generate(
                PROMPTS[:1],
                SamplingParams(temperature=0, max_tokens=MAX_TOKENS),
                use_tqdm=False,
            )
        assert llm2.model_runner.kv_pages is None  # __exit__ ran exit()
        expected = hf_greedy(PROMPTS[0])
        assert out1[0]["token_ids"] == expected
        assert out2[0]["token_ids"] == expected

    def test_exit_drains_inflight_async_step(self, tiny_ckpt):
        path, _ = tiny_ckpt
        llm = make_llm(path, async_scheduling=True)
        llm.add_request(PROMPTS[0], SamplingParams(temperature=0, max_tokens=4))
        llm.step()  # dispatch; tokens still in flight
        assert llm._pending is not None
        llm.exit()  # must drain, not orphan, the handle
        assert llm._pending is None


class TestFusedKVWriteEngine:
    """Engine-level: the fused decode KV write (pallas) must generate the
    same greedy tokens as the scatter path, with chunked prefill + prefix
    cache + decode burst in the loop."""

    def test_fused_vs_scatter_same_tokens(self, tiny_ckpt):
        path, _ = tiny_ckpt
        prompts = [
            [3, 17, 99, 5, 42, 7, 23, 88, 11, 29],
            [101, 55, 9],
            [77, 13, 64, 2, 33],
        ]
        sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)

        def toks(fused):
            llm = make_llm(
                path, attention_impl="pallas", decode_burst=4,
                chunked_prefill=True, attn_fused_kv_write=fused,
            )
            out = [o["token_ids"] for o in
                   llm.generate(prompts, sp, use_tqdm=False)]
            llm.exit()
            return out

        assert toks(True) == toks(False)
