"""Scoring / perplexity parity vs HF transformers (CPU)."""

import math

import numpy as np
import pytest

from nanovllm_tpu import LLM


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from tests.util_tiny_model import make_tiny_qwen3

    path = str(tmp_path_factory.mktemp("tiny_qwen3_score"))
    cfg = make_tiny_qwen3(path)
    return path, cfg


def hf_logprobs(path, token_ids):
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(path, dtype=torch.float32).eval()
    with torch.no_grad():
        logits = model(torch.tensor([token_ids])).logits[0]
    logprobs = torch.log_softmax(logits, dim=-1)
    return [float(logprobs[i, token_ids[i + 1]]) for i in range(len(token_ids) - 1)]


def make_llm(path, **kw):
    defaults = dict(
        dtype="float32",
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        max_num_batched_tokens=32,
        max_num_seqs=8,
        max_model_len=512,
        attention_impl="ref",
    )
    defaults.update(kw)
    return LLM(path, **defaults)


def test_score_matches_hf(tiny_ckpt):
    path, _ = tiny_ckpt
    llm = make_llm(path)
    doc = [3, 17, 99, 5, 42, 7, 23, 88, 1, 64, 11, 29]
    ours = llm.score([doc])[0]
    theirs = hf_logprobs(path, doc)
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


def test_score_chunked_matches_unchunked(tiny_ckpt):
    """A doc longer than the token budget streams through in chunks and must
    produce identical logprobs."""
    path, _ = tiny_ckpt
    rng = np.random.default_rng(3)
    doc = [int(x) for x in rng.integers(3, 120, size=70)]
    chunked = make_llm(path, max_num_batched_tokens=16).score([doc])[0]
    whole = make_llm(path, max_num_batched_tokens=128).score([doc])[0]
    np.testing.assert_allclose(chunked, whole, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(chunked, hf_logprobs(path, doc), rtol=5e-4, atol=5e-4)


def test_score_batched_matches_per_doc(tiny_ckpt):
    """Many documents in ONE score() call (concurrent prefill lanes) must
    equal scoring each document in its own call, and HF."""
    path, _ = tiny_ckpt
    rng = np.random.default_rng(5)
    docs = [
        [int(x) for x in rng.integers(3, 120, size=n)]
        for n in (12, 5, 70, 33, 2, 17)
    ]
    llm = make_llm(path, max_num_batched_tokens=256, num_kvcache_blocks=96)
    free0 = llm.scheduler.block_manager.num_free_blocks
    batched = llm.score(docs)
    assert llm.scheduler.block_manager.num_free_blocks == free0  # no leaks
    for doc, got in zip(docs, batched):
        np.testing.assert_allclose(got, llm.score([doc])[0], rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(got, hf_logprobs(path, doc), rtol=5e-4,
                                   atol=5e-4)


def test_score_batched_more_docs_than_lanes(tiny_ckpt):
    """More documents than max_num_seqs lanes: admission must wave through
    the lane cap (and the tiny budget forces chunked interleaving)."""
    path, _ = tiny_ckpt
    rng = np.random.default_rng(6)
    docs = [
        [int(x) for x in rng.integers(3, 120, size=int(n))]
        for n in rng.integers(2, 40, size=12)
    ]
    llm = make_llm(path, max_num_seqs=4, max_num_batched_tokens=64)
    batched = llm.score(docs)
    for doc, got in zip(docs, batched):
        np.testing.assert_allclose(got, hf_logprobs(path, doc), rtol=5e-4,
                                   atol=5e-4)


def test_score_batched_dp2(tiny_ckpt):
    """Documents spread across dp groups must score identically to dp=1."""
    path, cfg = tiny_ckpt
    rng = np.random.default_rng(7)
    docs = [
        [int(x) for x in rng.integers(3, 120, size=n)]
        for n in (20, 9, 35, 4, 28)
    ]
    dp1 = make_llm(path, max_num_batched_tokens=128).score(docs)
    llm2 = make_llm(path, data_parallel_size=2, max_num_batched_tokens=128,
                    num_kvcache_blocks=32)
    dp2 = llm2.score(docs)
    for a, b in zip(dp1, dp2):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_perplexity_and_block_release(tiny_ckpt):
    path, _ = tiny_ckpt
    llm = make_llm(path)
    free0 = llm.scheduler.block_manager.num_free_blocks
    docs = [[3, 17, 99, 5, 42], [7, 23, 88, 1, 64, 2]]
    ppl = llm.perplexity(docs)
    lps = [lp for doc in llm.score(docs) for lp in doc]
    assert math.isclose(ppl, math.exp(-sum(lps) / len(lps)), rel_tol=1e-6)
    assert llm.scheduler.block_manager.num_free_blocks == free0  # no leaks
