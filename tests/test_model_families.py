"""Model-family coverage beyond the reference's single Qwen3 architecture.

Llama (no QK-Norm, no bias) and Qwen2 (qkv bias, no QK-Norm) share the
decoder body; parity is checked against HF transformers on tiny random
checkpoints, both at the logits level and end-to-end through the engine.
"""

import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams
from nanovllm_tpu.models.qwen3 import ModelSpec


@pytest.fixture(scope="module")
def llama_ckpt(tmp_path_factory):
    from tests.util_tiny_model import make_tiny_llama

    path = str(tmp_path_factory.mktemp("tiny_llama"))
    cfg = make_tiny_llama(path)
    return path, cfg


@pytest.fixture(scope="module")
def qwen2_ckpt(tmp_path_factory):
    from tests.util_tiny_model import make_tiny_qwen2

    path = str(tmp_path_factory.mktemp("tiny_qwen2"))
    cfg = make_tiny_qwen2(path)
    return path, cfg


def hf_greedy(path, prompt, n):
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(path, torch_dtype=torch.float32).eval()
    ids = torch.tensor([prompt])
    with torch.no_grad():
        out = model.generate(
            ids, max_new_tokens=n, do_sample=False, use_cache=True,
            pad_token_id=0,
        )
    return out[0, len(prompt):].tolist()


def our_greedy(path, cfg, prompt, n):
    llm = LLM(
        model=path,
        hf_config=cfg,
        dtype="float32",
        max_model_len=256,
        max_num_seqs=4,
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        attention_impl="ref",
        decode_burst=4,
    )
    sp = SamplingParams(temperature=0.0, max_tokens=n, ignore_eos=True)
    return llm.generate([prompt], sp, use_tqdm=False)[0]["token_ids"]


def test_spec_flags():
    class C:
        model_type = "llama"
        hidden_size = 64
        num_hidden_layers = 2
        num_attention_heads = 4
        num_key_value_heads = 2
        intermediate_size = 96
        vocab_size = 128
        attention_bias = False

    spec = ModelSpec.from_hf(C())
    assert not spec.qk_norm and not spec.attention_bias
    C.model_type = "qwen2"
    del C.attention_bias
    spec = ModelSpec.from_hf(C())
    assert not spec.qk_norm and spec.attention_bias


def test_unsupported_arch_raises():
    class C:
        model_type = "gpt2"
        hidden_size = 64
        num_hidden_layers = 2
        num_attention_heads = 4
        num_key_value_heads = 2
        intermediate_size = 96
        vocab_size = 128

    with pytest.raises(ValueError, match="unsupported architecture"):
        ModelSpec.from_hf(C())


def test_llama_greedy_matches_hf(llama_ckpt):
    path, cfg = llama_ckpt
    prompt = [3, 17, 99, 5, 42, 7, 23, 88]
    ours = our_greedy(path, cfg, prompt, 12)
    theirs = hf_greedy(path, prompt, 12)
    assert ours == theirs


def test_qwen2_greedy_matches_hf(qwen2_ckpt):
    path, cfg = qwen2_ckpt
    prompt = [3, 17, 99, 5, 42, 7, 23, 88]
    ours = our_greedy(path, cfg, prompt, 12)
    theirs = hf_greedy(path, prompt, 12)
    assert ours == theirs


@pytest.fixture(scope="module")
def mistral_ckpt(tmp_path_factory):
    from tests.util_tiny_model import make_tiny_mistral

    path = str(tmp_path_factory.mktemp("tiny_mistral"))
    # window 6 << prompt + decode length, so the band genuinely binds
    cfg = make_tiny_mistral(path, sliding_window=6)
    return path, cfg


def test_mistral_spec_has_sliding_window(mistral_ckpt):
    _, cfg = mistral_ckpt
    spec = ModelSpec.from_hf(cfg)
    assert spec.sliding_window == 6
    assert not spec.qk_norm and not spec.attention_bias


def test_mistral_sliding_window_greedy_matches_hf(mistral_ckpt):
    """Greedy parity vs HF with an ACTIVE sliding window: positions run past
    3x the window, so full-causal attention would produce different tokens."""
    path, cfg = mistral_ckpt
    prompt = [3, 17, 99, 5, 42, 7, 23, 88, 11, 64]
    ours = our_greedy(path, cfg, prompt, 12)
    theirs = hf_greedy(path, prompt, 12)
    assert ours == theirs
