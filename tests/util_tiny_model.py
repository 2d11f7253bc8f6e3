"""Generate a tiny random Qwen3 HF checkpoint for tests (no network needed)."""

import os


def make_tiny_qwen3(
    dirpath: str,
    *,
    hidden=64,
    layers=2,
    heads=4,
    kv_heads=2,
    head_dim=16,
    intermediate=96,
    vocab=128,
    max_pos=512,
    tie=False,
    seed=0,
):
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(seed)
    cfg = Qwen3Config(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        head_dim=head_dim,
        intermediate_size=intermediate,
        vocab_size=vocab,
        max_position_embeddings=max_pos,
        tie_word_embeddings=tie,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
    )
    model = Qwen3ForCausalLM(cfg)
    model = model.eval()
    os.makedirs(dirpath, exist_ok=True)
    model.save_pretrained(dirpath, safe_serialization=True)
    return cfg


def make_tiny_llama(
    dirpath: str,
    *,
    hidden=64,
    layers=2,
    heads=4,
    kv_heads=2,
    intermediate=96,
    vocab=128,
    max_pos=512,
    tie=False,
    attention_bias=False,
    seed=0,
):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    cfg = LlamaConfig(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        intermediate_size=intermediate,
        vocab_size=vocab,
        max_position_embeddings=max_pos,
        tie_word_embeddings=tie,
        attention_bias=attention_bias,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
    )
    model = LlamaForCausalLM(cfg).eval()
    os.makedirs(dirpath, exist_ok=True)
    model.save_pretrained(dirpath, safe_serialization=True)
    return cfg


def make_tiny_qwen2(
    dirpath: str,
    *,
    hidden=64,
    layers=2,
    heads=4,
    kv_heads=2,
    intermediate=96,
    vocab=128,
    max_pos=512,
    tie=False,
    seed=0,
):
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(seed)
    cfg = Qwen2Config(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        intermediate_size=intermediate,
        vocab_size=vocab,
        max_position_embeddings=max_pos,
        tie_word_embeddings=tie,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
    )
    model = Qwen2ForCausalLM(cfg).eval()
    os.makedirs(dirpath, exist_ok=True)
    model.save_pretrained(dirpath, safe_serialization=True)
    return cfg


def make_tiny_mistral(
    dirpath: str,
    *,
    hidden=64,
    layers=2,
    heads=4,
    kv_heads=2,
    intermediate=96,
    vocab=128,
    max_pos=512,
    sliding_window=6,
    seed=0,
):
    import torch
    from transformers import MistralConfig, MistralForCausalLM

    torch.manual_seed(seed)
    cfg = MistralConfig(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        intermediate_size=intermediate,
        vocab_size=vocab,
        max_position_embeddings=max_pos,
        sliding_window=sliding_window,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
    )
    model = MistralForCausalLM(cfg).eval()
    os.makedirs(dirpath, exist_ok=True)
    model.save_pretrained(dirpath, safe_serialization=True)
    return cfg
