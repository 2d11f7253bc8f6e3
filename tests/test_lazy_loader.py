"""Lazy host-sliced loader vs eager assembly (utils/lazy_loader.py).

Every LazyLeaf, fully and partially sliced, must equal the eagerly-assembled
(+ quantized) pytree — including the pack_tp interleave at tp > 1 and the
vocab padding.  Also drives the LLM end-to-end (checkpoint loads now default
to the lazy path) to confirm greedy output is unchanged.
"""

import numpy as np
import pytest

import jax

from nanovllm_tpu.models.qwen3 import ModelSpec
from nanovllm_tpu.utils.lazy_loader import LazyLeaf, load_qwen3_params_lazy
from nanovllm_tpu.utils.loader import load_qwen3_params, quantize_params


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from tests.util_tiny_model import make_tiny_qwen3

    path = str(tmp_path_factory.mktemp("tiny_qwen3_lazy"))
    # hidden/intermediate must be GROUP multiples for group quantization
    # row-parallel K shards (q_size/tp, intermediate/tp) must stay GROUP
    # multiples at tp=2
    cfg = make_tiny_qwen3(path, hidden=128, heads=8, kv_heads=2, head_dim=32,
                          intermediate=512)
    return path, cfg


def materialize(tree):
    return jax.tree.map(
        lambda a: a[...] if isinstance(a, LazyLeaf) else a, tree,
        is_leaf=lambda a: isinstance(a, LazyLeaf),
    )


@pytest.mark.parametrize("tp", [1, 2])
@pytest.mark.parametrize("quant", ["none", "int8", "int4", "w8a8"])
def test_lazy_equals_eager(tiny_ckpt, tp, quant):
    path, cfg = tiny_ckpt
    spec = ModelSpec.from_hf(cfg, tp_size=tp, dtype="float32")
    eager = load_qwen3_params(path, spec)
    if quant != "none":
        eager = quantize_params(eager, quant, tp)
    lazy = load_qwen3_params_lazy(path, spec, quant)

    flat_e = jax.tree.leaves_with_path(eager)
    flat_l = {jax.tree_util.keystr(k): v for k, v in jax.tree.leaves_with_path(
        materialize(lazy))}
    assert len(flat_e) == len(flat_l)
    for k, ve in flat_e:
        vl = flat_l[jax.tree_util.keystr(k)]
        assert ve.shape == vl.shape, (k, ve.shape, vl.shape)
        np.testing.assert_array_equal(
            np.asarray(ve), np.asarray(vl), err_msg=str(k))


def test_partial_slices_match_full(tiny_ckpt):
    path, cfg = tiny_ckpt
    spec = ModelSpec.from_hf(cfg, tp_size=2, dtype="float32")
    lazy = load_qwen3_params_lazy(path, spec, "int8")
    qkv_w = lazy["layers"]["qkv"]["w"]
    full = qkv_w[...]
    L, K, N = qkv_w.shape
    # shard-shaped slices (what make_array_from_callback requests)
    for sl in [np.s_[:, :, : N // 2], np.s_[:, :, N // 2:],
               np.s_[1:2, :, : N // 2]]:
        np.testing.assert_array_equal(qkv_w[sl], full[sl])
    # row-parallel K slice (group-aligned, as the mesh sharding produces)
    down_w = lazy["layers"]["down"]["w"]
    full_d = down_w[...]
    Kd = down_w.shape[1]
    np.testing.assert_array_equal(down_w[:, : Kd // 2, :], full_d[:, : Kd // 2])
    np.testing.assert_array_equal(down_w[:, Kd // 2:, :], full_d[:, Kd // 2:])
    emb = lazy["embed"]
    full_e = emb[...]
    v_half = emb.shape[0] // 2
    np.testing.assert_array_equal(emb[v_half:, :], full_e[v_half:])
    np.testing.assert_array_equal(emb[:v_half, :], full_e[:v_half])


def test_llm_end_to_end_uses_lazy_loader(tiny_ckpt):
    from nanovllm_tpu import LLM, SamplingParams

    path, cfg = tiny_ckpt
    llm = LLM(path, dtype="float32", num_kvcache_blocks=32,
              kvcache_block_size=16, max_model_len=128, max_num_seqs=4,
              warmup_buckets=False)
    out = llm.generate([[3, 17, 99, 5, 42]],
                       SamplingParams(temperature=0.0, max_tokens=6),
                       use_tqdm=False)
    import torch
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(path).eval()
    with torch.no_grad():
        ref = model.generate(torch.tensor([[3, 17, 99, 5, 42]]),
                             max_new_tokens=6, do_sample=False)[0][5:]
    assert list(ref.numpy()) == out[0]["token_ids"]
