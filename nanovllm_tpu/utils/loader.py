"""Weight loading: HF safetensors -> stacked, TP-packed param pytree.

Capability parity with the reference loader (reference utils/loader.py:44-95):
iterates ``*.safetensors``, routes q/k/v -> packed qkv and gate/up -> packed
gate_up (the reference's ``packed_modules_mapping``, qwen3.py:465-471), and
honors ``tie_word_embeddings`` (qwen3.py:481-482).  Differences:

  * Weights are stacked across layers (axis 0) for the scan-over-layers
    forward, and transposed to [in, out] so matmuls are ``x @ w`` (MXU-natural).
  * Column-parallel packs are interleaved shard-major (parallel/mesh.pack_tp)
    so a mesh-sharded global array gives each shard its contiguous
    [q_s|k_s|v_s] / [gate_s|up_s] slice — replacing the reference's per-class
    shard-offset weight_loader logic (linear.py:297-332).
  * Vocab rows are zero-padded up to a multiple of tp (masked at lookup and
    sampling time).
"""

import glob
import os

import numpy as np

from nanovllm_tpu.models.qwen3 import ModelSpec
from nanovllm_tpu.parallel.mesh import pack_tp

try:  # numpy bfloat16 support for safetensors round-trips
    import ml_dtypes

    BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    BFLOAT16 = None


def _np_dtype(name: str):
    if name == "bfloat16":
        assert BFLOAT16 is not None, "ml_dtypes required for bfloat16 load"
        return BFLOAT16
    return np.dtype(name)


def _pad_vocab(arr: np.ndarray, spec: ModelSpec) -> np.ndarray:
    pad = spec.vocab_padded - arr.shape[0]
    if pad:
        arr = np.concatenate([arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)], axis=0)
    return arr


def load_qwen3_params(path: str, spec: ModelSpec) -> dict:
    """Read an HF Qwen3 checkpoint directory into the model's param pytree
    (host numpy arrays, globally shaped, TP-packed)."""
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    assert files, f"no safetensors found under {path}"
    raw: dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(f, framework="np") as st:
            for name in st.keys():
                raw[name] = st.get_tensor(name)
    return assemble_params(raw, spec)


def assemble_params(raw: dict, spec: ModelSpec) -> dict:
    """Build the param pytree from a flat HF state dict (numpy)."""
    dt = _np_dtype(spec.dtype)
    tp = spec.tp_size

    def get(name):
        return raw[name].astype(dt)

    def linear(name):
        # HF stores [out, in]; we want [in, out]
        return get(name).T

    keys = ["input_norm", "qkv", "o", "post_norm", "gate_up", "down"]
    if spec.qk_norm:
        keys += ["q_norm", "k_norm"]
    if spec.attention_bias:
        keys += ["qkv_b"]
    layers = {k: [] for k in keys}
    for i in range(spec.num_layers):
        p = f"model.layers.{i}."
        layers["input_norm"].append(get(p + "input_layernorm.weight"))
        layers["qkv"].append(pack_tp(
            [linear(p + "self_attn.q_proj.weight"),
             linear(p + "self_attn.k_proj.weight"),
             linear(p + "self_attn.v_proj.weight")], tp, axis=1))
        if spec.attention_bias:
            layers["qkv_b"].append(pack_tp(
                [get(p + "self_attn.q_proj.bias"),
                 get(p + "self_attn.k_proj.bias"),
                 get(p + "self_attn.v_proj.bias")], tp, axis=0))
        if spec.qk_norm:
            layers["q_norm"].append(get(p + "self_attn.q_norm.weight"))
            layers["k_norm"].append(get(p + "self_attn.k_norm.weight"))
        layers["o"].append(linear(p + "self_attn.o_proj.weight"))
        layers["post_norm"].append(get(p + "post_attention_layernorm.weight"))
        layers["gate_up"].append(pack_tp(
            [linear(p + "mlp.gate_proj.weight"),
             linear(p + "mlp.up_proj.weight")], tp, axis=1))
        layers["down"].append(linear(p + "mlp.down_proj.weight"))

    params = {
        "embed": _pad_vocab(get("model.embed_tokens.weight"), spec),
        "layers": {k: np.stack(v) for k, v in layers.items()},
        "final_norm": get("model.norm.weight"),
    }
    if not spec.tie_embeddings:
        params["lm_head"] = _pad_vocab(get("lm_head.weight"), spec)
    return params


QUANTIZED_LAYER_WEIGHTS = ("qkv", "o", "gate_up", "down")


def quantize_lm_head(head: "np.ndarray") -> dict:
    """Per-row (per-vocab-entry) symmetric int8 of the [V_pad, H] LM head.

    Returns {"w": int8 [V_pad, H], "s": f32 [1, V_pad]} consumed by the fused
    sampling kernel (ops/fused_sample.py) — halves the head's HBM stream,
    which is the dominant fixed cost of a decode sampling pass.
    """
    try:  # threaded math (see ops/quant_matmul.quantize_weight)
        import torch

        t = torch.from_numpy(np.ascontiguousarray(head, dtype=np.float32))
        s = t.abs().amax(dim=1, keepdim=True).clamp_min(1e-8) / 127.0
        q = torch.round(t / s).clamp(-127, 127).to(torch.int8).numpy()
        return {"w": q, "s": s.numpy().astype(np.float32).reshape(1, -1)}
    except ImportError:  # pragma: no cover
        head = np.asarray(head, dtype=np.float32)
        amax = np.abs(head).max(axis=1, keepdims=True)
        s = np.maximum(amax, 1e-8) / 127.0
        q = np.rint(head / s).clip(-127, 127).astype(np.int8)
        return {"w": q, "s": s.astype(np.float32).reshape(1, -1)}


def quantize_params(params: dict, mode: str, tp: int,
                    lm_head_int8: bool = False, scheme=None) -> dict:
    """Quantization of the decoder linears (embed/norms stay high precision;
    the LM-head gets a per-row int8 copy when ``lm_head_int8``).  ``mode``:
      "int8" / "int4" — weight-only, group=128 along the contraction axis;
      "w8a8"          — int8 weights per-channel + dynamic int8 activations
                        (int8 MXU; see ops/quant_matmul.py).
    ``scheme`` — optional (group, mse) pair for int4 (Config int4_group /
    int4_mse via ops.quant_matmul.int4_scheme); None = env/default.
    """
    from nanovllm_tpu.ops.quant_matmul import (
        GROUP,
        quantize_weight,
        quantize_weight_a8,
    )

    assert mode in ("int8", "int4", "w8a8"), mode
    int4 = mode == "int4"
    i4_group, i4_mse = scheme if (int4 and scheme) else (None, None)
    layers = dict(params["layers"])
    for name in QUANTIZED_LAYER_WEIGHTS:
        w = layers[name]                       # [L, K, N]
        # broadcast layer stacks (init_random_params distinct_layers=False):
        # quantize one plane, broadcast the result — /L host time and memory
        bcast = w.ndim == 3 and w.strides[0] == 0
        L = w.shape[0]
        if bcast:
            w = w[0]
        if mode == "w8a8":
            wq, sw = quantize_weight_a8(w)
            if bcast:
                wq = np.broadcast_to(wq, (L,) + wq.shape)
                sw = np.broadcast_to(sw, (L,) + sw.shape)
            layers[name] = {"w": wq, "s": sw[:, 0, :]}  # scales [L, N]
            continue
        k = w.shape[-2]
        if name in ("o", "down"):
            # row-parallel: each shard's K range must align to the group
            assert (k // tp) % GROUP == 0, (name, k, tp)
        else:
            assert k % GROUP == 0, (name, k)
        wq, scales = quantize_weight(w, int4=int4, group=i4_group, mse=i4_mse)
        if bcast:
            wq = np.broadcast_to(wq, (L,) + wq.shape)
            scales = np.broadcast_to(scales, (L,) + scales.shape)
        layers[name] = {"w": wq, "s": scales}
    out = dict(params)
    out["layers"] = layers
    if lm_head_int8:
        out["lm_head_q"] = quantize_lm_head(
            params.get("lm_head", params["embed"])
        )
    return out


def init_random_params(seed: int, spec: ModelSpec, scale: float = 0.02,
                       distinct_layers: bool = True) -> dict:
    """Random params with the model's structure (bench / tests without a
    checkpoint; throughput does not depend on weight values).

    Values are tiled from a 4M-entry Gaussian pool: numpy's per-sample
    Gaussian is ~13M samples/s on this host, which made a 14B-geometry init
    take ~19 minutes; tiling is pure memcpy.  ``distinct_layers=False``
    additionally broadcasts ONE layer's weights across the layer stack
    (zero-copy views) — identical layers change nothing for throughput
    benchmarking, and quantization then runs once per shape instead of once
    per layer (bench.py cold start).  Keep it True for anything that looks
    at model BEHAVIOR (quality proxies).
    """
    rng = np.random.default_rng(seed)
    dt = _np_dtype(spec.dtype)
    L, H, hd = spec.num_layers, spec.hidden_size, spec.head_dim
    q_sz = spec.num_heads * hd
    kv_sz = spec.num_kv_heads * hd
    I, V = spec.intermediate_size, spec.vocab_padded

    pool = (rng.standard_normal(1 << 22, dtype=np.float32) * scale).astype(dt)
    offset = [0]

    def fill(shape):
        # distinct prime-stride start per call so no two fills (or two layer
        # planes) are equal or trivially aligned copies of each other
        offset[0] = (offset[0] + 1310711) % pool.size
        src = np.roll(pool, -offset[0])
        n = int(np.prod(shape))
        return np.tile(src, -(-n // pool.size))[:n].reshape(shape)

    def w(*shape):
        if len(shape) == 3 and shape[0] == L:
            if not distinct_layers:
                return np.broadcast_to(fill(shape[1:]), shape)
            return np.stack([fill(shape[1:]) for _ in range(L)])
        return fill(shape)

    def ones(*shape):
        return np.ones(shape, dtype=dt)

    layers = {
        "input_norm": ones(L, H),
        "qkv": w(L, H, q_sz + 2 * kv_sz),
        "o": w(L, q_sz, H),
        "post_norm": ones(L, H),
        "gate_up": w(L, H, 2 * I),
        "down": w(L, I, H),
    }
    if spec.qk_norm:
        layers["q_norm"] = ones(L, hd)
        layers["k_norm"] = ones(L, hd)
    if spec.attention_bias:
        layers["qkv_b"] = w(L, q_sz + 2 * kv_sz)
    params = {
        "embed": w(V, H),
        "layers": layers,
        "final_norm": ones(H),
    }
    if not spec.tie_embeddings:
        params["lm_head"] = w(V, H)
    return params
