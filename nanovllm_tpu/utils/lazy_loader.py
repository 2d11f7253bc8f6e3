"""Host-sliced lazy weight loading: safetensors -> per-shard device arrays
without ever materializing the full model in host RAM.

The eager loader (utils/loader.py) assembles the whole packed/stacked param
pytree in numpy and lets ``shard_params`` transfer each device's slice.  On a
multi-host deployment every host would pay full-model host RAM and full-file
reads for weights it never owns.  Here every big leaf is a ``LazyLeaf``:
shape/dtype metadata plus a fetch that reads exactly the requested global
slice through safetensors' zero-copy slice API (the reference's analogue is
its per-rank shard slicing inside each weight_loader, reference
linear.py:165-184, :297-332 — but the reference still mmaps whole files on
every rank, loader.py:69-76).

``jax.make_array_from_callback`` (parallel/mesh.shard_params) drives the
fetches: on each host it requests only the addressable shards of the mesh-
sharded global array, so reads scale as 1/hosts for sharded axes.

Quantization composes slice-wise:
  * group-quant (int8/int4, group=128 along K): a scale depends only on its
    own 128-row group, and every sharding slices K at group multiples
    (asserted in quantize_params), so quantize(slice) == slice(quantize).
  * W8A8 per-channel scales need full-K column stats: the leaf fetches the
    full K range of the requested output channels, quantizes, then returns
    the requested rows — load-time-only overhead.
"""

import glob
import json
import os

import numpy as np

from nanovllm_tpu.models.qwen3 import ModelSpec
from nanovllm_tpu.ops.quant_matmul import (
    quantize_weight,
    quantize_weight_a8,
    weight_group,
)
from nanovllm_tpu.utils.loader import QUANTIZED_LAYER_WEIGHTS, _np_dtype


def _norm(idx, shape):
    """Normalize a basic index (slices / Ellipsis / ints) to per-dim ranges."""
    if not isinstance(idx, tuple):
        idx = (idx,)
    if Ellipsis in idx:
        i = idx.index(Ellipsis)
        idx = idx[:i] + (slice(None),) * (len(shape) - len(idx) + 1) + idx[i + 1:]
    idx = idx + (slice(None),) * (len(shape) - len(idx))
    out = []
    for s, dim in zip(idx, shape):
        if isinstance(s, int):
            s = slice(s, s + 1)
        start, stop, step = s.indices(dim)
        assert step == 1, "strided weight slices are not supported"
        out.append((start, stop))
    return out


class _Checkpoint:
    """Open-handle cache over a safetensors checkpoint directory."""

    def __init__(self, path: str):
        from safetensors import safe_open

        self._open = safe_open
        self.files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
        assert self.files, f"no safetensors found under {path}"
        self._handles = {}
        self.owner = {}
        for f in self.files:
            h = self._handle(f)
            for name in h.keys():
                self.owner[name] = f

    def _handle(self, f):
        if f not in self._handles:
            self._handles[f] = self._open(f, framework="np")
        return self._handles[f]

    def slice(self, name: str):
        return self._handle(self.owner[name]).get_slice(name)

    def tensor(self, name: str) -> np.ndarray:
        return self._handle(self.owner[name]).get_tensor(name)


class LazyLeaf:
    """A lazily-fetchable global array: shape/dtype + slice reader.

    ``fetch(ranges)`` receives [(start, stop)] per dim and returns the numpy
    block.  jax.tree treats instances as leaves (no registered flatten).
    """

    def __init__(self, shape, dtype, fetch):
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self._fetch = fetch

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def size(self):
        return int(np.prod(self.shape))

    def __getitem__(self, idx):
        out = self._fetch(_norm(idx, self.shape))
        assert out.dtype == self.dtype, (out.dtype, self.dtype)
        return out


def _stacked_linear(ckpt, names, spec, segments=None):
    """[L, K, N] stack of transposed HF [N_out, K_in] linears.

    ``segments``: pack_tp interleave table for the N axis — a list of
    (src_idx, src_row_start, width) triples in global-N order; None means a
    single un-packed source per layer (names[l] is then a 1-list).
    """
    dt = _np_dtype(spec.dtype)
    probe = ckpt.slice(names[0][0]).get_shape()
    k = probe[1]
    if segments is None:
        n = probe[0]
        segments = [(0, 0, n)]
    else:
        n = sum(w for _, _, w in segments)
    shape = (spec.num_layers, k, n)

    def fetch(ranges):
        (l0, l1), (k0, k1), (n0, n1) = ranges
        layers = []
        for li in range(l0, l1):
            pieces = []
            off = 0
            for src, row0, width in segments:
                lo, hi = max(n0, off), min(n1, off + width)
                if lo < hi:
                    sl = ckpt.slice(names[li][src])
                    r0 = row0 + (lo - off)
                    # HF stores [N_out, K_in]; transpose to [K, N]
                    pieces.append(sl[r0:r0 + (hi - lo), k0:k1])
                off += width
            layers.append(np.concatenate(pieces, axis=0).T)
        return np.stack(layers).astype(dt)

    return LazyLeaf(shape, dt, fetch)


def _pack_segments(widths: list[int], tp: int):
    """pack_tp's interleave as (src, src_row_start, width) in global order."""
    assert all(w % tp == 0 for w in widths), (widths, tp)
    out = []
    for r in range(tp):
        for src, w in enumerate(widths):
            out.append((src, r * (w // tp), w // tp))
    return out


def _vocab_rows(ckpt, name, spec):
    """[V_padded, H] embed/lm_head rows; pad rows (>= vocab) read as zeros."""
    dt = _np_dtype(spec.dtype)
    v, h = spec.vocab_size, spec.hidden_size
    shape = (spec.vocab_padded, h)

    def fetch(ranges):
        (r0, r1), (c0, c1) = ranges
        real = max(min(r1, v) - r0, 0)
        out = np.zeros((r1 - r0, c1 - c0), dt)
        if real:
            out[:real] = ckpt.slice(name)[r0:r0 + real, c0:c1].astype(dt)
        return out

    return LazyLeaf(shape, dt, fetch)


def _quant_pair(base: LazyLeaf, mode: str, scheme=None):
    """Quantized {"w", "s"} lazy views over a [L, K, N] base leaf.
    ``scheme``: optional (group, mse) for int4 (Config int4_group/int4_mse)."""
    L, k, n = base.shape
    if mode == "w8a8":
        w = LazyLeaf((L, k, n), np.int8, lambda r: quantize_weight_a8(
            base[r[0][0]:r[0][1], :, r[2][0]:r[2][1]]
        )[0][:, r[1][0]:r[1][1], :])
        s = LazyLeaf((L, n), np.float32, lambda r: quantize_weight_a8(
            base[r[0][0]:r[0][1], :, r[1][0]:r[1][1]]
        )[1][:, 0, :])
        return {"w": w, "s": s}
    int4 = mode == "int4"
    group, mse = scheme if (int4 and scheme) else (weight_group(int4), None)
    rows = k // 2 if int4 else k
    mult = 2 if int4 else 1

    def fetch_w(r):
        (l0, l1), (k0, k1), (n0, n1) = r
        blk = base[l0:l1, k0 * mult:k1 * mult, n0:n1]
        assert blk.shape[1] % group == 0, "weight slice must cover whole groups"
        return quantize_weight(blk, int4=int4, group=group, mse=mse)[0]

    def fetch_s(r):
        (l0, l1), (g0, g1), (n0, n1) = r
        blk = base[l0:l1, g0 * group:g1 * group, n0:n1]
        return quantize_weight(blk, int4=int4, group=group, mse=mse)[1]

    return {
        "w": LazyLeaf((L, rows, n), np.int8, fetch_w),
        "s": LazyLeaf((L, k // group, n), np.float32, fetch_s),
    }


def load_qwen3_params_lazy(path: str, spec: ModelSpec,
                           quantization: str = "none",
                           lm_head_int8: bool = False, scheme=None) -> dict:
    """Lazy counterpart of loader.load_qwen3_params (+ quantize_params).

    Big leaves ([L, K, N] stacks, vocab tables) are LazyLeaf; small per-layer
    vectors (norm scales, biases) load eagerly.  The returned tree drops into
    ``shard_params`` unchanged.
    """
    ckpt = _Checkpoint(path)
    dt = _np_dtype(spec.dtype)
    tp = spec.tp_size
    L = spec.num_layers
    pre = [f"model.layers.{i}." for i in range(L)]
    hd = spec.head_dim

    qkv = _stacked_linear(
        ckpt,
        [[p + f"self_attn.{w}_proj.weight" for w in "qkv"] for p in pre],
        spec,
        segments=_pack_segments(
            [spec.num_heads * hd, spec.num_kv_heads * hd,
             spec.num_kv_heads * hd], tp),
    )
    gate_up = _stacked_linear(
        ckpt,
        [[p + "mlp.gate_proj.weight", p + "mlp.up_proj.weight"] for p in pre],
        spec,
        segments=_pack_segments([spec.intermediate_size] * 2, tp),
    )
    o = _stacked_linear(ckpt, [[p + "self_attn.o_proj.weight"] for p in pre], spec)
    down = _stacked_linear(ckpt, [[p + "mlp.down_proj.weight"] for p in pre], spec)

    def vec(name):
        return np.stack([ckpt.tensor(p + name).astype(dt) for p in pre])

    layers = {
        "input_norm": vec("input_layernorm.weight"),
        "post_norm": vec("post_attention_layernorm.weight"),
        "qkv": qkv, "o": o, "gate_up": gate_up, "down": down,
    }
    if spec.qk_norm:
        layers["q_norm"] = vec("self_attn.q_norm.weight")
        layers["k_norm"] = vec("self_attn.k_norm.weight")
    if spec.attention_bias:
        from nanovllm_tpu.parallel.mesh import pack_tp

        layers["qkv_b"] = np.stack([pack_tp(
            [ckpt.tensor(p + f"self_attn.{w}_proj.bias").astype(dt)
             for w in "qkv"], tp, axis=0) for p in pre])

    if quantization != "none":
        for name in QUANTIZED_LAYER_WEIGHTS:
            layers[name] = _quant_pair(layers[name], quantization, scheme)

    params = {
        "embed": _vocab_rows(ckpt, "model.embed_tokens.weight", spec),
        "layers": layers,
        "final_norm": ckpt.tensor("model.norm.weight").astype(dt),
    }
    if not spec.tie_embeddings:
        params["lm_head"] = _vocab_rows(ckpt, "lm_head.weight", spec)
    if lm_head_int8:
        head = _vocab_rows(
            ckpt,
            "model.embed_tokens.weight" if spec.tie_embeddings
            else "lm_head.weight",
            spec,
        )
        from nanovllm_tpu.utils.loader import quantize_lm_head

        v_pad, h = head.shape

        def fetch_w(r):
            # per-ROW quantization: a row-range slice quantizes independently,
            # but each row needs its FULL H extent — guaranteed because the
            # head's pspec shards rows only (P("tp", None))
            (r0, r1), (c0, c1) = r
            assert c0 == 0 and c1 == h, "int8 head rows need full H"
            return quantize_lm_head(head[r0:r1, 0:h])["w"]

        def fetch_s(r):
            (z0, z1), (r0, r1) = r
            return quantize_lm_head(head[r0:r1, 0:h])["s"][z0:z1]

        params["lm_head_q"] = {
            "w": LazyLeaf((v_pad, h), np.int8, fetch_w),
            "s": LazyLeaf((1, v_pad), np.float32, fetch_s),
        }
    return params
