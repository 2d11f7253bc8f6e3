"""Pallas TPU kernel: weight-only quantized matmul (W8A16 / W4A16).

The decode phase streams every weight byte from HBM once per step, so
halving (int8) or quartering (int4) the weight bytes is the direct
throughput lever (BASELINE.md: >= 2x bf16 tokens/s/chip target).  XLA cannot
do this on its own: a jnp dequant-then-matmul materializes the full bf16
weight, paying the bandwidth back.  This kernel DMAs the int8/int4 tiles,
converts on the VPU, and feeds the MXU.

Quantization scheme (symmetric, group along the contraction axis):
  w_q [K, N] int8 (or int4 packed two-per-byte: [K//2, N])
  scales [K//group, N] float32,  w ~= w_q * scales[k // group, n]

Grid (T_tiles, N_tiles, K_tiles) with K tile == group, so the scale is a
single row per tile and can be applied AFTER the MXU dot (cheaper than
dequantizing the whole tile).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128


def _qmm_kernel(x_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k, int4: bool):
    # One grid step covers BK = groups_per_tile * GROUP contraction rows.
    # The weight tile is dequantized on the VPU (int8 -> f32 * scale -> bf16,
    # a fraction of the tile's MXU time) and fed to ONE wide dot — a
    # scale-after-dot design pins BK to GROUP (128) and pays 4-8x the grid
    # steps, which dominated prefill.
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    if int4:
        # unpack two nibbles per byte: low nibble = even k, high = odd k
        packed = w_ref[...]                       # [BK//2, BN] int8
        low = jnp.left_shift(packed, 4)           # sign-extend low nibble
        low = jnp.right_shift(low, 4)
        high = jnp.right_shift(packed, 4)
        bk2, bn = packed.shape
        w = jnp.stack([low, high], axis=1).reshape(2 * bk2, bn)
    else:
        w = w_ref[...]                            # [BK, BN] int8
    bk, bn = w.shape
    s = s_ref[0]                                  # [gpt, BN]
    g = bk // s.shape[0]
    # dequant in f32 (exact), then to the activation dtype: int8 x scale in
    # bf16 directly would round the scale product twice
    wf = w.astype(jnp.float32).reshape(s.shape[0], g, bn)
    wf = wf * s[:, None, :]
    acc_ref[...] += lax.dot_general(
        x, wf.reshape(bk, bn).astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def quant_matmul_pallas(
    x: jnp.ndarray,       # [T, K] activations
    w_q: jnp.ndarray,     # [K, N] int8, or [K//2, N] int8 (packed int4)
    scales: jnp.ndarray,  # [K//GROUP, N] float32
    *,
    int4: bool = False,
    block_t: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    t, k = x.shape
    n = w_q.shape[1]
    k_w = w_q.shape[0] * (2 if int4 else 1)
    assert k_w == k and k % GROUP == 0, (k, k_w)
    bt = min(block_t, t)
    assert t % bt == 0, "activation rows must be bucketed to a multiple of bt"
    bn = block_n
    while n % bn:
        bn //= 2
    bk = min(block_k, k)
    while k % bk or bk % GROUP:
        bk //= 2
    n_k = k // bk
    gpt = bk // GROUP  # quant groups per K tile

    grid = (t // bt, n // bn, n_k)
    wk_rows = bk // 2 if int4 else bk

    out = pl.pallas_call(
        functools.partial(_qmm_kernel, n_k=n_k, int4=int4),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((wk_rows, bn), lambda i, j, kk: (kk, j)),
            # scales as [n_k, gpt, N]: a 2-D (gpt, bn) block would slice the
            # f32 sublane dim below its (8, 128) tile
            pl.BlockSpec((1, gpt, bn), lambda i, j, kk: (kk, 0, j)),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w_q, scales.reshape(n_k, gpt, n))
    return out


# ---------------------------------------------------------------------------
# W8A8: int8 x int8 -> int32 MXU matmul (v5e runs int8 at 2x the bf16 rate;
# there is no fp8 MXU on v5e, so int8 is the TPU-native "8-bit linear").
# Weights: per-output-channel symmetric scales.  Activations: dynamic
# per-token symmetric scales, quantized on the fly (XLA fuses the quant pass
# into the preceding norm).  out = (x_q @ w_q) * sx[:, None] * sw[None, :].
# ---------------------------------------------------------------------------


def _qmm_a8_kernel(x_ref, w_ref, sx_ref, sw_ref, out_ref, acc_ref, *, n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += lax.dot_general(
        x_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == n_k - 1)
    def _():
        scaled = acc_ref[...].astype(jnp.float32) * sx_ref[...] * sw_ref[...]
        out_ref[...] = scaled.astype(out_ref.dtype)


def quant_matmul_a8_pallas(
    x_q: jnp.ndarray,     # [T, K] int8 activations
    sx: jnp.ndarray,      # [T, 1] float32 per-token scales
    w_q: jnp.ndarray,     # [K, N] int8
    sw: jnp.ndarray,      # [1, N] float32 per-channel scales
    *,
    out_dtype=jnp.bfloat16,
    block_t: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    t, k = x_q.shape
    n = w_q.shape[1]
    bt = min(block_t, t)
    assert t % bt == 0, "activation rows must be bucketed to a multiple of bt"
    bn = block_n
    while n % bn:
        bn //= 2
    bk = block_k
    while k % bk:
        bk //= 2
    n_k = k // bk

    return pl.pallas_call(
        functools.partial(_qmm_a8_kernel, n_k=n_k),
        grid=(t // bt, n // bn, n_k),
        in_specs=[
            pl.BlockSpec((bt, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bt, 1), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((t, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bt, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x_q, w_q, sx, sw)


def quantize_activations(x: jnp.ndarray):
    """Dynamic per-token symmetric int8 quantization: (x_q [T,K], sx [T,1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127)
    return x_q.astype(jnp.int8), sx


def quantize_weight_a8(w, group_unused=None):
    """Per-output-channel symmetric int8 of [..., K, N] (numpy).

    Returns (w_q int8 [..., K, N], sw f32 [..., 1, N]).
    """
    import numpy as np

    w = np.asarray(w, dtype=np.float32)
    amax = np.abs(w).max(axis=-2, keepdims=True)        # [..., 1, N]
    sw = np.maximum(amax, 1e-8) / 127.0
    q = np.rint(w / sw).clip(-127, 127).astype(np.int8)
    return q, sw.astype(np.float32)


# ---------------------------------------------------------------------------
# Host-side quantization + jnp reference path
# ---------------------------------------------------------------------------

def quantize_weight(w, *, int4: bool = False, group: int = GROUP):
    """Symmetric group quantization of [..., K, N] along K (numpy).

    Returns (w_q int8 [..., K or K//2, N], scales f32 [..., K//group, N]).
    """
    import numpy as np

    w = np.asarray(w, dtype=np.float32)
    *lead, k, n = w.shape
    assert k % group == 0, (k, group)
    grouped = w.reshape(*lead, k // group, group, n)
    qmax = 7.0 if int4 else 127.0
    scales = np.abs(grouped).max(axis=-2) / qmax          # [..., K/g, N]
    scales = np.maximum(scales, 1e-8)
    q = np.rint(grouped / scales[..., None, :]).clip(-qmax, qmax)
    q = q.reshape(*lead, k, n).astype(np.int8)
    if int4:
        low = q[..., 0::2, :] & 0x0F
        high = (q[..., 1::2, :] & 0x0F) << 4
        q = (low | high).astype(np.int8)                  # [..., K//2, N]
    return q, scales.astype(np.float32)


def dequant_weight(w_q: jnp.ndarray, scales: jnp.ndarray, *, int4: bool = False,
                   group: int = GROUP, dtype=jnp.bfloat16) -> jnp.ndarray:
    """jnp reference dequantization (CPU/test path; materializes the weight)."""
    if int4:
        low = jnp.right_shift(jnp.left_shift(w_q, 4), 4)
        high = jnp.right_shift(w_q, 4)
        k2, n = w_q.shape[-2:]
        w = jnp.stack([low, high], axis=-2).reshape(*w_q.shape[:-2], 2 * k2, n)
    else:
        w = w_q
    k, n = w.shape[-2:]
    wf = w.astype(jnp.float32).reshape(*w.shape[:-2], k // group, group, n)
    wf = wf * scales[..., None, :]
    return wf.reshape(*w.shape).astype(dtype)


def quant_linear(x: jnp.ndarray, w, *, impl: str = "ref") -> jnp.ndarray:
    """Linear layer dispatch: plain array or quantized {"w", "s"} dict.

    Scheme detection from shapes alone (the param pytree carries no static
    tags): W8A8 stores per-channel scales with one fewer dim than the weight
    ([N] vs the group-quant [K//GROUP, N]); int4 is detected from the shape
    relation (packed int4 stores K//2 rows while scales always describe
    K//GROUP groups).
    """
    if not isinstance(w, dict):
        return x @ w
    if w["s"].ndim == w["w"].ndim - 1:                  # W8A8 per-channel
        x_q, sx = quantize_activations(x)
        sw = w["s"][None, :]
        if impl == "pallas":
            return quant_matmul_a8_pallas(x_q, sx, w["w"], sw, out_dtype=x.dtype)
        prod = lax.dot_general(
            x_q.astype(jnp.int32), w["w"].astype(jnp.int32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (prod.astype(jnp.float32) * sx * sw).astype(x.dtype)
    int4 = w["w"].shape[-2] != w["s"].shape[-2] * GROUP
    if impl == "pallas":
        return quant_matmul_pallas(x, w["w"], w["s"], int4=int4)
    return x @ dequant_weight(w["w"], w["s"], int4=int4, dtype=x.dtype)
