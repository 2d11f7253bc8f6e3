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
import os as _os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128

# int4 scheme knobs (Config fields int4_group / int4_mse; the NVT_* env
# vars stay the highest-precedence A/B override so tools/quality_proxy.py
# works without config plumbing — QUALITY.md records the measurements):
#   int4_group / NVT_INT4_GROUP: quant group along K for W4A16 (64 halves
#     the dynamic-range damage of a 4-bit absmax grid at 2x scale storage)
#   int4_mse / NVT_INT4_MSE: per-group clip-scan scale selection (argmin
#     round-trip MSE over scale multipliers) instead of plain absmax.
#     Defaults ON: it costs nothing at serving time (same bytes, same
#     layout — only the host-side quantization pays an ~8-pass scan) and
#     cuts the 4B KL proxy 0.470 -> 0.406 nats (QUALITY.md round 4).
#     Group 64 stays opt-in: its further cut to 0.384 costs +6% weight-
#     stream bytes per decode step (scales double).


def int4_scheme(config=None) -> tuple[int, bool]:
    """(group, mse) for W4A16: env > Config field > default (128, True)."""
    g = _os.environ.get("NVT_INT4_GROUP")
    if g is not None:
        group = int(g)
    else:
        group = getattr(config, "int4_group", None) if config else None
        group = int(group) if group else 128
    m = _os.environ.get("NVT_INT4_MSE")
    if m is not None:
        mse = m == "1"
    else:
        mse = getattr(config, "int4_mse", None) if config else None
        mse = True if mse is None else bool(mse)
    return group, mse


def weight_group(int4: bool, config=None) -> int:
    """Effective quant-group width along K for the weight-only schemes."""
    return int4_scheme(config)[0] if int4 else GROUP


def _qmm_kernel(*refs, n_k, int4: bool, stacked: bool, native4: bool = False):
    # One grid step covers BK = groups_per_tile * GROUP contraction rows.
    # The weight tile is dequantized on the VPU (int8 -> f32 * scale -> bf16,
    # a fraction of the tile's MXU time) and fed to ONE wide dot — a
    # scale-after-dot design pins BK to GROUP (128) and pays 4-8x the grid
    # steps, which dominated prefill.
    #
    # ``stacked``: the weight/scale inputs carry a leading layer axis indexed
    # by a scalar-prefetched layer id (the BlockSpec index_map picks the
    # plane).  Slicing the layer OUT of the stack in XLA instead would
    # materialize a full HBM copy of every weight on every use — measured
    # 0.73 ms per decode iteration at the flagship geometry.
    if stacked:
        _, x_ref, w_ref, s_ref, out_ref, acc_ref = refs
    else:
        x_ref, w_ref, s_ref, out_ref, acc_ref = refs
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w_raw = w_ref[0] if stacked else w_ref[...]
    if int4 and native4:
        # Reinterpret the packed int8 [BK//2, BN] tile as int4 [BK, BN] in
        # place: TPU sub-byte sublane packing maps packed row i's low nibble
        # to int4 row 2i and its high nibble to 2i+1 — exactly the
        # quantize_weight layout, so the bitcast is free (no shifts, no
        # int32 temporaries; measured 3x the int32-shift unpack at the 4B
        # geometry, tools/bench_int4_unpack.py).  Mosaic-only; interpret
        # mode (CPU tests) takes the shift path below.
        w = pltpu.bitcast(w_raw, jnp.int4)        # [BK, BN] int4
    elif int4:
        # unpack two nibbles per byte: low nibble = even k, high = odd k.
        # Shift in int32 — Mosaic cannot legalize arith.shli on int8 vectors.
        packed = w_raw.astype(jnp.int32)          # [BK//2, BN]
        low = jnp.right_shift(jnp.left_shift(packed, 28), 28)  # sign-extend
        high = jnp.right_shift(jnp.left_shift(packed, 24), 28)
        bk2, bn = packed.shape
        w = jnp.stack([low, high], axis=1).reshape(2 * bk2, bn)
    else:
        w = w_raw                                 # [BK, BN] int8
    bk, bn = w.shape
    s = s_ref[0, 0] if stacked else s_ref[0]      # [gpt, BN]
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
    w_q: jnp.ndarray,     # [K, N] int8 / [K//2, N] (packed int4); +[L, ...]
                          # leading layer axis when ``layer`` is given
    scales: jnp.ndarray,  # [K//GROUP, N] float32 (+[L, ...] when stacked)
    *,
    int4: bool = False,
    group: int = GROUP,   # quant-group width along K (scales rows = K/group)
    layer=None,           # scalar int32 plane index into stacked weights
    # NOTE: the grid is row-major with the T axis outermost, so every T tile
    # past the first re-streams the weights from HBM.  That is fine: at large
    # T the matmul is MXU-bound and the refetch hides (measured 1.14x the MXU
    # floor at T=2048), and a full-T tile does not fit the 16 MB scoped-VMEM
    # budget (bt=2048 OOMs at compile).
    block_t: int = 256,
    # (1024, 1024) measured 27% faster than (512, 512) at decode shapes on
    # v5e (tools/bench_qmm.py, RTT-cancelled): fewer grid steps, same VPU
    # dequant cost; bf16-dequant and scale-after-dot variants measured SLOWER
    block_n: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
    # force the legacy int32-shift unpack even on TPU — lets the TPU-gated
    # bit-exactness test (tests/test_int4_tpu.py) compare the bitcast path
    # against the shift path on real hardware, where the bitcast's sublane
    # nibble-ordering contract actually executes
    force_shift: bool = False,
) -> jnp.ndarray:
    stacked = layer is not None
    t, k = x.shape
    n = w_q.shape[-1]
    k_w = w_q.shape[-2] * (2 if int4 else 1)
    assert k_w == k and k % group == 0, (k, k_w, group)
    # pltpu.bitcast (sub-byte reinterpret) has no interpret-mode lowering;
    # CPU tests take the int32-shift unpack with its halved tiles
    native4 = int4 and not interpret and not force_shift
    if int4 and not native4:
        # the nibble unpack runs in int32 (int8 shifts do not legalize in
        # Mosaic), 4x the tile bytes — halve the tile to stay inside the
        # 16 MB scoped-VMEM budget
        block_n = min(block_n, 512)
        block_k = min(block_k, 512)
    bt = min(block_t, t)
    assert t % bt == 0, "activation rows must be bucketed to a multiple of bt"
    bn = block_n
    while n % bn:
        bn //= 2
    bk = min(block_k, k)
    while k % bk or bk % group:
        bk //= 2
    n_k = k // bk
    gpt = bk // group  # quant groups per K tile

    grid = (t // bt, n // bn, n_k)
    wk_rows = bk // 2 if int4 else bk

    kernel = functools.partial(
        _qmm_kernel, n_k=n_k, int4=int4, stacked=stacked, native4=native4)
    out_shape = jax.ShapeDtypeStruct((t, n), x.dtype)
    scratch = [pltpu.VMEM((bt, bn), jnp.float32)]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    if stacked:
        num_layers = w_q.shape[0]
        layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bt, bk), lambda i, j, kk, l: (i, kk)),
                pl.BlockSpec((1, wk_rows, bn), lambda i, j, kk, l: (l[0], kk, j)),
                pl.BlockSpec((1, 1, gpt, bn), lambda i, j, kk, l: (l[0], kk, 0, j)),
            ],
            out_specs=pl.BlockSpec((bt, bn), lambda i, j, kk, l: (i, j)),
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=params, interpret=interpret,
        )(layer_arr, x, w_q, scales.reshape(num_layers, n_k, gpt, n))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((wk_rows, bn), lambda i, j, kk: (kk, j)),
            # scales as [n_k, gpt, N]: a 2-D (gpt, bn) block would slice the
            # f32 sublane dim below its (8, 128) tile
            pl.BlockSpec((1, gpt, bn), lambda i, j, kk: (kk, 0, j)),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda i, j, kk: (i, j)),
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=params,
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


def _qmm_a8_kernel(*refs, n_k, stacked: bool):
    if stacked:
        _, x_ref, w_ref, sx_ref, sw_ref, out_ref, acc_ref = refs
    else:
        x_ref, w_ref, sx_ref, sw_ref, out_ref, acc_ref = refs
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += lax.dot_general(
        x_ref[...], w_ref[0] if stacked else w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == n_k - 1)
    def _():
        sw = sw_ref[0] if stacked else sw_ref[...]
        scaled = acc_ref[...].astype(jnp.float32) * sx_ref[...] * sw
        out_ref[...] = scaled.astype(out_ref.dtype)


def quant_matmul_a8_pallas(
    x_q: jnp.ndarray,     # [T, K] int8 activations
    sx: jnp.ndarray,      # [T, 1] float32 per-token scales
    w_q: jnp.ndarray,     # [K, N] int8 (+[L, ...] when ``layer`` is given)
    sw: jnp.ndarray,      # [1, N] float32 per-channel scales (+[L, ...])
    *,
    layer=None,           # scalar int32 plane index into stacked weights
    out_dtype=jnp.bfloat16,
    block_t: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    stacked = layer is not None
    t, k = x_q.shape
    n = w_q.shape[-1]
    bt = min(block_t, t)
    assert t % bt == 0, "activation rows must be bucketed to a multiple of bt"
    bn = block_n
    while n % bn:
        bn //= 2
    bk = block_k
    while k % bk:
        bk //= 2
    n_k = k // bk

    kernel = functools.partial(_qmm_a8_kernel, n_k=n_k, stacked=stacked)
    out_shape = jax.ShapeDtypeStruct((t, n), out_dtype)
    scratch = [pltpu.VMEM((bt, bn), jnp.int32)]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    if stacked:
        layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t // bt, n // bn, n_k),
            in_specs=[
                pl.BlockSpec((bt, bk), lambda i, j, kk, l: (i, kk)),
                pl.BlockSpec((1, bk, bn), lambda i, j, kk, l: (l[0], kk, j)),
                pl.BlockSpec((bt, 1), lambda i, j, kk, l: (i, 0)),
                pl.BlockSpec((1, 1, bn), lambda i, j, kk, l: (l[0], 0, j)),
            ],
            out_specs=pl.BlockSpec((bt, bn), lambda i, j, kk, l: (i, j)),
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=params, interpret=interpret,
        )(layer_arr, x_q, w_q, sx, sw)

    return pl.pallas_call(
        kernel,
        grid=(t // bt, n // bn, n_k),
        in_specs=[
            pl.BlockSpec((bt, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bt, 1), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bt, bn), lambda i, j, kk: (i, j)),
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=params,
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

    try:  # torch's threaded elementwise math is ~3x numpy on this host
        import torch

        t = torch.from_numpy(np.ascontiguousarray(w, dtype=np.float32))
        sw = (t.abs().amax(dim=-2, keepdim=True).clamp_min(1e-8) / 127.0)
        q = torch.round(t / sw).clamp(-127, 127).to(torch.int8)
        return q.numpy(), sw.numpy()
    except ImportError:  # pragma: no cover
        w = np.asarray(w, dtype=np.float32)
        amax = np.abs(w).max(axis=-2, keepdims=True)    # [..., 1, N]
        sw = np.maximum(amax, 1e-8) / 127.0
        q = np.rint(w / sw).clip(-127, 127).astype(np.int8)
        return q, sw.astype(np.float32)


# ---------------------------------------------------------------------------
# Host-side quantization + jnp reference path
# ---------------------------------------------------------------------------

def quantize_weight(w, *, int4: bool = False, group: int | None = None,
                    mse: bool | None = None):
    """Symmetric group quantization of [..., K, N] along K (numpy).

    Returns (w_q int8 [..., K or K//2, N], scales f32 [..., K//group, N]).
    ``group`` defaults to ``weight_group(int4)`` (env-tunable for int4);
    ``mse`` (int4 default: NVT_INT4_MSE) replaces the absmax scale with a
    per-group clip scan minimizing round-trip squared error — absmax wastes
    the 15-level int4 grid on the group's single largest element.
    """
    import numpy as np

    if group is None:
        group = weight_group(int4)
    if mse is None:
        mse = int4_scheme()[1] and int4
    *lead, k, n = w.shape
    assert k % group == 0, (k, group)
    qmax = 7.0 if int4 else 127.0
    try:  # torch's threaded elementwise math is ~3x numpy on this host
        import torch

        t = torch.from_numpy(np.ascontiguousarray(w, dtype=np.float32))
        grouped = t.reshape(*lead, k // group, group, n)
        scales = (grouped.abs().amax(dim=-2) / qmax).clamp_min(1e-8)
        if mse:
            best_s, best_e = scales, None
            for c in (1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7, 0.65):
                s = scales * c
                qq = torch.round(grouped / s.unsqueeze(-2)).clamp(-qmax, qmax)
                e = ((qq * s.unsqueeze(-2) - grouped) ** 2).sum(dim=-2)
                if best_e is None:
                    best_e, best_s = e, s
                else:
                    pick = e < best_e
                    best_e = torch.minimum(best_e, e)
                    best_s = torch.where(pick, s, best_s)
            scales = best_s.clamp_min(1e-8)
        q = (
            torch.round(grouped / scales.unsqueeze(-2))
            .clamp(-qmax, qmax)
            .to(torch.int8)
            .reshape(*lead, k, n)
            .numpy()
        )
        scales = scales.numpy()
    except ImportError:  # pragma: no cover - torch is baked into this image
        wf = np.asarray(w, dtype=np.float32)
        grouped = wf.reshape(*lead, k // group, group, n)
        scales = np.abs(grouped).max(axis=-2) / qmax      # [..., K/g, N]
        scales = np.maximum(scales, 1e-8)
        if mse:
            best_s, best_e = scales, None
            for c in (1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7, 0.65):
                s = scales * c
                qq = np.rint(grouped / s[..., None, :]).clip(-qmax, qmax)
                e = ((qq * s[..., None, :] - grouped) ** 2).sum(axis=-2)
                if best_e is None:
                    best_e, best_s = e, s
                else:
                    pick = e < best_e
                    best_e = np.minimum(best_e, e)
                    best_s = np.where(pick, s, best_s)
            scales = np.maximum(best_s, 1e-8)
        q = np.rint(grouped / scales[..., None, :]).clip(-qmax, qmax)
        q = q.reshape(*lead, k, n).astype(np.int8)
        scales = scales.astype(np.float32)
    if int4:
        low = q[..., 0::2, :] & 0x0F
        high = (q[..., 1::2, :] & 0x0F) << 4
        q = (low | high).astype(np.int8)                  # [..., K//2, N]
    return q, scales


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


def quant_linear(x: jnp.ndarray, w, *, impl: str = "ref", layer=None) -> jnp.ndarray:
    """Linear layer dispatch: plain array or quantized {"w", "s"} dict.

    Scheme detection from shapes alone (the param pytree carries no static
    tags): W8A8 stores per-channel scales with one fewer dim than the weight
    ([N] vs the group-quant [K//GROUP, N]); int4 is detected from the shape
    relation (packed int4 stores K//2 rows while scales always describe
    K//GROUP groups).

    When ``w`` carries a leading layer axis (stacked for lax.scan), ``layer``
    selects the plane *inside* the pallas kernel via its BlockSpec index_map
    — slicing it out in XLA would copy the full weight through HBM on every
    use (2x the weight stream of a decode step).
    """
    if not isinstance(w, dict):
        if x.ndim == w.ndim - 1 and layer is not None:  # stacked bf16
            w = w[layer]
        return x @ w
    # interpret mode lets the production kernels run (slowly) on the CPU
    # backend — this is how the tp>1 simulated-mesh tests exercise them
    interpret = jax.default_backend() != "tpu"
    a8 = w["s"].ndim == w["w"].ndim - 1                 # W8A8 per-channel
    stacked = w["w"].ndim == 3
    if stacked and impl != "pallas":
        w = {"w": w["w"][layer], "s": w["s"][layer]}
        stacked = False
    if a8:
        x_q, sx = quantize_activations(x)
        if impl == "pallas":
            if stacked:
                num_layers, _, n = w["w"].shape
                return quant_matmul_a8_pallas(
                    x_q, sx, w["w"], w["s"].reshape(num_layers, 1, n),
                    layer=layer, out_dtype=x.dtype, interpret=interpret,
                )
            return quant_matmul_a8_pallas(
                x_q, sx, w["w"], w["s"][None, :], out_dtype=x.dtype,
                interpret=interpret,
            )
        prod = lax.dot_general(
            x_q.astype(jnp.int32), w["w"].astype(jnp.int32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (prod.astype(jnp.float32) * sx * w["s"][None, :]).astype(x.dtype)
    # weight-row / scale-row ratio identifies the scheme without static
    # tags: 128 = int8 g128; 64 = packed int4 g128; 32 = packed int4 g64
    r = w["w"].shape[-2] // w["s"].shape[-2]
    int4 = r < GROUP
    group = 2 * r if int4 else GROUP
    if impl == "pallas":
        return quant_matmul_pallas(
            x, w["w"], w["s"], int4=int4, group=group,
            layer=layer if stacked else None, interpret=interpret,
        )
    return x @ dequant_weight(w["w"], w["s"], int4=int4, group=group,
                              dtype=x.dtype)
