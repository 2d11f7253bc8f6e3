"""A/B the int4 nibble-unpack strategy inside the W4A16 qmm kernel.

History: W4A16 e2e was stuck at ~bf16 speed (4B: 803 vs 803 tok/s) although
it streams 1/4 the weight bytes, because the then-production unpack
sign-extended via int32 shifts (4x-size temporaries force half-size tiles,
shift chain is VPU-heavy).  Round 2 made the pltpu.bitcast unpack (v_bc) the
production path; the shift unpack survives behind force_shift=True (and as
the interpret-mode/CPU path).  Variants:

  v_i32   LEGACY shift unpack (int32 shifts, tiles 512) — runs the
          production kernel with force_shift=True
  v_n4    weight stored as a NATIVE jnp.int4 array ([K, N], 0.5 B/elem in
          HBM); Mosaic's sub-byte load does the unpack, kernel is the plain
          W8A16 body.  The int4 array is built on device inside the jit (the
          axon tunnel cannot device_put S4 from host, and cross-jit S4 args
          trigger a relayout device_put that recurses) — the once-per-call
          conversion cancels out of the two-iteration-count timing.
  v_bc    PRODUCTION: the standard K-packed int8 [K//2, N] weight,
          reinterpreted inside the kernel via pltpu.bitcast to int4 [K, N]:
          TPU sub-byte sublane packing maps packed row i's low nibble to
          int4 row 2i and high to 2i+1 — exactly the quantize_weight layout,
          so the bitcast is free and the weight crosses the jit boundary as
          plain int8 (no S4 relayout issue, unlike v_n4).
  w8 ref  W8A16 at the same shapes (the target to beat)

(The v_f32 float-arithmetic unpack variant kernel is kept in-file for
reference but no longer in the timed case list.)

Usage: python tools/bench_int4_unpack.py [--t 256] [--geom 4b]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=256)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--geom", default="4b", choices=["0.6b", "4b"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from nanovllm_tpu.ops.quant_matmul import (
        GROUP,
        quant_matmul_pallas,
        quantize_weight,
    )

    if args.geom == "4b":
        shapes = [(2560, 5120), (4096, 2560), (2560, 19456), (9728, 2560)]
        h0 = 2560
    else:
        shapes = [(1024, 4096), (2048, 1024), (1024, 6144), (3072, 1024)]
        h0 = 1024
    L = args.layers
    rng = np.random.default_rng(0)
    w4, w8 = [], []
    for k, n in shapes:
        w = rng.standard_normal((L, k, n), np.float32) * 0.02
        wq4, s4 = quantize_weight(w, int4=True)
        wq8, s8 = quantize_weight(w)
        w4.append((jnp.asarray(wq4), jnp.asarray(s4)))
        w8.append((jnp.asarray(wq8), jnp.asarray(s8)))
    x0 = jnp.asarray(rng.standard_normal((args.t, h0)) * 0.1, jnp.bfloat16)

    def _kern_f32(l_ref, x_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k):
        """int4 unpack with pure f32 arithmetic (no integer shifts)."""
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        packed = w_ref[0]                          # [BK//2, BN] int8
        bk2, bn = packed.shape
        bf = packed.astype(jnp.float32)
        high = jnp.floor(bf * (1.0 / 16.0))        # == arithmetic >> 4
        low_u = bf - high * 16.0                   # unsigned low nibble
        low = low_u - jnp.where(low_u >= 8.0, 16.0, 0.0)
        w = jnp.stack([low, high], axis=1).reshape(2 * bk2, bn)
        s = s_ref[0, 0]                            # [gpt, BN] f32
        g = (2 * bk2) // s.shape[0]
        wf = w.reshape(s.shape[0], g, bn) * s[:, None, :]
        acc_ref[...] += lax.dot_general(
            x_ref[...], wf.reshape(2 * bk2, bn).astype(x_ref.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(k == n_k - 1)
        def _():
            out_ref[...] = acc_ref[...].astype(out_ref.dtype)

    def variant_matmul(x, w_q, scales, layer, bn, bk):
        t, k = x.shape
        Lw, _, n = w_q.shape
        while n % bn:
            bn //= 2
        while k % bk or bk % GROUP:
            bk //= 2
        n_k = k // bk
        gpt = bk // GROUP
        bt = min(256, t)
        kernel = functools.partial(_kern_f32, n_k=n_k)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t // bt, n // bn, n_k),
            in_specs=[
                pl.BlockSpec((bt, bk), lambda i, j, kk, l: (i, kk)),
                pl.BlockSpec((1, bk // 2, bn), lambda i, j, kk, l: (l[0], kk, j)),
                pl.BlockSpec((1, 1, gpt, bn), lambda i, j, kk, l: (l[0], kk, 0, j)),
            ],
            out_specs=pl.BlockSpec((bt, bn), lambda i, j, kk, l: (i, j)),
            scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(jnp.asarray(layer, jnp.int32).reshape(1), x, w_q,
          scales.reshape(Lw, n_k, gpt, n))

    def _kern_n4(l_ref, x_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k):
        """weight ref is native int4; Mosaic's load does the unpack."""
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        w = w_ref[0]                               # [BK, BN] int4
        bk, bn = w.shape
        s = s_ref[0, 0]                            # [gpt, BN] f32
        g = bk // s.shape[0]
        wf = w.astype(jnp.float32).reshape(s.shape[0], g, bn) * s[:, None, :]
        acc_ref[...] += lax.dot_general(
            x_ref[...], wf.reshape(bk, bn).astype(x_ref.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(k == n_k - 1)
        def _():
            out_ref[...] = acc_ref[...].astype(out_ref.dtype)

    def native4_matmul(x, w_n4, scales, layer, bn, bk):
        t, k = x.shape
        Lw, _, n = w_n4.shape
        while n % bn:
            bn //= 2
        while k % bk or bk % GROUP:
            bk //= 2
        n_k = k // bk
        gpt = bk // GROUP
        bt = min(256, t)
        kernel = functools.partial(_kern_n4, n_k=n_k)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t // bt, n // bn, n_k),
            in_specs=[
                pl.BlockSpec((bt, bk), lambda i, j, kk, l: (i, kk)),
                pl.BlockSpec((1, bk, bn), lambda i, j, kk, l: (l[0], kk, j)),
                pl.BlockSpec((1, 1, gpt, bn), lambda i, j, kk, l: (l[0], kk, 0, j)),
            ],
            out_specs=pl.BlockSpec((bt, bn), lambda i, j, kk, l: (i, j)),
            scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(jnp.asarray(layer, jnp.int32).reshape(1), x, w_n4,
          scales.reshape(Lw, n_k, gpt, n))

    def _kern_bc(l_ref, x_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k):
        """weight tile int8 [bk//2, bn] (the existing K-axis nibble packing);
        pltpu.bitcast reinterprets it as int4 [bk, bn] IN PLACE: sub-byte
        sublane packing puts the low nibble of packed row i at int4 row 2i
        and the high nibble at 2i+1 — exactly the quantize_weight layout."""
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        wp = w_ref[0]                              # [bk//2, bn] int8
        w = pltpu.bitcast(wp, jnp.int4)            # [bk, bn] int4
        bk, bn = w.shape
        s = s_ref[0, 0]                            # [gpt, bn] f32
        g = bk // s.shape[0]
        wf = w.astype(jnp.float32).reshape(s.shape[0], g, bn) * s[:, None, :]
        acc_ref[...] += lax.dot_general(
            x_ref[...], wf.reshape(bk, bn).astype(x_ref.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(k == n_k - 1)
        def _():
            out_ref[...] = acc_ref[...].astype(out_ref.dtype)

    def bitcast_matmul(x, w_q, scales, layer, bn, bk):
        t, k = x.shape
        Lw, _, n = w_q.shape     # w_q is the standard K-packed [L, K//2, N]
        while n % bn:
            bn //= 2
        while k % bk or bk % GROUP:
            bk //= 2
        n_k = k // bk
        gpt = bk // GROUP
        bt = min(256, t)
        kernel = functools.partial(_kern_bc, n_k=n_k)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t // bt, n // bn, n_k),
            in_specs=[
                pl.BlockSpec((bt, bk), lambda i, j, kk, l: (i, kk)),
                pl.BlockSpec((1, bk // 2, bn), lambda i, j, kk, l: (l[0], kk, j)),
                pl.BlockSpec((1, 1, gpt, bn), lambda i, j, kk, l: (l[0], kk, 0, j)),
            ],
            out_specs=pl.BlockSpec((bt, bn), lambda i, j, kk, l: (i, j)),
            scratch_shapes=[pltpu.VMEM((bt, bn), jnp.float32)],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(jnp.asarray(layer, jnp.int32).reshape(1), x, w_q,
          scales.reshape(Lw, n_k, gpt, n))

    def _unpack_to_int4(packed):
        """[L, K//2, N] packed-nibble int8 -> [L, K, N] jnp.int4 on device."""
        low = jnp.right_shift(jnp.left_shift(packed.astype(jnp.int32), 28), 28)
        high = jnp.right_shift(jnp.left_shift(packed.astype(jnp.int32), 24), 28)
        Lw, k2, n = packed.shape
        w = jnp.stack([low, high], axis=2).reshape(Lw, 2 * k2, n)
        return w.astype(jnp.int4)

    def make(mode, bn, bk):
        weights = w8 if mode == "w8" else w4

        @jax.jit
        def run(x0, weights, steps):
            if mode == "n4":
                weights = [(_unpack_to_int4(wq), s) for wq, s in weights]

            def body(acc, layer):
                h = x0 + acc * 1e-9
                outs = []
                for (wq, s), (k, n) in zip(weights, shapes):
                    xin = (h if k == h0
                           else jnp.tile(h, (1, -(-k // h0)))[:, :k])
                    if mode == "w8":
                        outs.append(quant_matmul_pallas(
                            xin, wq, s, layer=layer))
                    elif mode == "i32":
                        outs.append(quant_matmul_pallas(
                            xin, wq, s, int4=True, layer=layer,
                            block_n=bn, block_k=bk, force_shift=True))
                    elif mode == "n4":
                        outs.append(native4_matmul(xin, wq, s, layer, bn, bk))
                    elif mode == "bc":
                        outs.append(bitcast_matmul(xin, wq, s, layer, bn, bk))
                    else:
                        outs.append(variant_matmul(xin, wq, s, layer, bn, bk))
                step = sum(jnp.sum(o).astype(jnp.float32) for o in outs)
                return acc + step, None
            return jax.lax.scan(body, jnp.float32(0), steps % L)[0]
        return lambda m: run(x0, weights, jnp.arange(L * m, dtype=jnp.int32))

    # correctness first, against the LEGACY shift unpack (an independent
    # nibble decode — the production kernel is itself the bitcast path now,
    # so comparing against it would be vacuous).  Assertion failures
    # propagate: a mismatch must exit non-zero, not print-and-continue.
    xt = jnp.asarray(rng.standard_normal((256, shapes[0][0])) * 0.1, jnp.bfloat16)
    ref = quant_matmul_pallas(
        xt, w4[0][0], w4[0][1], int4=True, layer=0, force_shift=True)
    got = variant_matmul(xt, w4[0][0], w4[0][1], 0, 512, 512)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    print(f"f32-unpack vs shift-unpack max abs diff: {err:.2e}")
    assert err < 1e-2, "unpack mismatch"
    got = bitcast_matmul(xt, w4[0][0], w4[0][1], 0, 1024, 1024)
    err = float(jnp.max(jnp.abs(
        ref.astype(jnp.float32) - got.astype(jnp.float32))))
    print(f"bitcast unpack vs shift-unpack max abs diff: {err:.2e}")
    assert err < 1e-2, "bitcast unpack mismatch"

    bytes_per_layer_w4 = sum(k * n // 2 + k // GROUP * n * 4 for k, n in shapes)
    cases = [
        ("w8 ref", "w8", 1024, 1024),
        ("v_i32 legacy", "i32", 512, 512),
        ("v_n4 native-int4", "n4", 1024, 1024),
        ("v_bc bitcast(prod)", "bc", 1024, 1024),
        ("v_bc bitcast(prod)", "bc", 2048, 2048),
    ]
    for name, mode, bn, bk in cases:
        try:
            fn = make(mode, bn, bk)
            jax.device_get(fn(args.iters)); jax.device_get(fn(2 * args.iters))
            t0 = time.perf_counter()
            jax.device_get(fn(args.iters))
            t1 = time.perf_counter()
            jax.device_get(fn(2 * args.iters))
            dt = ((time.perf_counter() - t1) - (t1 - t0)) / args.iters
            bw = L * bytes_per_layer_w4 / dt / 1e9
            print(f"{name:>18} bn={bn:5d} bk={bk:5d}: {dt * 1e3:7.3f} ms/iter "
                  f"({bw:6.0f} GB/s of int4 bytes)")
        except Exception as e:
            print(f"{name:>18} bn={bn:5d} bk={bk:5d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
