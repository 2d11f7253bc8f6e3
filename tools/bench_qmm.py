"""Microbench for the W8A16 quantized matmul at production decode shapes.

One decode iteration at the flagship geometry runs 4 quantized matmuls per
layer x 28 layers; measured 1.75 ms vs a ~1.0 ms weight-stream floor.
Hypothesis: per-grid-step overhead — (bn=512, bk=512) gives ~60 grid steps
per layer.  This tool scans a full layer's worth of matmuls per step and
A/Bs block sizes.

Usage: python tools/bench_qmm.py [--iters 30] [--t 256]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=256)
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--geom", default="0.6b", choices=["0.6b", "4b"])
    ap.add_argument("--a8", action="store_true",
                    help="W8A8 cases (diagnose the e2e w8a8 slowdown)")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from nanovllm_tpu.ops.quant_matmul import quant_matmul_pallas, quantize_weight

    # --- experimental kernel variants (dequant strategy A/B) ----------------

    def _kern_v2(l_ref, x_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k, gpt):
        """bf16 dequant: int8 -> bf16 convert, bf16 scale multiply."""
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        w = w_ref[0]
        bk, bn = w.shape
        s = s_ref[0, 0]
        g = bk // s.shape[0]
        wf = w.astype(jnp.bfloat16).reshape(s.shape[0], g, bn)
        wf = wf * s.astype(jnp.bfloat16)[:, None, :]
        acc_ref[...] += lax.dot_general(
            x_ref[...], wf.reshape(bk, bn),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(k == n_k - 1)
        def _():
            out_ref[...] = acc_ref[...].astype(out_ref.dtype)

    def _kern_v3(l_ref, x_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k, gpt):
        """scale-after-dot: int8 -> bf16 convert only; one dot per group,
        group scale applied to the [bt, bn] dot result in f32."""
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        x = x_ref[...]
        w = w_ref[0].astype(jnp.bfloat16)
        bk, bn = w.shape
        g = bk // gpt
        s = s_ref[0, 0]                                   # [gpt, bn] f32
        acc = acc_ref[...]
        for gi in range(gpt):
            d = lax.dot_general(
                x[:, gi * g:(gi + 1) * g], w[gi * g:(gi + 1) * g],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + d * s[gi][None, :]
        acc_ref[...] = acc

        @pl.when(k == n_k - 1)
        def _():
            out_ref[...] = acc_ref[...].astype(out_ref.dtype)

    def variant_matmul(kern_body, x, w_q, scales, layer, bn=512, bk=512):
        t, k = x.shape
        L, _, n = w_q.shape
        while n % bn:
            bn //= 2
        while k % bk or bk % 128:
            bk //= 2
        n_k = k // bk
        gpt = bk // 128
        kernel = functools.partial(kern_body, n_k=n_k, gpt=gpt)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t // min(256, t), n // bn, n_k),
            in_specs=[
                pl.BlockSpec((min(256, t), bk), lambda i, j, kk, l: (i, kk)),
                pl.BlockSpec((1, bk, bn), lambda i, j, kk, l: (l[0], kk, j)),
                pl.BlockSpec((1, 1, gpt, bn), lambda i, j, kk, l: (l[0], kk, 0, j)),
            ],
            out_specs=pl.BlockSpec((min(256, t), bn), lambda i, j, kk, l: (i, j)),
            scratch_shapes=[pltpu.VMEM((min(256, t), bn), jnp.float32)],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(jnp.asarray(layer, jnp.int32).reshape(1), x, w_q,
          scales.reshape(L, n_k, gpt, n))

    # Qwen3-0.6B decode shapes: qkv, o, gate_up, down (--geom 4b for Qwen3-4B)
    shapes = [(1024, 4096), (2048, 1024), (1024, 6144), (3072, 1024)]
    h0 = 1024
    if args.geom == "4b":
        shapes = [(2560, 5120), (4096, 2560), (2560, 19456), (9728, 2560)]
        h0 = 2560
    L = args.layers
    rng = np.random.default_rng(0)
    weights = []
    for k, n in shapes:
        wq, s = quantize_weight(rng.standard_normal((L, k, n), np.float32) * 0.02)
        weights.append((jnp.asarray(wq), jnp.asarray(s)))
    x0 = jnp.asarray(rng.standard_normal((args.t, h0)) * 0.1, jnp.bfloat16)

    from nanovllm_tpu.ops.quant_matmul import (
        quant_matmul_a8_pallas,
        quantize_activations,
        quantize_weight_a8,
    )

    weights_a8 = []
    for k, n in shapes:
        wq, sw = quantize_weight_a8(
            rng.standard_normal((L, k, n), np.float32) * 0.02
        )
        weights_a8.append((jnp.asarray(wq), jnp.asarray(sw)))  # sw [L,1,N]

    def make(bn, bk, variant=None, a8=None):
        @jax.jit
        def run(x0, weights, steps):
            def body(acc, layer):
                h = x0 + acc * 1e-9
                outs = []
                for (wq, s), (k, n) in zip(weights, shapes):
                    xin = (h if k == h0
                           else jnp.tile(h, (1, -(-k // h0)))[:, :k])
                    if a8 is not None:
                        if a8 == "dyn":          # production path: per-token
                            x_q, sx = quantize_activations(xin)
                        else:                     # pre-quantized (isolates MXU)
                            x_q = xin.astype(jnp.int8)
                            sx = jnp.ones((xin.shape[0], 1), jnp.float32)
                        outs.append(quant_matmul_a8_pallas(
                            x_q, sx, wq, s, layer=layer,
                            block_n=bn, block_k=bk))
                    elif variant is None:
                        outs.append(quant_matmul_pallas(
                            xin, wq, s, layer=layer, block_n=bn, block_k=bk))
                    else:
                        outs.append(variant_matmul(
                            variant, xin, wq, s, layer, bn=bn, bk=bk))
                step = sum(jnp.sum(o).astype(jnp.float32) for o in outs)
                return acc + step, None
            return jax.lax.scan(body, jnp.float32(0), steps % L)[0]
        w = weights_a8 if a8 is not None else weights
        return lambda n: run(x0, w, jnp.arange(L * n, dtype=jnp.int32))

    bytes_per_layer = sum(k * n + k // 128 * n * 4 for k, n in shapes)
    print(f"weight bytes/layer: {bytes_per_layer / 1e6:.1f} MB; "
          f"{L} layers -> {L * bytes_per_layer / 1e9:.2f} GB per iteration")
    if args.a8:
        cases = [
            ("w8a16 control", 1024, 1024, None, None),
            ("a8 dyn act-quant", 512, 512, None, "dyn"),
            ("a8 pre-quant x", 512, 512, None, "pre"),
            ("a8 dyn act-quant", 1024, 1024, None, "dyn"),
            ("a8 pre-quant x", 1024, 1024, None, "pre"),
        ]
    else:
        cases = [
            ("v1 f32-dequant", 512, 512, None, None),
            ("v1 f32-dequant", 1024, 1024, None, None),
            ("v2 bf16-dequant", 1024, 1024, _kern_v2, None),
            ("v3 scale-after-dot", 1024, 1024, _kern_v3, None),
            ("v3 scale-after-dot", 1024, 512, _kern_v3, None),
        ]
    for name, bn, bk, variant, a8 in cases:
        fn = make(bn, bk, variant, a8)
        # the tunnel costs ~23 ms per dispatch: difference two iteration
        # counts to cancel the round trip (and any other per-call constant)
        jax.device_get(fn(args.iters)); jax.device_get(fn(2 * args.iters))
        t0 = time.perf_counter()
        jax.device_get(fn(args.iters))
        t1 = time.perf_counter()
        jax.device_get(fn(2 * args.iters))
        dt = ((time.perf_counter() - t1) - (t1 - t0)) / args.iters
        bw = L * bytes_per_layer / dt / 1e9
        steps = sum(
            (args.t + 255) // 256 * (n // min(bn, n)) * (k // min(bk, k))
            for k, n in shapes)
        print(f"{name:>18} bn={bn:5d} bk={bk:5d}: {dt * 1e3:7.3f} ms/iter  "
              f"({bw:6.0f} GB/s, ~{steps} grid steps/layer)")



def probe():
    """Isolate DMA vs launch overhead: read-only kernels over the weight
    stack (no MXU), stacked vs pre-sliced 2-D layouts."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    L, K, N = 28, 1024, 4096
    w3 = jnp.asarray(rng.integers(-127, 127, (L, K, N)), jnp.int8)
    w2 = w3[5]

    def body3(l_ref, w_ref, out_ref, *, n_k):
        k = pl.program_id(1)
        @pl.when(k == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
        out_ref[...] += w_ref[0, :8, :].astype(jnp.float32)

    def body2(w_ref, out_ref, *, n_k):
        k = pl.program_id(1)
        @pl.when(k == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
        out_ref[...] += w_ref[:8, :].astype(jnp.float32)

    bn, bk = 1024, 1024
    n_k = K // bk

    def run3(layer):
        return pl.pallas_call(
            functools.partial(body3, n_k=n_k),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(N // bn, n_k),
                in_specs=[pl.BlockSpec((1, bk, bn), lambda j, kk, l: (l[0], kk, j))],
                out_specs=pl.BlockSpec((8, bn), lambda j, kk, l: (0, j)),
            ),
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        )(jnp.asarray(layer, jnp.int32).reshape(1), w3)

    def run2(w):
        return pl.pallas_call(
            functools.partial(body2, n_k=n_k),
            grid=(N // bn, n_k),
            in_specs=[pl.BlockSpec((bk, bn), lambda j, kk: (kk, j))],
            out_specs=pl.BlockSpec((8, bn), lambda j, kk: (0, j)),
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        )(w)

    iters = 100
    for name, fn in [
        ("stacked 3-D read", lambda: jax.lax.scan(
            lambda c, l: (c + run3(l).sum(), None),
            jnp.float32(0), jnp.arange(iters, dtype=jnp.int32) % L)[0]),
        ("plain 2-D read", lambda: jax.lax.scan(
            lambda c, l: (c + run2(w2 + c.astype(jnp.int8) * 0).sum(), None),
            jnp.float32(0), jnp.arange(iters, dtype=jnp.int32))[0]),
    ]:
        g = jax.jit(fn)
        jax.device_get(g())
        t0 = time.perf_counter()
        jax.device_get(g())
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e6:8.1f} us/call  ({K * N / dt / 1e9:6.0f} GB/s)")


if __name__ == "__main__" and "--probe" in sys.argv:
    sys.argv.remove("--probe")
    probe()
    sys.exit(0)

if __name__ == "__main__":
    main()
