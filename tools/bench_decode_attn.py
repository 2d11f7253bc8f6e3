"""Microbench for the decode-mode ragged paged attention kernel.

Reproduces the production decode call shape (Qwen3-0.6B geometry, W=16 burst,
KV8) in isolation so kernel variants can be A/B'd in seconds instead of via
the full bench.py trace.  Reports per-layer-call time and the implied
all-layers per-decode-step cost next to the HBM speed-of-light.

Usage: python tools/bench_decode_attn.py [--lanes 256] [--ctx 1024] [--iters 50]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=256)
    ap.add_argument("--live", type=int, default=128, help="lanes actually decoding")
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=4,
                    help="cache layers to cycle through (cost is per-layer "
                         "uniform; 28-layer step cost = 28 * us/layer)")
    ap.add_argument("--page", type=int, default=256)
    ap.add_argument("--kvh", type=int, default=8)
    ap.add_argument("--group", type=int, default=2)
    ap.add_argument("--hd", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bf16-kv", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nanovllm_tpu.ops.ragged_paged_attention import ragged_paged_attention_pallas

    nh = args.kvh * args.group
    pps = args.ctx // args.page
    num_pages = args.live * pps + 1
    rng = np.random.default_rng(0)

    q = jnp.asarray(rng.normal(size=(args.lanes, nh, args.hd)), jnp.bfloat16)
    # generate the (multi-GB) cache ON DEVICE — materializing it on the host
    # and shipping it through the axon tunnel takes minutes.  Split-plane
    # layout: [2 * L * pages, page, kvh, hd], K at plane 2*gp, V at 2*gp+1.
    key = jax.random.key(0)
    shape = (2 * args.layers * num_pages, args.page, args.kvh * args.hd)
    if args.bf16_kv:
        kv_pages = jax.jit(
            lambda k: jax.random.normal(k, shape, jnp.bfloat16)
        )(key)
    else:
        kv_pages = jax.jit(
            lambda k: {
                "data": jax.random.randint(k, shape, -127, 127, jnp.int8),
                "scale": jax.random.uniform(
                    k, (args.layers * num_pages, 2 * args.kvh, args.page),
                    jnp.float32, 0.01, 0.02,
                ),
            }
        )(key)

    # live lanes get full ctx; the rest are inert (position < 0, kv_len 0)
    kv_lens = np.zeros(args.lanes, np.int32)
    kv_lens[: args.live] = args.ctx
    positions = np.full(args.lanes, -(1 << 20), np.int32)
    positions[: args.live] = args.ctx - 1
    page_indices = np.zeros((args.lanes, pps), np.int32)
    perm = rng.permutation(args.live * pps)  # scattered pages, like production
    page_indices[: args.live] = 1 + perm.reshape(args.live, pps)
    tile_seq = np.arange(args.lanes, dtype=np.int32)

    kv_lens = jnp.asarray(kv_lens)
    positions = jnp.asarray(positions)
    page_indices = jnp.asarray(page_indices)
    tile_seq = jnp.asarray(tile_seq)

    @jax.jit
    def step(q, kv_pages):
        # scan over layers = ONE kernel compilation, like the model's
        # stacked-weights lax.scan (models/qwen3.py)
        def body(out, layer):
            out = ragged_paged_attention_pallas(
                out, kv_pages, layer, num_pages, kv_lens,
                page_indices, tile_seq, positions,
                sm_scale=args.hd ** -0.5, q_tile=1,
            )
            return out, None

        out, _ = jax.lax.scan(body, q, jnp.arange(args.layers, dtype=jnp.int32))
        return out

    out = step(q, kv_pages)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = step(q, kv_pages)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / args.iters

    kv_bytes = (
        args.live * args.ctx * 2 * args.kvh * args.hd
        * (2 if args.bf16_kv else 1) * args.layers
    )
    scale_bytes = 0 if args.bf16_kv else args.live * args.ctx * 2 * args.kvh * 4 * args.layers
    sol = (kv_bytes + scale_bytes) / 590e9
    print(
        f"decode attn x{args.layers} layers: {dt * 1e3:.2f} ms/step "
        f"({dt / args.layers * 1e6:.1f} us/layer), "
        f"KV read {(kv_bytes + scale_bytes) / 1e6:.0f} MB, "
        f"speed-of-light {sol * 1e3:.2f} ms ({dt / sol:.2f}x)"
    )


if __name__ == "__main__":
    main()
