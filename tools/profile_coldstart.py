"""Cold-start decomposition: where do the init seconds go?

VERDICT round-1 item 8: init warmup cost 190s (at 0.6B; 176-582s at 4B/14B)
per process even with a warm persistent compile cache.  This tool splits the
cold start into phases, and for every warmup layout separates:

  trace    jax trace+lower time (host Python)
  compile  XLA+Mosaic compile (remote through the tunnel; persistent-cache
           -served on later runs)
  load+run first jit execution (executable deserialization + device program
           load + one execution)
  run      steady-state execution

Usage: python tools/profile_coldstart.py [--geom 0.6b] [--quant int8]
       [--kv int8] [--cold]   (--cold wipes the persistent cache first)
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", default="0.6b")
    ap.add_argument("--quant", default="int8")
    ap.add_argument("--kv", default="int8")
    ap.add_argument("--budget", type=int, default=8192)
    ap.add_argument("--cold", action="store_true",
                    help="wipe the persistent compile cache first")
    args = ap.parse_args()

    cache = "/root/repo/.jax_cache"
    if args.cold and os.path.isdir(cache):
        shutil.rmtree(cache)
    os.makedirs(cache, exist_ok=True)

    t00 = time.perf_counter()
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import GEOMETRIES
    from __graft_entry__ import QWEN3_0_6B, _hf_cfg
    from nanovllm_tpu import LLM

    t_import = time.perf_counter() - t00

    geom = _hf_cfg(**GEOMETRIES.get(args.geom, QWEN3_0_6B))
    t0 = time.perf_counter()
    llm = LLM(
        hf_config=geom,
        random_weights="fast",
        dtype="bfloat16",
        quantization=args.quant,
        kv_cache_dtype=args.kv,
        max_model_len=4096,
        max_num_batched_tokens=args.budget,
        max_num_seqs=256,
        warmup_buckets=False,
    )
    t_ctor = time.perf_counter() - t0
    runner = llm.model_runner

    # replicate warmup_buckets' layout ladder, phase-timed
    from nanovllm_tpu.constants import PREFILL_TILE, bucket, round_up
    from nanovllm_tpu.engine.batch import (
        PackedBatch,
        lane_ladder,
        prepare_step_batch,
        seq_pad,
    )

    bs = runner.config.kvcache_block_size
    s_cap = runner.config.max_num_seqs
    s_pads = lane_ladder(s_cap)
    t_max = bucket(max(runner.config.max_num_batched_tokens, PREFILL_TILE))
    layouts = []
    for s in s_pads:
        layouts.append((s, s, s, s, runner._p_pad))
        ps = round_up(s, PREFILL_TILE)
        t = bucket(ps + PREFILL_TILE)
        while t <= t_max:
            layouts.append((s, ps, t, s, runner._p_pad))
            t *= 2

    tot = {"trace": 0.0, "compile": 0.0, "loadrun": 0.0, "run": 0.0}
    print(f"{'layout':>26} {'trace':>7} {'compile':>8} {'load+run':>9} {'run':>7}")
    for layout in layouts:
        seqs = runner._warmup_seqs(layout)
        batches = [prepare_step_batch(seqs, bs, layout)[0]] * runner.dp
        segments = layout[:3]
        packed = runner._put_batch(runner._stack_packed(batches))
        a = (runner.params, runner.kv_pages, packed, runner._fb,
             runner._key_data, runner._ctr(0))

        t0 = time.perf_counter()
        lowered = runner._step.lower(*a, segments)
        t_trace = time.perf_counter() - t0
        t0 = time.perf_counter()
        lowered.compile()
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        tokens, runner.kv_pages = runner._step(*a, segments)
        jax.block_until_ready(tokens)
        t_loadrun = time.perf_counter() - t0
        # rebuild operands the donation consumed
        packed = runner._put_batch(runner._stack_packed(batches))
        a = (runner.params, runner.kv_pages, packed, runner._fb,
             runner._key_data, runner._ctr(0))
        t0 = time.perf_counter()
        tokens, runner.kv_pages = runner._step(*a, segments)
        jax.block_until_ready(tokens)
        t_run = time.perf_counter() - t0
        tot["trace"] += t_trace
        tot["compile"] += t_compile
        tot["loadrun"] += t_loadrun
        tot["run"] += t_run
        print(f"{str(layout):>26} {t_trace:7.2f} {t_compile:8.2f} "
              f"{t_loadrun:9.2f} {t_run:7.3f}")

    t0 = time.perf_counter()
    jax.device_get(tokens)
    t_d2h = time.perf_counter() - t0
    print(json.dumps({
        "phase_import_s": round(t_import, 1),
        "phase_ctor_s": round(t_ctor, 1),
        "warmup_trace_s": round(tot["trace"], 1),
        "warmup_compile_s": round(tot["compile"], 1),
        "warmup_loadrun_s": round(tot["loadrun"], 1),
        "warmup_steady_s": round(tot["run"], 1),
        "first_d2h_s": round(t_d2h, 1),
        "layouts": len(layouts),
    }))


if __name__ == "__main__":
    main()
