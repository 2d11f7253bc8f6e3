"""Trace ONLY decode-burst executions at controlled shapes.

Unlike tools/profile_burst.py (whole llm.generate run, prefill included),
this invokes ModelRunner.run_burst directly with fabricated sequences at a
fixed (live_lanes, ctx) point, so every traced device op belongs to the
burst program.  Prints per-op device time and the per-iteration budget.

Env knobs: NVT_LANES (live lanes, default 128), NVT_CTX (context length,
default 1024), NVT_REPS (bursts to trace, default 4), NVT_BLOCK, NVT_BURST,
NVT_GEOM (0.6b default; 4b/8b/14b = bench.py geometries), NVT_QUANT, NVT_KV.
"""

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from __graft_entry__ import QWEN3_0_6B, _hf_cfg
    from bench import GEOMETRIES
    from nanovllm_tpu.config import Config
    from nanovllm_tpu.engine.model_runner import ModelRunner
    from nanovllm_tpu.engine.sequence import Sequence
    from nanovllm_tpu.sampling_params import SamplingParams

    geom = GEOMETRIES.get(os.environ.get("NVT_GEOM", "0.6b"), QWEN3_0_6B)
    lanes = int(os.environ.get("NVT_LANES", 128))
    ctx = int(os.environ.get("NVT_CTX", 1024))
    reps = int(os.environ.get("NVT_REPS", 4))
    block = int(os.environ.get("NVT_BLOCK", 128))
    w = int(os.environ.get("NVT_BURST", 16))

    hf = _hf_cfg(**geom)
    config = Config(
        hf_config=hf, random_weights="fast", dtype="bfloat16",
        quantization=os.environ.get("NVT_QUANT", "int8"),
        kv_cache_dtype=os.environ.get("NVT_KV", "int8"),
        max_model_len=4096, max_num_batched_tokens=2048,
        max_num_seqs=256, decode_burst=w, kvcache_block_size=block,
        attention_impl="pallas" if jax.default_backend() == "tpu" else "ref",
        warmup_buckets=False,
    )
    runner = ModelRunner(config)

    # fabricate decode sequences at position ctx-1 with allocated page tables
    pages_per_seq = (ctx + block - 1) // block
    npages = config.num_kvcache_blocks
    seqs = []
    for i in range(lanes):
        s = Sequence([1] * ctx, SamplingParams(temperature=0.6), block_size=block)
        s.num_cached_tokens = ctx - 1
        s.num_new_tokens = 1
        # page aliasing across lanes is fine for a perf trace
        s.block_table = [
            (i * pages_per_seq + j) % npages for j in range(pages_per_seq)
        ]
        seqs.append(s)

    # warm the burst program at this shape
    runner.run_burst(seqs, w)
    t0 = time.perf_counter()
    runner.run_burst(seqs, w)
    per_burst = time.perf_counter() - t0
    print(f"warm burst wall: {per_burst * 1e3:.1f} ms "
          f"({per_burst / w * 1e3:.2f} ms/iter, {lanes} lanes, ctx {ctx})")

    trace_dir = "/tmp/nvt_trace_burst"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(reps):
            toks = runner.run_burst(seqs, w)
    del toks

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    per_op = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e12
                per_op[name][0] += dur
                per_op[name][1] += 1
                total += dur
    iters = reps * w
    items = sorted(per_op.items(), key=lambda kv: -kv[1][0])
    print(f"total device op time: {total:.3f}s over {len(items)} distinct ops "
          f"({reps} bursts x {w} = {iters} iters -> {total / iters * 1e3:.2f} ms/iter)")
    for name, (sec, n) in items[:45]:
        print(f"{sec / iters * 1e3:8.3f} ms/it {100 * sec / total:5.1f}% x{n:<6d} {name[:100]}")


if __name__ == "__main__":
    main()
