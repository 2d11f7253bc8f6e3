"""Trace ONLY mixed (prefill chunk + decode lanes) steps at controlled shapes.

Fabricates the production mixed-step layout: D decode lanes at ctx, plus one
prefill chunk filling the token budget, then traces ModelRunner.run() calls
and prints per-op device time.

Env knobs: NVT_LANES (decode lanes, default 128), NVT_CTX (decode context,
default 1024), NVT_PREFILL (chunk tokens, default 1536), NVT_REPS (default 4),
NVT_BLOCK, NVT_QUANT, NVT_KV.
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
    from nanovllm_tpu.config import Config
    from nanovllm_tpu.engine.model_runner import ModelRunner
    from nanovllm_tpu.engine.sequence import Sequence
    from nanovllm_tpu.sampling_params import SamplingParams

    lanes = int(os.environ.get("NVT_LANES", 128))
    ctx = int(os.environ.get("NVT_CTX", 1024))
    pf = int(os.environ.get("NVT_PREFILL", 1536))
    reps = int(os.environ.get("NVT_REPS", 4))
    block = int(os.environ.get("NVT_BLOCK", 128))

    hf = _hf_cfg(**QWEN3_0_6B)
    config = Config(
        hf_config=hf, random_weights=True, dtype="bfloat16",
        quantization=os.environ.get("NVT_QUANT", "int8"),
        kv_cache_dtype=os.environ.get("NVT_KV", "int8"),
        max_model_len=4096, max_num_batched_tokens=2048,
        max_num_seqs=256, decode_burst=32, kvcache_block_size=block,
        attention_impl="pallas" if jax.default_backend() == "tpu" else "ref",
        warmup_buckets=False,
    )
    runner = ModelRunner(config)
    npages = config.num_kvcache_blocks
    pps = (ctx + block - 1) // block

    def make_seqs():
        seqs = []
        for i in range(lanes):
            s = Sequence([1] * ctx, SamplingParams(temperature=0.6),
                         block_size=block)
            s.num_cached_tokens = ctx - 1
            s.num_new_tokens = 1
            s.block_table = [(i * pps + j) % npages for j in range(pps)]
            seqs.append(s)
        # one prefill chunk: fresh sequence, first pf tokens scheduled
        p = Sequence([1] * (pf + 64), SamplingParams(temperature=0.6),
                     block_size=block)
        p.num_cached_tokens = 0
        p.num_new_tokens = pf
        ppp = (pf + block - 1) // block
        base = (lanes * pps) % max(npages - ppp, 1)
        p.block_table = list(range(base, base + ppp))
        seqs.append(p)
        return seqs

    seqs = make_seqs()
    runner.run(seqs)  # compile + warm
    t0 = time.perf_counter()
    runner.run(seqs)
    dt = time.perf_counter() - t0
    print(f"warm mixed step wall: {dt * 1e3:.1f} ms "
          f"({lanes} decode lanes ctx {ctx} + {pf}-token prefill chunk)")

    trace_dir = "/tmp/nvt_trace_mixed"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(reps):
            runner.run(seqs)

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
    items = sorted(per_op.items(), key=lambda kv: -kv[1][0])
    print(f"total device op time: {total:.3f}s over {len(items)} distinct ops "
          f"({reps} steps -> {total / reps * 1e3:.2f} ms/step op-sum)")
    for name, (sec, n) in items[:45]:
        print(f"{sec / reps * 1e3:8.3f} ms/st {100 * sec / total:5.1f}% x{n:<6d} {name[:100]}")


if __name__ == "__main__":
    main()
