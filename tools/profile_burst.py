"""Capture an xprof trace of decode-burst steps and print per-op device time.

Builds the bench.py engine (W8A16+KV8 flagship geometry), runs a pure-decode
workload so every traced step is a burst, then parses the xplane protobuf for
the top HLO ops by self time.  Answers "where do the non-attention
milliseconds of a decode iteration go".
"""

import glob
import os
import random
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from __graft_entry__ import QWEN3_0_6B, _hf_cfg
    from nanovllm_tpu import LLM, SamplingParams

    random.seed(0)
    hf = _hf_cfg(**QWEN3_0_6B)
    llm = LLM(
        hf_config=hf, random_weights=True, dtype="bfloat16",
        quantization="int8", kv_cache_dtype="int8",
        max_model_len=4096, max_num_batched_tokens=2048, max_num_seqs=256,
        decode_burst=16, kvcache_block_size=128, attention_impl="pallas",
    )

    prompts = [
        [random.randint(0, 10000) for _ in range(1008)] for _ in range(256)
    ]
    sp = SamplingParams(temperature=0.6, ignore_eos=True, max_tokens=96)
    # warm the buckets on the same shapes
    llm.generate(prompts[:8], SamplingParams(
        temperature=0.6, ignore_eos=True, max_tokens=8), use_tqdm=False)

    trace_dir = "/tmp/nvt_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        llm.generate(prompts, sp, use_tqdm=False)

    # ---- parse the xplane ----
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    per_op = defaultdict(float)
    total = 0.0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" not in line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e12
                per_op[name] += dur
                total += dur
    items = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"total device op time: {total:.2f}s over {len(items)} distinct ops")
    for name, sec in items[:40]:
        print(f"{sec:9.3f}s  {100 * sec / total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
