"""On-device stress probe: preemption + prefix-cache + long-context paths.

VERDICT round-1 gap: every real-TPU number had `preempted=0 prefix_cached=0`
— the preemption, prefix-hit, and mid-decode page-growth paths had only CPU
unit-test coverage.  This probe forces all three ON THE REAL CHIP and asserts
token-level equivalence between the production engine (async scheduling +
decode burst) and the sync/no-burst engine, plus run-to-run determinism.

Workload (greedy, ignore_eos):
  * 24 requests sharing a 512-token prefix with unique 128-token tails
    (prefix-cache hits on admission and on re-admission after preemption),
  * 4 long requests: ~3.5k-token prompts decoding past the 4k boundary
    (chunked prefill + page growth mid-decode),
  * a KV pool sized to ~60% of peak demand (forces LIFO preemption storms).

Prints one JSON line with stats; non-zero preempted/prefix_cached and token
equality are hard asserts.  Reference behavior spec: scheduler.py:204-220
(preempt), block_manager.py:263-317 (prefix hits).

Usage: python tools/stress_tpu.py [--geom 0.6b] [--quant int8] [--kv int8]
"""

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_workload(scale: int = 1):
    random.seed(11)
    prefix = [random.randint(0, 10000) for _ in range(512 // scale)]
    prompts, max_toks = [], []
    for _ in range(24 // min(scale, 4)):
        prompts.append(
            prefix + [random.randint(0, 10000) for _ in range(128 // scale)]
        )
        max_toks.append(256 // scale)
    for _ in range(4):
        prompts.append(
            [random.randint(0, 10000) for _ in range(3500 // scale)]
        )
        max_toks.append(600 // scale)
    return prompts, max_toks


def run(geom, quant, kv, *, async_sched, burst, blocks, scale=1, block_size=128):
    from nanovllm_tpu import LLM, SamplingParams

    llm = LLM(
        hf_config=geom,
        random_weights=True,
        dtype="bfloat16",
        quantization=quant,
        kv_cache_dtype=kv,
        max_model_len=8192,
        max_num_batched_tokens=8192,
        max_num_seqs=64,
        num_kvcache_blocks=blocks,
        kvcache_block_size=block_size,
        async_scheduling=async_sched,
        decode_burst=burst,
    )
    prompts, max_toks = build_workload(scale)
    sps = [
        SamplingParams(temperature=0.0, max_tokens=m, ignore_eos=True)
        for m in max_toks
    ]
    outs = llm.generate(prompts, sps, use_tqdm=False)
    stats = llm.scheduler.stats
    result = (
        [o["token_ids"] for o in outs],
        {
            "steps": stats.num_steps,
            "preempted": stats.num_preempted,
            "prefix_cached_tokens": stats.num_prefix_cached_tokens,
        },
    )
    del llm
    import gc

    gc.collect()
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", default="0.6b")
    ap.add_argument("--quant", default="int8")
    ap.add_argument("--kv", default="int8")
    ap.add_argument("--blocks", type=int, default=0, help="0 = auto-tight")
    ap.add_argument("--scale", type=int, default=1,
                    help="divide workload sizes by this (CPU smoke: 8)")
    ap.add_argument("--layers", type=int, default=0, help="0 = geometry's own")
    args = ap.parse_args()

    from bench import GEOMETRIES
    from __graft_entry__ import QWEN3_0_6B, _hf_cfg

    g = dict(GEOMETRIES.get(args.geom, QWEN3_0_6B))
    if args.layers:
        g["layers"] = args.layers
    geom = _hf_cfg(**g, max_pos=8192)
    # peak demand: 24*(512+128+256) + 4*(3500+600) = ~37.9k tokens
    # = ~296 pages at 128; ~60% of that forces preemption.  The CPU smoke
    # shrinks the page so the scaled-down prefix still spans full blocks.
    block_size = 128 // min(args.scale, 8)
    blocks = (args.blocks or 180) * (128 // block_size) // args.scale
    kw = dict(blocks=blocks, scale=args.scale, block_size=block_size)

    async_toks, async_stats = run(
        geom, args.quant, args.kv, async_sched=True, burst=32, **kw
    )
    assert async_stats["preempted"] > 0, async_stats
    assert async_stats["prefix_cached_tokens"] > 0, async_stats

    again_toks, _ = run(
        geom, args.quant, args.kv, async_sched=True, burst=32, **kw
    )
    assert again_toks == async_toks, "async engine is not deterministic"

    sync_toks, sync_stats = run(
        geom, args.quant, args.kv, async_sched=False, burst=0, **kw
    )
    mismatch = sum(a != b for a, b in zip(async_toks, sync_toks))
    assert mismatch == 0, (
        f"{mismatch}/{len(async_toks)} sequences differ async-vs-sync"
    )
    print(json.dumps({
        "metric": "stress_preempt_prefix_longctx",
        "equal_async_sync": True,
        "deterministic": True,
        "async": async_stats,
        "sync": sync_stats,
    }))


if __name__ == "__main__":
    main()
