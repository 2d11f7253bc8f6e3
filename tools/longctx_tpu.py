"""Exercise the advertised long-context envelope on the real chip.

VERDICT round-2 weak #8 / item 8: `max_model_len` defaults to 40960
(reference parity, config.py) but nothing past 8k context had ever touched
the chip — page-table width `_p_pad`, the causal-extent prefill walk, and
the decode kernel's VMEM envelope at large `p_pad` were untested at the
advertised lengths.  This probe runs 16k-32k contexts end-to-end:

  * N prompts of --ctx random tokens each, chunked prefill (budget 8192),
    greedy decode of --decode tokens PAST the prompt (page growth beyond
    the 16k/30k boundary),
  * reports prefill tok/s and decode ms/iter at that context from the
    NVT_STATS cells,
  * `--check` reruns the identical workload with a DIFFERENT prefill
    chunking (budget 2048 vs 8192) and asserts greedy token equality:
    chunk-count invariance exercises the causal-extent prefill walk, the
    partial-page resume path, and page growth at 16k+ from two different
    step decompositions.  (The jnp oracle cannot run at these lengths —
    it is O(T x padded_ctx) memory by design, 1.1 TB at 16k/prefill 8192;
    kernel-vs-oracle equality is covered on-chip up to 4k by
    tools/stress_tpu.py and at small scale by tests/test_kernels.py.)

Usage: NVT_STATS=1 python tools/longctx_tpu.py --ctx 16384 [--check]
"""

import argparse
import gc
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(geom, args, impl, budget=8192):
    from nanovllm_tpu import LLM, SamplingParams

    llm = LLM(
        hf_config=geom,
        random_weights="fast",
        dtype="bfloat16",
        quantization=args.quant,
        kv_cache_dtype=args.kv,
        max_model_len=args.max_model_len,
        max_num_batched_tokens=budget,
        max_num_seqs=8,
        chunked_prefill=True,
        attention_impl=impl,
    )
    random.seed(7)
    prompts = [
        [random.randint(0, 10000) for _ in range(args.ctx + 37 * i)]
        for i in range(args.seqs)
    ]
    sp = SamplingParams(
        temperature=0.0, max_tokens=args.decode, ignore_eos=True
    )
    t0 = time.perf_counter()
    outs = llm.generate(prompts, sp, use_tqdm=False)
    dt = time.perf_counter() - t0
    toks = [o["token_ids"] for o in outs]
    cells = {
        (k, p): (c.seconds, c.tokens, c.count)
        for (k, p), c in llm.stats.cells.items()
    }
    del llm
    gc.collect()
    return toks, dt, cells


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", default="0.6b")
    ap.add_argument("--quant", default="int8")
    ap.add_argument("--kv", default="int8")
    ap.add_argument("--ctx", type=int, default=16384)
    ap.add_argument("--decode", type=int, default=256)
    ap.add_argument("--seqs", type=int, default=4)
    ap.add_argument("--max-model-len", type=int, default=32768)
    ap.add_argument("--check", action="store_true",
                    help="rerun with a different prefill chunking and assert "
                         "greedy token equality")
    args = ap.parse_args()
    # prompts are skewed +37*i per sequence (see run()), so bound the LAST one
    assert (args.ctx + 37 * (args.seqs - 1) + args.decode
            <= args.max_model_len), "longest sequence exceeds max_model_len"

    os.environ.setdefault("NVT_STATS", "1")
    from bench import GEOMETRIES
    from __graft_entry__ import QWEN3_0_6B, _hf_cfg

    g = dict(GEOMETRIES.get(args.geom, QWEN3_0_6B))
    geom = _hf_cfg(**g, max_pos=args.max_model_len)

    toks, dt, cells = run(geom, args, "pallas")
    # NOTE: EngineStats token counts are SAMPLED rows (not processed chunk
    # tokens), so prefill throughput must come from wall time: decode
    # iterations are timed from the decode/burst device cells, and the
    # prefill phase is the remaining wall.
    dec_s, _, _ = cells.get(("decode", "device"), (0, 0, 0))
    b_s, _, _ = cells.get(("burst", "device"), (0, 0, 0))
    dec_iters = args.decode  # every decode step advances all seqs together
    prompt_tokens = args.seqs * args.ctx + 37 * args.seqs * (args.seqs - 1) // 2
    decode_wall = dec_s + b_s
    out = {
        "metric": "long_context",
        "ctx": args.ctx,
        "decode_past": args.decode,
        "seqs": args.seqs,
        "wall_s": round(dt, 1),
        "prompt_tokens": prompt_tokens,
        "prefill_tok_s": round(prompt_tokens / max(dt - decode_wall, 1e-6), 1),
        "decode_ms_per_iter": round(decode_wall / dec_iters * 1e3, 2)
        if dec_iters else None,
    }
    print(json.dumps(out))
    if args.check:
        alt_toks, _, _ = run(geom, args, "pallas", budget=2048)
        mism = sum(a != b for a, b in zip(toks, alt_toks))
        print(json.dumps({
            "metric": "long_context_chunk_invariance",
            "ctx": args.ctx,
            "budgets": [8192, 2048],
            "token_equal": mism == 0,
        }))
        assert mism == 0, f"{mism}/{len(toks)} seqs differ across chunkings"


if __name__ == "__main__":
    main()
