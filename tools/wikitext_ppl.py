"""WikiText-2 perplexity gate harness (BASELINE.md quality gates).

Runs the moment trained weights + the dataset are available (this machine has
neither: zero egress, no checkpoints — verified in VERDICT round 1).  Gates:

    W8A16 + KV8:  ppl delta vs bf16  <= +0.1
    W4A16 (g=128): ppl delta vs bf16 <= +0.3

Usage:
    python tools/wikitext_ppl.py --model /path/to/Qwen3-XB \
        --data /path/to/wikitext-2-raw/wiki.test.raw \
        [--configs bf16,w8a16_kv8,w4a16_kv8,w8a8_kv8] [--window 2048]

The eval follows the standard strided protocol: the raw test split is
tokenized as ONE stream and cut into non-overlapping windows of --window
tokens; ppl = exp(-mean logprob) over all scored positions (each window's
first token is unconditioned and excluded — identical treatment for every
config, so deltas are comparable).  --data also accepts a HF datasets cache
directory containing wikitext (loaded via datasets if installed).

Verified end-to-end on a tiny random checkpoint via tests/test_scoring.py
(scoring path matches HF logprobs) and tests/test_quant.py (quant ppl smoke);
this file is the same pipeline pointed at real inputs.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "bf16": ("none", "auto"),
    "w8a16_kv8": ("int8", "int8"),
    "w4a16_kv8": ("int4", "int8"),
    "w8a8_kv8": ("w8a8", "int8"),
    "w8a16_kv4": ("int8", "int4"),
}

GATES = {"w8a16_kv8": 0.1, "w4a16_kv8": 0.3}


def load_text(path: str) -> str:
    if os.path.isfile(path):
        with open(path, encoding="utf-8") as f:
            return f.read()
    # directory: try the raw file layout, then the datasets library
    for name in ("wiki.test.raw", "wikitext-2-raw-v1/wiki.test.raw"):
        p = os.path.join(path, name)
        if os.path.isfile(p):
            with open(p, encoding="utf-8") as f:
                return f.read()
    try:
        from datasets import load_dataset

        ds = load_dataset(
            "wikitext", "wikitext-2-raw-v1", split="test", cache_dir=path
        )
        return "\n\n".join(ds["text"])
    except Exception as e:  # pragma: no cover
        raise SystemExit(f"could not load WikiText-2 from {path}: {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="HF checkpoint directory")
    ap.add_argument("--data", required=True, help="wiki.test.raw file or dir")
    ap.add_argument("--configs", default="bf16,w8a16_kv8,w4a16_kv8")
    ap.add_argument("--window", type=int, default=2048)
    ap.add_argument("--max-windows", type=int, default=0, help="0 = all")
    args = ap.parse_args()

    from transformers import AutoTokenizer

    from nanovllm_tpu import LLM

    tok = AutoTokenizer.from_pretrained(args.model, use_fast=True)
    ids = tok.encode(load_text(args.data))
    windows = [
        ids[i: i + args.window]
        for i in range(0, len(ids) - args.window + 1, args.window)
    ]
    if args.max_windows:
        windows = windows[: args.max_windows]
    print(f"# {len(ids)} tokens -> {len(windows)} windows of {args.window}",
          file=sys.stderr)

    results = {}
    for name in args.configs.split(","):
        quant, kv = CONFIGS[name]
        llm = LLM(
            model=args.model,
            dtype="bfloat16",
            quantization=quant,
            kv_cache_dtype=kv,
            max_model_len=max(args.window + 8, 4096),
            max_num_batched_tokens=8192,
        )
        ppl = llm.perplexity(windows)
        results[name] = ppl
        row = {"config": name, "wikitext2_ppl": round(ppl, 4)}
        if name in GATES and "bf16" in results:
            delta = ppl - results["bf16"]
            row["delta_vs_bf16"] = round(delta, 4)
            row["gate"] = f"<= +{GATES[name]}"
            row["gate_met"] = bool(delta <= GATES[name])
        print(json.dumps(row))
        del llm
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
