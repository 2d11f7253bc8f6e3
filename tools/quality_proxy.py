"""Quantization quality proxies on real hardware, no checkpoint required.

BASELINE.md's WikiText-2 perplexity gates need trained weights, which do not
exist on this machine (zero egress).  What CAN be measured today, at a real
model geometry on the real chip, is the *divergence quantization introduces*
(VERDICT round-1 item 5):

  mode A (default)  greedy-token agreement over an N-token generation and
                    scored-logprob deltas on the bf16 model's own greedy text,
                    for every quant config vs the bf16 control — engine-level,
                    through the full production path (pallas kernels on TPU).
  mode B (--kl)     exact full-vocab logit KL(bf16 || quant) per position for
                    a prefill pass, via model internals (quant matmul kernels
                    and the quantized-KV cache roundtrip included; attention
                    oracle impl "ref" — kernel-vs-oracle equivalence is
                    covered separately by tests/test_kernels.py).

Caveat recorded in QUALITY.md: random weights give near-flat logits, so
greedy agreement here is far HARSHER than on trained weights (tiny logit
gaps flip argmax).  Run tools/wikitext_ppl.py for the real gate the moment
trained weights are available.

Usage:
  python tools/quality_proxy.py --geom 4b --tokens 1024
  python tools/quality_proxy.py --geom 4b --kl --tokens 256
"""

import argparse
import gc
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    ("w8a16_kv8", "int8", "int8"),
    ("w4a16_kv8", "int4", "int8"),
    ("w8a8_kv8", "w8a8", "int8"),
    ("w8a16_kv4", "int8", "int4"),
]


def build_llm(geom, quant, kv, max_len):
    from nanovllm_tpu import LLM

    return LLM(
        hf_config=geom,
        random_weights=True,
        dtype="bfloat16",
        quantization=quant,
        kv_cache_dtype=kv,
        max_model_len=max_len,
        max_num_batched_tokens=4096,
        max_num_seqs=8,
        warmup_buckets=False,  # correctness run, compile on demand
    )


def mode_a(geom, n_tokens, prompt_len):
    from nanovllm_tpu import SamplingParams

    random.seed(42)
    prompt = [random.randint(0, 10000) for _ in range(prompt_len)]
    sp = SamplingParams(temperature=0.0, max_tokens=n_tokens, ignore_eos=True)
    max_len = prompt_len + n_tokens + 8

    def run(quant, kv, extra_text=None):
        llm = build_llm(geom, quant, kv, max_len)
        toks = llm.generate([prompt], sp, use_tqdm=False)[0]["token_ids"]
        texts = [prompt + toks] + ([extra_text] if extra_text else [])
        scores = llm.score(texts)
        del llm
        gc.collect()
        return toks, scores

    ref_toks, (ref_lps,) = run("none", "auto")
    ref_text = prompt + ref_toks
    rows = []
    for name, quant, kv in CONFIGS:
        toks, (_, lps_on_ref) = run(quant, kv, extra_text=ref_text)
        div = next(
            (i for i, (a, b) in enumerate(zip(ref_toks, toks)) if a != b),
            len(ref_toks),
        )
        match = sum(a == b for a, b in zip(ref_toks, toks)) / len(ref_toks)
        # the quant model scoring the bf16 text: per-position logprob deltas
        # on identical inputs = the direct quality-divergence signal
        import numpy as np

        d = np.asarray(lps_on_ref) - np.asarray(ref_lps)
        rows.append({
            "config": name,
            "first_divergence": div,
            "greedy_match_frac": round(match, 4),
            "mean_dlogprob": round(float(d.mean()), 5),
            "max_abs_dlogprob": round(float(np.abs(d).max()), 4),
        })
        print(json.dumps(rows[-1]))
    return rows


def mode_b_kl(geom, n_tokens, impl="ref", only=None, rotate=False):
    """Exact per-position KL(bf16 || quant) over the full vocab.

    ``impl="pallas"`` routes the prefill pass through the production TPU
    kernels (ragged paged attention + quantized matmuls) instead of the jnp
    oracle — the round-3 requirement that the quality evidence cover the
    real kernels' bf16 numerics, not just the f32 reference path
    (VERDICT round-2 item 4).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nanovllm_tpu.engine.batch import StepBatch
    from nanovllm_tpu.models.qwen3 import (
        ModelSpec,
        compute_logits_local,
        forward_local,
    )
    from nanovllm_tpu.utils.loader import init_random_params, quantize_params

    spec = ModelSpec.from_hf(geom, tp_size=1, dtype="bfloat16")
    base = init_random_params(0, spec)
    page = 128
    num_pages = (n_tokens + page - 1) // page
    rng = np.random.default_rng(7)
    tokens = rng.integers(0, 10000, n_tokens).astype(np.int32)

    def kv_zeros(kv_dtype):
        # split-plane 3D cache (ops/kv_cache.py): K at plane 2*gp, V at
        # 2*gp + 1, head rows flattened; KV4 packs both in one plane
        lp = spec.num_layers * num_pages
        d = spec.num_kv_heads * spec.head_dim
        if kv_dtype in ("int8", "int4"):
            planes = 1 if kv_dtype == "int4" else 2
            return {
                "data": jnp.zeros((planes * lp, page, d), jnp.int8),
                "scale": jnp.zeros(
                    (lp, 2 * spec.num_kv_heads, page), jnp.float32),
            }
        return jnp.zeros((2 * lp, page, d), jnp.bfloat16)

    batch = StepBatch(
        token_ids=jnp.asarray(tokens),
        positions=jnp.arange(n_tokens, dtype=jnp.int32),
        slot_mapping=jnp.arange(n_tokens, dtype=jnp.int32),
        token_seq=jnp.zeros(n_tokens, jnp.int32),
        fb_idx=jnp.full((n_tokens,), -1, jnp.int32),
        kv_lens=jnp.asarray([n_tokens], jnp.int32),
        page_indices=jnp.arange(num_pages, dtype=jnp.int32)[None, :],
        logits_indices=jnp.asarray([n_tokens - 1], jnp.int32),
        temperatures=jnp.zeros(1, jnp.float32),
    )

    @jax.jit
    def logits_of(params, kv):
        hidden, _ = forward_local(
            params, kv, batch, (0, 0, n_tokens), spec, None, impl
        )
        return compute_logits_local(params, hidden, spec)

    def logprobs(params, kv_dtype):
        p = jax.tree.map(jnp.asarray, params)
        lg = logits_of(p, kv_zeros(kv_dtype))
        lg = np.array(lg, np.float32)[:, : spec.vocab_size]
        lg -= lg.max(axis=1, keepdims=True)
        lse = np.log(np.exp(lg).sum(axis=1, keepdims=True))
        return lg - lse

    lp_ref = logprobs(base, "auto")
    rows = []
    rotated = None
    if rotate:
        # incoherence rotation (utils/rotation.py): rotate ONCE, quantize
        # each config from the rotated tree; KL stays vs the ORIGINAL bf16
        # model so the rotation's own bf16 rounding cost is included
        from nanovllm_tpu.utils.rotation import apply_incoherence_rotation

        rotated = apply_incoherence_rotation(dict(base), spec)
    for name, quant, kv in CONFIGS:
        if only and name not in only:
            continue
        qp = quantize_params(dict(rotated if rotate else base), quant, tp=1)
        lp_q = logprobs(qp, kv)
        kl = (np.exp(lp_ref) * (lp_ref - lp_q)).sum(axis=1)
        agree = float((lp_ref.argmax(axis=1) == lp_q.argmax(axis=1)).mean())
        rows.append({
            "config": name,
            "kl_mean": round(float(kl.mean()), 6),
            "kl_p99": round(float(np.percentile(kl, 99)), 6),
            "kl_max": round(float(kl.max()), 6),
            "top1_agreement": round(agree, 4),
        })
        print(json.dumps(rows[-1]))
        del qp, lp_q
        gc.collect()
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geom", default="4b")
    ap.add_argument("--tokens", type=int, default=None)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--kl", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated config names to run (--kl mode)")
    ap.add_argument("--impl", default="ref", choices=["ref", "pallas"],
                    help="attention/matmul backend for --kl (pallas = the "
                    "production TPU kernels; mode A always runs the full "
                    "production engine path)")
    ap.add_argument("--rotate", action="store_true",
                    help="--kl mode: apply the data-free incoherence "
                    "rotation before quantizing (utils/rotation.py)")
    args = ap.parse_args()

    from bench import GEOMETRIES
    from __graft_entry__ import QWEN3_0_6B, _hf_cfg

    geom = _hf_cfg(**GEOMETRIES.get(args.geom, QWEN3_0_6B))
    if args.kl:
        only = set(args.only.split(",")) if args.only else None
        mode_b_kl(geom, args.tokens or 256, impl=args.impl, only=only,
                  rotate=args.rotate)
    else:
        mode_a(geom, args.tokens or 1024, args.prompt_len)


if __name__ == "__main__":
    main()
