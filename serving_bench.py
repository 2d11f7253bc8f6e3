"""Online serving benchmark (port of the reference serving_bench.py).

Same workload and metrics as the reference (reference serving_bench.py:61-167):
Poisson arrivals at --request-rate, fixed random input/output lengths,
reporting throughput, TTFT, TPOT, and latency (now with p50/p99, not just
averages).  Differences: request ids come from ``add_request``'s return value
(the reference pokes ``scheduler.waiting[-1]``, SURVEY.md §3.4), and with no
checkpoint on disk the model is the flagship geometry with random weights
(--model random).

Beyond the reference:
  --sweep 8,16,24,32,48,64   rate sweep to saturation on ONE engine (one
                             warmup); emits one JSON line per rate so the
                             saturation point and tail-latency blowup are
                             visible in a single run.
  --deadline-s N             overload behavior: abort_request() any request
                             whose latency exceeds N seconds mid-flight;
                             aborted counts are reported per rate.
"""

import argparse
import json
import os
import random
import sys
import time

import numpy as np


class RequestMetrics:
    def __init__(self, request_id, input_len, submission_time):
        self.request_id = request_id
        self.input_len = input_len
        self.submission_time = submission_time
        self.first_token_time = -1.0
        self.completion_time = -1.0
        self.output_len = -1

    def record_first_token(self):
        if self.first_token_time < 0:
            self.first_token_time = time.perf_counter()

    def record_completion(self, output_ids):
        self.completion_time = time.perf_counter()
        self.output_len = len(output_ids)

    @property
    def ttft(self):
        return self.first_token_time - self.submission_time

    @property
    def tpot(self):
        if self.output_len > 1:
            return (self.completion_time - self.first_token_time) / (self.output_len - 1)
        return float("nan")

    @property
    def latency(self):
        return self.completion_time - self.submission_time


def build_engine(args):
    import jax

    if os.environ.get("NVT_CPU"):
        # the ambient TPU-tunnel machinery clobbers JAX_PLATFORMS=cpu from
        # the environment; forcing through jax.config works (conftest trick)
        jax.config.update("jax_platforms", "cpu")
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from nanovllm_tpu import LLM

    kwargs = dict(
        max_model_len=args.max_model_len,
        max_num_batched_tokens=args.max_num_batched_tokens,
        max_num_seqs=args.max_num_seqs,
        tensor_parallel_size=args.tensor_parallel_size,
        chunked_prefill=args.chunked_prefill,
        enforce_eager=args.enforce_eager,
        quantization=args.quantization,
        kv_cache_dtype=args.kv_cache_dtype,
        dtype=args.dtype,
    )
    if args.num_kvcache_blocks > 0:
        # KV-capacity-pressure runs: a pool too small for the working set
        # exercises the preempt -> re-admit -> prefix-re-hit path online
        kwargs["num_kvcache_blocks"] = args.num_kvcache_blocks
    if args.kvcache_block_size > 0:
        kwargs["kvcache_block_size"] = args.kvcache_block_size
    if args.model == "random":
        from __graft_entry__ import QWEN3_0_6B, _hf_cfg
        from bench import GEOMETRIES

        geom = dict(GEOMETRIES.get(args.geom, QWEN3_0_6B))
        if args.layers:
            geom["layers"] = args.layers
        return LLM(hf_config=_hf_cfg(**geom), random_weights="fast", **kwargs)
    return LLM(args.model, **kwargs)


def run_trace(engine, args, rate, seed):
    """One Poisson trace at ``rate`` req/s; returns (metrics, run stats)."""
    from nanovllm_tpu import SamplingParams

    random.seed(seed)
    rng = np.random.default_rng(seed)
    prompts = [
        [random.randint(0, 10000) for _ in range(args.random_input_len)]
        for _ in range(args.num_requests)
    ]
    sps = [
        SamplingParams(temperature=0.6, ignore_eos=True, max_tokens=args.random_output_len)
        for _ in range(args.num_requests)
    ]
    arrival = np.cumsum(rng.exponential(1.0 / rate, args.num_requests))

    metrics: dict[int, RequestMetrics] = {}
    aborted: set[int] = set()
    sent = 0
    pre0 = engine.scheduler.stats.num_preempted
    hit0 = engine.scheduler.stats.num_prefix_cached_tokens
    start = time.perf_counter()
    while sent < args.num_requests or not engine.is_finished():
        now = time.perf_counter()
        while sent < args.num_requests and now - start >= arrival[sent]:
            rid = engine.add_request(prompts[sent], sps[sent])
            metrics[rid] = RequestMetrics(rid, len(prompts[sent]), start + arrival[sent])
            sent += 1
        if args.deadline_s > 0:
            for rid, m in metrics.items():
                if (rid not in aborted and m.completion_time < 0
                        and now - m.submission_time > args.deadline_s):
                    if engine.abort_request(rid):
                        aborted.add(rid)
        if engine.is_finished():
            time.sleep(0.002)
            continue
        finished, _ = engine.step()
        for seq in engine.scheduler.running:
            if seq.seq_id in metrics and seq.num_cached_tokens >= seq.num_prompt_tokens:
                metrics[seq.seq_id].record_first_token()
        for rid, output_ids in finished:
            m = metrics.get(rid)
            if m is not None and rid not in aborted:
                m.record_first_token()
                m.record_completion(output_ids)

    total_time = time.perf_counter() - start
    return metrics, {
        "total_time": total_time,
        "aborted": len(aborted),
        "preempted": engine.scheduler.stats.num_preempted - pre0,
        "prefix_cached_tokens":
            engine.scheduler.stats.num_prefix_cached_tokens - hit0,
    }


def summarize(metrics, run, rate, args):
    done = [m for m in metrics.values() if m.completion_time > 0]
    if not done:  # full overload: everything aborted past the deadline
        row = {
            "metric": "online_throughput", "value": 0.0, "unit": "tok/s",
            "vs_baseline": None, "rate_req_s": rate, "completed": 0,
            "aborted": run["aborted"], "preempted": run["preempted"],
        }
        print(f"--- rate {rate} req/s: 0 completed, "
              f"{run['aborted']} aborted", file=sys.stderr)
        return row
    total_in = sum(m.input_len for m in done)
    total_out = sum(m.output_len for m in done)
    ttfts = [m.ttft for m in done]
    tpots = [m.tpot for m in done]
    lats = [m.latency for m in done]
    row = {
        "metric": "online_throughput",
        "value": round((total_in + total_out) / run["total_time"], 2),
        "unit": "tok/s",
        "vs_baseline": None,
        "rate_req_s": rate,
        "completed": len(done),
        "aborted": run["aborted"],
        "preempted": run["preempted"],
        "prefix_cached_tokens": run["prefix_cached_tokens"],
        "avg_ttft_ms": round(float(np.mean(ttfts)) * 1000, 2),
        "p50_ttft_ms": round(float(np.percentile(ttfts, 50)) * 1000, 2),
        "p99_ttft_ms": round(float(np.percentile(ttfts, 99)) * 1000, 2),
        "avg_tpot_ms": round(float(np.nanmean(tpots)) * 1000, 2),
        "p99_tpot_ms": round(float(np.nanpercentile(tpots, 99)) * 1000, 2),
        "avg_latency_s": round(float(np.mean(lats)), 2),
        "p99_latency_s": round(float(np.percentile(lats, 99)), 2),
    }
    print(
        f"--- rate {rate} req/s: {row['value']} tok/s, "
        f"TTFT p50 {row['p50_ttft_ms']} / p99 {row['p99_ttft_ms']} ms, "
        f"TPOT avg {row['avg_tpot_ms']} / p99 {row['p99_tpot_ms']} ms, "
        f"latency avg {row['avg_latency_s']} / p99 {row['p99_latency_s']} s, "
        f"aborted {row['aborted']}, preempted {row['preempted']}, "
        f"prefix_hit {row['prefix_cached_tokens']}tok",
        file=sys.stderr,
    )
    return row


def main():
    parser = argparse.ArgumentParser(description="Online serving benchmark.")
    parser.add_argument("--model", type=str, default="random")
    parser.add_argument("--geom", type=str, default="0.6b")
    parser.add_argument("--num-requests", type=int, default=256)
    parser.add_argument("--request-rate", type=float, default=8.0)
    parser.add_argument("--sweep", type=str, default="",
                        help="comma-separated rates; one engine, one warmup")
    parser.add_argument("--deadline-s", type=float, default=0.0,
                        help="abort requests older than this (0 = never)")
    parser.add_argument("--max-num-batched-tokens", type=int, default=2048)
    parser.add_argument("--max-num-seqs", type=int, default=512)
    parser.add_argument("--max-model-len", type=int, default=4096)
    parser.add_argument("--tensor-parallel-size", type=int, default=1)
    parser.add_argument("--random-input-len", type=int, default=128)
    parser.add_argument("--random-output-len", type=int, default=100)
    parser.add_argument("--chunked-prefill", action="store_true", default=False)
    parser.add_argument("--enforce-eager", action="store_true", default=False)
    parser.add_argument("--layers", type=int, default=0, help="override (random model only)")
    parser.add_argument("--num-kvcache-blocks", type=int, default=0,
                        help=">0: cap the KV pool (capacity-pressure runs)")
    parser.add_argument("--kvcache-block-size", type=int, default=0)
    parser.add_argument("--quantization", type=str, default="none")
    parser.add_argument("--kv-cache-dtype", type=str, default="auto")
    parser.add_argument("--dtype", type=str, default="bfloat16")
    parser.add_argument("--json", action="store_true", help="emit one JSON line per rate")
    args = parser.parse_args()

    random.seed(100)

    from nanovllm_tpu import SamplingParams

    engine = build_engine(args)

    # warm up the shape buckets
    warm = [[random.randint(0, 10000) for _ in range(args.random_input_len)] for _ in range(8)]
    engine.generate(
        warm,
        SamplingParams(temperature=0.6, ignore_eos=True, max_tokens=16),
        use_tqdm=False,
    )
    # measurement run: take the full lane ladder (a live deployment would
    # instead serve immediately and absorb per-tier first-load blips)
    engine.wait_for_warmup()

    rates = (
        [float(r) for r in args.sweep.split(",")] if args.sweep
        else [args.request_rate]
    )
    for i, rate in enumerate(rates):
        metrics, run = run_trace(engine, args, rate, seed=100 + i)
        row = summarize(metrics, run, rate, args)
        if args.json:
            print(json.dumps(row))


if __name__ == "__main__":
    main()
