"""Online serving benchmark (port of the reference serving_bench.py).

Same workload and metrics as the reference (reference serving_bench.py:61-167):
Poisson arrivals at --request-rate, fixed random input/output lengths,
reporting throughput, average TTFT, average TPOT, and average latency.
Differences: request ids come from ``add_request``'s return value (the
reference pokes ``scheduler.waiting[-1]``, SURVEY.md §3.4), and with no
checkpoint on disk the model is the flagship geometry with random weights
(--model random).
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
    )
    if args.model == "random":
        from __graft_entry__ import QWEN3_0_6B, _hf_cfg

        geom = dict(QWEN3_0_6B, layers=args.layers or QWEN3_0_6B["layers"])
        return LLM(hf_config=_hf_cfg(**geom), random_weights=True, **kwargs)
    return LLM(args.model, **kwargs)


def main():
    parser = argparse.ArgumentParser(description="Online serving benchmark.")
    parser.add_argument("--model", type=str, default="random")
    parser.add_argument("--num-requests", type=int, default=256)
    parser.add_argument("--request-rate", type=float, default=8.0)
    parser.add_argument("--max-num-batched-tokens", type=int, default=2048)
    parser.add_argument("--max-num-seqs", type=int, default=512)
    parser.add_argument("--max-model-len", type=int, default=4096)
    parser.add_argument("--tensor-parallel-size", type=int, default=1)
    parser.add_argument("--random-input-len", type=int, default=128)
    parser.add_argument("--random-output-len", type=int, default=100)
    parser.add_argument("--chunked-prefill", action="store_true", default=False)
    parser.add_argument("--enforce-eager", action="store_true", default=False)
    parser.add_argument("--layers", type=int, default=0, help="override (random model only)")
    parser.add_argument("--quantization", type=str, default="none")
    parser.add_argument("--kv-cache-dtype", type=str, default="auto")
    parser.add_argument("--json", action="store_true", help="emit one JSON line")
    args = parser.parse_args()

    random.seed(100)
    np.random.seed(100)

    from nanovllm_tpu import SamplingParams

    engine = build_engine(args)

    # warm up the shape buckets
    warm = [[random.randint(0, 10000) for _ in range(args.random_input_len)] for _ in range(8)]
    engine.generate(
        warm,
        SamplingParams(temperature=0.6, ignore_eos=True, max_tokens=16),
        use_tqdm=False,
    )

    prompts = [
        [random.randint(0, 10000) for _ in range(args.random_input_len)]
        for _ in range(args.num_requests)
    ]
    sps = [
        SamplingParams(temperature=0.6, ignore_eos=True, max_tokens=args.random_output_len)
        for _ in range(args.num_requests)
    ]
    arrival = np.cumsum(np.random.exponential(1.0 / args.request_rate, args.num_requests))

    metrics: dict[int, RequestMetrics] = {}
    sent = 0
    start = time.perf_counter()
    while sent < args.num_requests or not engine.is_finished():
        now = time.perf_counter()
        while sent < args.num_requests and now - start >= arrival[sent]:
            rid = engine.add_request(prompts[sent], sps[sent])
            metrics[rid] = RequestMetrics(rid, len(prompts[sent]), start + arrival[sent])
            sent += 1
        if engine.is_finished():
            time.sleep(0.002)
            continue
        finished, _ = engine.step()
        for seq in engine.scheduler.running:
            if seq.seq_id in metrics and seq.num_cached_tokens >= seq.num_prompt_tokens:
                metrics[seq.seq_id].record_first_token()
        for rid, output_ids in finished:
            m = metrics.get(rid)
            if m is not None:
                m.record_first_token()
                m.record_completion(output_ids)

    total_time = time.perf_counter() - start
    done = [m for m in metrics.values() if m.completion_time > 0]
    total_in = sum(m.input_len for m in metrics.values())
    total_out = sum(m.output_len for m in done)
    throughput = (total_in + total_out) / total_time
    avg_ttft = float(np.mean([m.ttft for m in done]))
    avg_tpot = float(np.nanmean([m.tpot for m in done]))
    avg_latency = float(np.mean([m.latency for m in done]))
    p50_ttft = float(np.percentile([m.ttft for m in done], 50))

    print("--- Benchmark Results ---", file=sys.stderr)
    print(f"Total time: {total_time:.2f}s", file=sys.stderr)
    print(f"Requests: {len(done)}/{args.num_requests}", file=sys.stderr)
    print(f"Throughput: {throughput:.2f} tokens/s", file=sys.stderr)
    print(f"Average TTFT: {avg_ttft * 1000:.2f} ms  (p50 {p50_ttft * 1000:.2f} ms)", file=sys.stderr)
    print(f"Average TPOT: {avg_tpot * 1000:.2f} ms", file=sys.stderr)
    print(f"Average latency: {avg_latency:.2f} s", file=sys.stderr)
    if args.json:
        print(json.dumps({
            "metric": "online_throughput",
            "value": round(throughput, 2),
            "unit": "tok/s",
            "vs_baseline": None,
            "avg_ttft_ms": round(avg_ttft * 1000, 2),
            "p50_ttft_ms": round(p50_ttft * 1000, 2),
            "avg_tpot_ms": round(avg_tpot * 1000, 2),
            "avg_latency_s": round(avg_latency, 2),
        }))


if __name__ == "__main__":
    main()
