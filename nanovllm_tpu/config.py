"""Engine-wide configuration.

Capability parity with the reference Config (reference: nanovllm/config.py:23-87):
same knobs (max_num_batched_tokens, max_num_seqs, max_model_len,
gpu_memory_utilization, tensor_parallel_size, enforce_eager,
kvcache_block_size, num_kvcache_blocks, chunked_prefill), HF AutoConfig
loading, and max_model_len clamping to the model's max_position_embeddings.

TPU-native additions:
  - ``kvcache_block_size`` may be any multiple of 16 (TPU page granularity for
    the Pallas paged-attention kernel) instead of the reference's multiple-of-256
    rule; the INT8-KV scale plane keeps pages on the lane axis, so KV8+Pallas
    needs a multiple of 128.  Default 128: the decode kernel reads whole pages,
    and the average half-page tail waste at 256 was ~12% of decode KV bandwidth
    (measured A/B on v5e: 4759.6 vs 4561.7 tok/s on the bench.py trace).
  - ``dtype`` for activations/weights (bfloat16 default — MXU native).
  - ``attention_impl`` selects the attention backend ("auto" picks the Pallas
    ragged-paged-attention kernel on TPU and the jnp reference path on CPU).
  - ``prefill_chunk_pad`` / bucket knobs: XLA compiles one executable per
    padded batch shape, so batch shapes are bucketed (the analogue of the
    reference's CUDA-Graph batch-size ladder, model_runner.py:686-691).
"""

from dataclasses import dataclass, field
from typing import Any


@dataclass
class Config:
    model: str = ""
    max_num_batched_tokens: int = 16384
    max_num_seqs: int = 512
    max_model_len: int = 40960
    gpu_memory_utilization: float = 0.9  # name kept for API parity; HBM here
    tensor_parallel_size: int = 1
    # Data parallelism over a second mesh axis ("dp", outermost — DCN across
    # hosts in a multi-host deployment; the reference is single-node TP-only,
    # SURVEY.md §2.4/§5.8).  One logical scheduler assigns each sequence to a
    # dp group; each group owns its own KV-cache partition and block manager;
    # no cross-dp collectives exist in the step program.
    data_parallel_size: int = 1
    enforce_eager: bool = False  # accepted for parity; JAX is always compiled
    kvcache_block_size: int = 128
    num_kvcache_blocks: int = -1  # -1: derived from free HBM at engine init
    chunked_prefill: bool = False
    eos: int = -1

    # --- TPU-native knobs (not in the reference) ---
    dtype: str = "bfloat16"
    attention_impl: str = "auto"  # auto | pallas | ref
    # Weight-only quantization: "none" | "int8" (W8A16) | "int4" (W4A16, g=128).
    # Dequantization is fused into the Pallas matmul kernel on TPU.
    quantization: str = "none"
    # KV cache dtype: "auto" (= activation dtype) | "int8" (KV8: dynamic
    # per-token-head scales, dequant fused into the attention kernel) |
    # "int4" (KV4: two elements packed per byte along head_dim — half the
    # decode-attention HBM traffic of KV8 at a further quality cost; no
    # BASELINE ppl gate covers it, so it is opt-in and NOT the bench default).
    kv_cache_dtype: str = "auto"
    # LM-head dtype for the fused sampling kernel: "auto" follows
    # ``quantization`` (per-row int8 copy of the head when weights are
    # quantized — half the head-stream bytes per sampling pass);
    # "bfloat16" keeps the full-precision head regardless.
    lm_head_dtype: str = "auto"
    # Async scheduling (vLLM-v1 analogue): schedule and dispatch step N+1
    # before step N's sampled tokens reach the host — decode inputs feed
    # device-side from the previous program's output, and EOS is applied one
    # step late (the overshoot is discarded, like decode-burst acceptance).
    # Hides the host<->device round-trip at every step boundary.  Greedy
    # outputs are bit-identical to sync; stochastic sampling draws the same
    # per-step keys unless an EOS shifts the step count.
    async_scheduling: bool = True
    # Hand the runner an HF config object directly (tests / random-init bench
    # runs that have no checkpoint directory on disk).
    hf_config: Any = field(default=None, repr=False)
    # Initialize weights randomly instead of loading safetensors (bench mode).
    # True = per-layer-distinct values; "fast" = one layer broadcast across
    # the stack (identical layers — fine for throughput benches, /L host init
    # time at large geometries; do NOT use for quality proxies).
    random_weights: bool | str = False
    # Decode burst: when every running sequence is decoding and nothing is
    # waiting, run up to this many decode steps in ONE device program per
    # host round-trip (0 disables).  This is the TPU-native answer to the
    # reference's CUDA-Graph decode replay (model_runner.py:640-715) plus the
    # host-overhead amortization a single-controller design needs.
    decode_burst: int = 8
    # Pre-compile + first-execute the step/burst program ladder at engine
    # init, so no program pays its multi-second compile + device-load cost
    # mid-serving — the analogue of the reference capturing every CUDA decode
    # graph up front (model_runner.py:686-691).  None = auto (on for TPU
    # unless enforce_eager).
    warmup_buckets: bool | None = None
    # Persistent XLA compilation cache directory.  "auto" (default) uses
    # $NVT_CACHE_DIR or ~/.cache/nanovllm_tpu/xla when no cache dir is
    # configured yet; None/"" disables.  The warmup ladder compiles its
    # programs in PARALLEL and hands them to the serial first-execution loop
    # through this cache — without it every program would compile twice.
    compilation_cache_dir: str | None = "auto"
    # Multi-host: call jax.distributed.initialize() (reads COORDINATOR_ADDRESS
    # etc. from the environment).  Every host runs the same engine script with
    # an identical request stream; the pure-Python scheduler is deterministic,
    # so all hosts schedule identically and dispatch the same jit programs in
    # lockstep — the TPU-native replacement for the reference's SharedMemory
    # method broadcast (reference model_runner.py:195-288).
    distributed: bool = False

    # --- Pallas attention-kernel tuning (ops.ragged_paged_attention.AttnKnobs
    # docstring explains each; values here land on ModelSpec.attn_knobs, so
    # they are part of the jitted programs' identity and two engines in one
    # process can diverge).  None = kernel default; the NVT_* env vars remain
    # the highest-precedence A/B override for the bench tools.
    attn_decode_npp: int | None = None      # NVT_DECODE_NPP (default 8)
    attn_decode_xlane: bool | None = None   # NVT_DECODE_XLANE (default on)
    attn_decode_ring: int | None = None     # NVT_DECODE_RING (default 4)
    attn_decode_tpp: int | None = None      # NVT_DECODE_TPP (default 2)
    attn_prefill_manual: bool | None = None  # NVT_PREFILL_MANUAL (default on)
    attn_prefill_npp: int | None = None     # NVT_PREFILL_NPP (default 4)
    attn_prefill_ring: int | None = None    # NVT_PREFILL_RING (default 2)
    attn_fused_kv_write: bool | None = None  # NVT_FUSED_KV (default on)
    # W4A16 quantization-scheme knobs (host-side; affect the packed weight
    # layout, so they must match between quantize and serve — QUALITY.md
    # records the measured levers).  None = env (NVT_INT4_GROUP/NVT_INT4_MSE)
    # then defaults (128 / MSE-scan on).
    int4_group: int | None = None
    int4_mse: bool | None = None
    # Data-free incoherence rotation (QuaRot-class, utils/rotation.py):
    # rotate the residual basis by a random orthogonal before quantizing,
    # spreading weight outliers across channels.  Host-side, calibration-
    # free, exact in real arithmetic; adds two thin [T,H]x[H,H] matmuls per
    # step.  Forces the eager (non-lazy) checkpoint loader.
    quant_rotate: bool = False

    def __post_init__(self):
        # Any positive size works for the control plane; the Pallas paged
        # attention path additionally requires a multiple of 16 (asserted
        # where that backend is selected).
        assert self.kvcache_block_size > 0
        assert 1 <= self.tensor_parallel_size <= 64
        assert self.data_parallel_size >= 1
        assert self.max_num_batched_tokens >= 1
        if self.hf_config is None:
            from transformers import AutoConfig

            self.hf_config = AutoConfig.from_pretrained(self.model)
        max_pos = getattr(self.hf_config, "max_position_embeddings", None)
        if max_pos is not None:
            self.max_model_len = min(self.max_model_len, max_pos)
        assert self.max_num_batched_tokens >= 1
