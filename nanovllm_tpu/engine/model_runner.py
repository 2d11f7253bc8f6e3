"""Single-controller JAX model runner.

Replaces the reference's per-GPU ModelRunner processes + SharedMemory/Event
control plane + NCCL data plane + CUDA Graph capture (reference
model_runner.py:87-715) with one Python process driving a ``Mesh(("tp",))``:

  * the whole step (embed -> layers -> sample) is ONE jitted ``shard_map``
    program; XLA inserts/overlaps the ICI collectives,
  * the jit cache over bucketed batch shapes plays the role of the CUDA-Graph
    ladder (and covers prefill shapes, which the reference never graphed),
  * the KV cache is a donated jit argument, updated functionally in place,
  * KV-cache sizing derives from device memory stats + a utilization knob,
    mirroring allocate_kv_cache (reference model_runner.py:319-375).
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from nanovllm_tpu.config import Config
from typing import NamedTuple

from nanovllm_tpu.constants import PREFILL_TILE, bucket, round_up
from nanovllm_tpu.engine.batch import (
    PackedBatch,
    StepBatch,
    lane_ladder,
    merge_layouts,
    prepare_step_batch,
    seq_pad,
    step_layout,
)
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.models.qwen3 import (
    ModelSpec,
    forward_and_sample,
    forward_and_score,
)
from nanovllm_tpu.parallel.mesh import (
    DP_AXIS,
    TP_AXIS,
    kv_pspec,
    make_mesh,
    pspecs_for,
    shard_params,
)
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map  # jax >= 0.7 style
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def _dtype_size(dtype: str) -> int:
    return jnp.dtype(dtype).itemsize


def _init_distributed() -> None:
    """Multi-controller bring-up (config.distributed=True).

    Every host runs the identical engine script; this joins them into one
    JAX runtime before any backend is touched.  Launch parameters come from
    the standard cluster autodetect (TPU pods, Slurm, Open MPI) or, when
    that is unavailable (e.g. the 2-process CPU lockstep test), from the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID environment
    variables.  Replaces the reference's per-rank NCCL rendezvous
    (reference model_runner.py:121) without its single-host assumption.
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    try:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid else None,
        )
    except RuntimeError as err:  # idempotent: the launcher may have done it
        if "already" not in str(err).lower():
            raise


class BurstMeta(NamedTuple):
    """Transfer buffers for a decode burst (3 H2D copies)."""

    tp: np.ndarray     # [3, S] int32: input token, first write position
    #                    (-1 = pad lane), feedback lane (-1 = use the token)
    pages: np.ndarray  # [S, PAGES] int32 block tables
    temps: np.ndarray  # [S] float32


class StepHandle(NamedTuple):
    """An in-flight dispatched step (async scheduling).

    ``tokens_dev`` is the program's token output, NOT yet fetched: [dp, S_CAP]
    for a step, [dp, w, s_pad] for a burst.  ``sampled`` indexes into ``seqs``
    (step) or covers every seq (burst).  ``pending`` records, per sampled seq,
    the index in seq.token_ids where its placeholder was appended (filled by
    the scheduler's counts-postprocess).
    """

    seqs: list
    tokens_dev: object
    sampled: list[int]
    lane_of: dict
    kind: str
    w: int                      # 0 = single step, >= 2 = burst width
    pending: list               # [(seq, [token_index, ...])]
    t_dispatch: float


class ModelRunner:
    def __init__(self, config: Config, devices=None):
        import sys

        t_init0 = time.perf_counter()
        marks: list[tuple[str, float]] = []

        def mark(name):
            marks.append((name, time.perf_counter()))

        self.config = config
        if config.compilation_cache_dir:
            import os

            d = config.compilation_cache_dir
            if d == "auto":
                d = os.environ.get(
                    "NVT_CACHE_DIR",
                    os.path.expanduser("~/.cache/nanovllm_tpu/xla"),
                )
            if jax.config.jax_compilation_cache_dir is None:
                os.makedirs(d, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir", d)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1.0
                )
        if config.distributed:
            _init_distributed()
        from nanovllm_tpu.ops.ragged_paged_attention import AttnKnobs

        self.spec = ModelSpec.from_hf(
            config.hf_config, config.tensor_parallel_size, config.dtype,
            attn_knobs=AttnKnobs.resolve(config),
        )
        self.dp = config.data_parallel_size
        self.mesh = make_mesh(config.tensor_parallel_size, devices, self.dp)
        self.attn_impl = self._pick_attn_impl()

        if jax.default_backend() == "tpu":
            # Establish the device->host transfer channel in the background:
            # the tunneled backend's FIRST D2H fetch pays a one-time stall
            # (measured 14-111s; ~98s typical in this environment) that
            # block_until_ready does not absorb.  Overlapping it with host
            # weight init + the parallel compile phase removes it from the
            # cold-start critical path; anything that fetches earlier simply
            # blocks until the channel is up.
            import threading

            def _warm_d2h():
                try:
                    jax.device_get(jnp.zeros((8,), jnp.int32))
                except Exception:  # pragma: no cover - best-effort warm
                    pass

            threading.Thread(target=_warm_d2h, daemon=True).start()

        lm_head_int8 = (
            config.quantization != "none"
            and config.lm_head_dtype in ("auto", "int8")
            and self.attn_impl == "pallas"  # consumed by the fused sampler only
        )
        if config.random_weights:
            from nanovllm_tpu.utils.loader import init_random_params

            params_np = init_random_params(
                0, self.spec,
                distinct_layers=config.random_weights != "fast",
            )
            if config.quant_rotate:
                from nanovllm_tpu.utils.rotation import (
                    apply_incoherence_rotation,
                )

                params_np = apply_incoherence_rotation(params_np, self.spec)
            if config.quantization != "none":
                from nanovllm_tpu.ops.quant_matmul import int4_scheme
                from nanovllm_tpu.utils.loader import quantize_params

                params_np = quantize_params(
                    params_np, config.quantization,
                    config.tensor_parallel_size, lm_head_int8=lm_head_int8,
                    scheme=int4_scheme(config),
                )
        elif config.quant_rotate:
            # incoherence rotation mixes every K row (R^T @ W), which the
            # slice-wise lazy fetches cannot express: eager load + rotate +
            # quantize on the host instead
            from nanovllm_tpu.ops.quant_matmul import int4_scheme
            from nanovllm_tpu.utils.loader import (
                load_qwen3_params,
                quantize_params,
            )
            from nanovllm_tpu.utils.rotation import apply_incoherence_rotation

            params_np = load_qwen3_params(config.model, self.spec)
            params_np = apply_incoherence_rotation(params_np, self.spec)
            if config.quantization != "none":
                params_np = quantize_params(
                    params_np, config.quantization,
                    config.tensor_parallel_size, lm_head_int8=lm_head_int8,
                    scheme=int4_scheme(config),
                )
        else:
            # lazy host-sliced load: each host reads only its own shards of
            # the checkpoint (utils/lazy_loader.py); quantization is applied
            # slice-wise inside the leaf fetches
            from nanovllm_tpu.ops.quant_matmul import int4_scheme
            from nanovllm_tpu.utils.lazy_loader import load_qwen3_params_lazy

            params_np = load_qwen3_params_lazy(
                config.model, self.spec, config.quantization,
                lm_head_int8=lm_head_int8, scheme=int4_scheme(config),
            )
        mark("host_params")  # random init / lazy load + host quantization
        self._pspecs = pspecs_for(params_np)
        self.params = shard_params(params_np, self.mesh)
        del params_np
        # Block on the async H2D transfers here: letting them float into the
        # later phases measured far WORSE on the tunneled backend (kv_alloc
        # stalled 282s when the params transfer, the D2H channel warm, and
        # the zeros program overlapped — the tunnel serializes concurrent
        # traffic badly).  The explicit block keeps the phases clean and is
        # the fastest ordering measured; the D2H channel warm thread still
        # overlaps this window.
        jax.block_until_ready(self.params)
        mark("h2d_params")

        # page-table width pinned to its upper bound: the causal-extent fetch
        # clamp makes padded table entries nearly free, and a varying p_pad
        # would multiply the jit bucket count (every new width = a recompile
        # measured at 7-17s mid-trace)
        bs = config.kvcache_block_size
        self._p_pad = bucket((config.max_model_len + bs - 1) // bs + 1)

        # fixed feedback width: every program's token output is padded to
        # S_CAP lanes so the NEXT program can consume it as its feedback
        # operand regardless of either step's s_pad bucket.  Token outputs
        # (and hence fb) are replicated across dp — every host's scheduler
        # consumes every group's tokens in the lockstep design — so the
        # feedback operand is replicated too.
        self._s_cap = seq_pad(config.max_num_seqs, config.max_num_seqs)
        # Lane tiers whose programs are compiled and safe to route to.
        # None = no restriction (warmup disabled, or every tier warmed);
        # warmup_buckets narrows this to {8, cap} and a background thread
        # re-adds mid tiers as their compiles land (cold-start vs ladder
        # reconciliation — see lane_ladder).
        self._tiers_ready: set[int] | None = None
        self._warm_thread = None
        self._shutdown = False
        self._step = self._build_step()
        self._burst = self._build_burst()
        self._score = self._build_score()
        mark("build")

        if config.num_kvcache_blocks <= 0:
            config.num_kvcache_blocks = self._derive_num_blocks()
        assert config.num_kvcache_blocks > 0
        mark("kv_sizing")  # includes the measure-then-size AOT compile
        self.kv_pages = self._alloc_kv_pages(config.num_kvcache_blocks)
        jax.block_until_ready(self.kv_pages)
        mark("kv_alloc")
        self._fb = self._zeros_global((self.dp, self._s_cap), jnp.int32, P())
        self._fb_lane: dict[int, int] = {}
        self._step_counter = 0
        # rbg = XLA's hardware-backed RngBitGenerator: the sampler draws a
        # Gumbel per (lane, vocab) every decode step (~39M values at the
        # flagship geometry) and threefry spends 0.57 ms/step of pure VPU
        # time on that (measured; see BENCHMARKS.md decode ablation).
        # Only the raw uint32 key DATA is kept: a process-local key array
        # cannot feed a program spanning non-addressable devices, so each
        # program rebuilds the key (wrap + fold_in(step counter)) inside.
        self._key_data = self._put_batch(
            np.asarray(jax.random.key_data(jax.random.key(0, impl="rbg"))),
            leading_dp=False,
        )
        self.stats = None  # EngineStats, attached by LLMEngine

        warm = config.warmup_buckets
        if warm is None:
            warm = jax.default_backend() == "tpu" and not config.enforce_eager
        if warm:
            self.warmup_buckets()
            mark("warmup")
        prev = t_init0
        parts = []
        for name, t in marks:
            parts.append(f"{name}={t - prev:.1f}s")
            prev = t
        print(
            f"[nanovllm_tpu] init phases: {' '.join(parts)} "
            f"(total {time.perf_counter() - t_init0:.1f}s)",
            file=sys.stderr,
        )

    # -- setup ---------------------------------------------------------------

    def _pick_attn_impl(self) -> str:
        impl = self.config.attention_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "ref"
        if impl == "pallas":
            assert self.config.kvcache_block_size % 16 == 0, (
                "pallas paged attention needs kvcache_block_size % 16 == 0"
            )
            if self.config.kv_cache_dtype in ("int8", "int4"):
                # the scale plane [LP, 2kvh, page] keeps pages on the lane
                # axis; its per-page DMA slice must be 128-lane aligned
                assert self.config.kvcache_block_size % 128 == 0, (
                    "quantized KV with pallas attention needs "
                    "kvcache_block_size % 128 == 0"
                )
        return impl

    @property
    def _kv_planes(self) -> int:
        """Data planes per logical page: split-plane caches (bf16/int8) keep
        K in plane 2*gp and V in 2*gp + 1; KV4 packs K and V of a head into
        one byte — a single plane (ops/kv_cache.py)."""
        return 1 if self.config.kv_cache_dtype == "int4" else 2

    def _kv_page_shape(self, num_blocks: int):
        """[planes * dp * L * blocks, page, kvh * hd] — blocks are PER dp
        group.

        dp is folded into the leading flat plane axis (group g owns rows
        [g*planes*LP, (g+1)*planes*LP)) so each shard_map local is exactly
        the 3-D cache the kernels expect — a [dp, LP, ...] layout costs a
        full-cache HBM copy per step, and so does a per-step [.., kvh, hd]
        -> [.., kvh*hd] reshape (XLA tiles HBM arrays; see ops/kv_cache.py).
        """
        s = self.spec
        return (
            self._kv_planes * self.dp * s.num_layers * num_blocks,
            self.config.kvcache_block_size,
            s.kv_heads_l * s.tp_size * s.head_dim,  # global kvh * hd
        )

    @property
    def _kv_int8(self) -> bool:
        """Quantized KV cache with a scale plane (int8 or int4-packed)."""
        return self.config.kv_cache_dtype in ("int8", "int4")

    def _kv_pspec(self):
        if self._kv_int8:
            return {"data": kv_pspec(), "scale": P(DP_AXIS, TP_AXIS, None)}
        return kv_pspec()

    def _zeros_global(self, shape, dtype, spec):
        """Sharded zeros materialized shard-by-shard on the global mesh.

        jit-with-out_shardings never builds the full array on one device
        (a plain device_put(jnp.zeros(...)) does — a transient full-size
        HBM spike for the KV cache) and works on multi-host meshes where
        device_put onto non-addressable devices is not allowed.
        """
        sharding = NamedSharding(self.mesh, spec)
        return jax.jit(
            lambda: jnp.zeros(shape, dtype), out_shardings=sharding
        )()

    def _alloc_kv_pages(self, num_blocks: int):
        shape = self._kv_page_shape(num_blocks)
        if self._kv_int8:
            return {
                "data": self._zeros_global(shape, jnp.int8, kv_pspec()),
                # [dp*LP, 2kvh, page]: ONE scale plane per logical page
                # with page on lanes (a [.., page, 2kvh] layout lane-pads
                # 2kvh up to 128 = 8x HBM blowup); ALWAYS 2kvh rows — K and
                # V each get a scale row whatever the data-plane packing
                "scale": self._zeros_global(
                    (shape[0] // self._kv_planes,
                     2 * self.spec.num_kv_heads, shape[1]),
                    jnp.float32,
                    P(DP_AXIS, TP_AXIS, None),
                ),
            }
        return self._zeros_global(
            shape, jnp.dtype(self.spec.dtype), kv_pspec()
        )

    def _derive_num_blocks(self) -> int:
        """Size the KV cache from per-device free HBM, like the reference's
        allocate_kv_cache (model_runner.py:352-366) but via PJRT memory stats."""
        s = self.spec
        # int8 KV: 1 byte/element + 4-byte scale per (slot, head);
        # int4 KV: half a byte/element + the same scale
        if self._kv_int8:
            per_el = 1 if self.config.kv_cache_dtype == "int8" else 0.5
            slot_head_bytes = int(s.head_dim * per_el) + 4
        else:
            slot_head_bytes = s.head_dim * _dtype_size(s.dtype)
        block_bytes_per_dev = (
            s.num_layers
            * self.config.kvcache_block_size
            * 2 * s.kv_heads_l
            * slot_head_bytes
        )
        dev = self.mesh.devices.flat[0]
        stats = {}
        try:
            stats = dev.memory_stats() or {}
        except Exception:
            pass
        limit = stats.get("bytes_limit", 0)
        in_use = stats.get("bytes_in_use", 0)
        if not limit and dev.platform == "tpu":
            # some PJRT transports (axon tunnel) report no memory stats:
            # fall back to the known per-chip HBM of the device kind and
            # charge the parameters we just placed.
            hbm_table = {
                "TPU v4": 32, "TPU v5 lite": 16, "TPU v5": 95,
                "TPU v5p": 95, "TPU v6 lite": 32, "TPU v6e": 32,
            }
            gib = next(
                (v for k, v in hbm_table.items() if dev.device_kind.startswith(k)),
                16,
            )
            limit = gib * (1 << 30)
            in_use = sum(
                x.size * x.dtype.itemsize for x in jax.tree.leaves(self.params)
            ) // self.spec.tp_size
        if not limit:
            # CPU / unknown backend: enough for the configured worst case,
            # capped to keep host tests light.
            want = self.config.max_num_seqs * (
                (self.config.max_model_len + self.config.kvcache_block_size - 1)
                // self.config.kvcache_block_size
            )
            return min(want, 4096)
        budget = int(limit * self.config.gpu_memory_utilization) - in_use
        # analytic guess (only used to shape the measuring compile, and as
        # the fallback when the backend cannot report memory analysis):
        # ~4 fp32 [S, vocab] tensors live at the sampler peak
        t_max = self.config.max_num_batched_tokens
        act_reserve = 4 * t_max * s.hidden_size * _dtype_size(s.dtype) * 8
        logits_reserve = 6 * min(self.config.max_num_seqs, 512) * s.vocab_l * 4
        guess = (budget - act_reserve - logits_reserve - 512 * (1 << 20)) \
            // block_bytes_per_dev
        assert guess > 0, (
            f"no HBM left for KV cache: limit={limit} in_use={in_use} "
            f"block_bytes={block_bytes_per_dev}"
        )
        extra = self._measured_reserve(int(guess))
        if extra is None:
            return int(guess)
        # measure-then-size (the reference warms up and measures actual peak
        # before sizing, model_runner.py:290-317 — this is the AOT analogue):
        # everything beyond params+KV comes from the compiled program's own
        # accounting; the only allowance left is an allocator-slack margin.
        margin = max(128 << 20, limit // 100)
        num = (budget - extra - margin) // block_bytes_per_dev
        import sys

        print(
            f"[nanovllm_tpu] KV sizing: limit={limit >> 20}MiB "
            f"weights+state={in_use >> 20}MiB measured_step_extra={extra >> 20}MiB "
            f"-> {num} blocks ({num * block_bytes_per_dev >> 20}MiB/dev; "
            f"analytic guess was {guess})",
            file=sys.stderr,
        )
        assert num > 0, (
            f"no HBM left for KV cache after measured reserve: limit={limit} "
            f"in_use={in_use} extra={extra}"
        )
        return int(num)

    def _measured_reserve(self, num_blocks: int):
        """Device-memory need of the largest step program beyond params + KV.

        AOT-lowers and compiles the biggest (s_pad, t_pad) layout against a
        candidate KV shape and reads ``compiled.memory_analysis()``: temps
        (activations, logits, sampler state) + non-aliased outputs + program
        code.  Temps do not depend on the KV page count (the cache is a
        donated argument), so one compile sizes any final num_blocks.
        Returns None when the backend cannot report memory analysis.
        """
        try:
            s_pad = self._s_cap
            ps = round_up(s_pad, PREFILL_TILE)
            t = bucket(max(self.config.max_num_batched_tokens, ps + PREFILL_TILE))
            layout = (s_pad, ps, t, s_pad, self._p_pad)
            (kv_sds, packed_sds, fb_sds, kd_sds, ctr_sds), segments = \
                self._abstract_step_operands(layout, num_blocks)
            compiled = self._step.lower(
                self.params, kv_sds, packed_sds, fb_sds, kd_sds, ctr_sds,
                segments,
            ).compile()
            mem = compiled.memory_analysis()
            return int(
                mem.temp_size_in_bytes
                + mem.output_size_in_bytes
                - mem.alias_size_in_bytes
                + mem.generated_code_size_in_bytes
            )
        except Exception as e:  # pragma: no cover - backend capability probe
            import sys

            print(
                f"[nanovllm_tpu] measured KV sizing unavailable ({e!r}); "
                "using the analytic reserve",
                file=sys.stderr,
            )
            return None

    @staticmethod
    def _dp_split(tree):
        """Strip the local leading dp axis (size 1 inside shard_map)."""
        return jax.tree.map(lambda a: a[0], tree)

    def _build_step(self):
        spec = self.spec
        attn_impl = self.attn_impl
        pspecs = self._pspecs
        kvspec = self._kv_pspec()
        packed_specs = PackedBatch(*([P(DP_AXIS)] * len(PackedBatch._fields)))
        mesh = self.mesh
        split = self._dp_split
        s_cap = self._s_cap

        @functools.partial(jax.jit, static_argnums=(6,), donate_argnums=(1,))
        def step(params, kv_pages, packed, fb, kd, ctr, segments):
            def local(params, kv_pages, packed, fb, kd, ctr):
                # kv arrives as the group's own flat 4-D shard; only the
                # small batch arrays carry an explicit leading dp axis
                g = lax.axis_index(DP_AXIS)
                key = jax.random.fold_in(
                    jax.random.wrap_key_data(kd, impl="rbg"), ctr
                )
                key = jax.random.fold_in(key, g)
                batch = split(packed).unpack()
                # async scheduling: rows whose input token is still on device
                # read it from the previous program's output (fb_idx = lane)
                fbv = fb[g]
                batch = batch._replace(token_ids=jnp.where(
                    batch.fb_idx >= 0,
                    fbv[jnp.clip(batch.fb_idx, 0, fbv.shape[0] - 1)],
                    batch.token_ids,
                ))
                tokens, kv = forward_and_sample(
                    params, kv_pages, batch, key,
                    spec, TP_AXIS, attn_impl, segments=segments,
                )
                # pad to the fixed feedback width (next program's fb operand)
                # and replicate across dp: every host's scheduler consumes
                # every group's tokens (lockstep design), and a dp-sharded
                # output could not even be fetched by a host that does not
                # address the other group's devices
                tokens = jnp.pad(tokens, (0, s_cap - tokens.shape[0]))
                return lax.all_gather(tokens, DP_AXIS), kv

            fn = _shard_map(
                local,
                mesh=mesh,
                in_specs=(pspecs, kvspec, packed_specs, P(), P(), P()),
                out_specs=(P(), kvspec),
                check_vma=False,
            )
            return fn(params, kv_pages, packed, fb, kd, ctr)

        return step

    def _build_score(self):
        """Scoring program: per-row target logprobs instead of sampling."""
        spec = self.spec
        attn_impl = self.attn_impl
        pspecs = self._pspecs
        kvspec = self._kv_pspec()
        packed_specs = PackedBatch(*([P(DP_AXIS)] * len(PackedBatch._fields)))
        mesh = self.mesh
        split = self._dp_split

        @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(1,))
        def score(params, kv_pages, packed, targets, segments):
            def local(params, kv_pages, packed, targets):
                lps, kv = forward_and_score(
                    params, kv_pages, split(packed).unpack(),
                    targets[0], spec, TP_AXIS, attn_impl, segments=segments,
                )
                # replicate across dp (see _build_step)
                return lax.all_gather(lps, DP_AXIS), kv

            fn = _shard_map(
                local,
                mesh=mesh,
                in_specs=(pspecs, kvspec, packed_specs, P(DP_AXIS)),
                out_specs=(P(), kvspec),
                check_vma=False,
            )
            return fn(params, kv_pages, packed, targets)

        return score

    def _group_indices(self, seqs: list[Sequence]) -> list[list[int]]:
        return [
            [i for i, s in enumerate(seqs) if s.dp_group == g]
            for g in range(self.dp)
        ]

    def _stack_packed(self, per_group_batches) -> PackedBatch:
        packed = [PackedBatch.pack(b) for b in per_group_batches]
        return PackedBatch(*[
            np.stack([getattr(p, f) for p in packed])
            for f in PackedBatch._fields
        ])

    def _put_batch(self, tree, leading_dp: bool = True):
        """Host numpy pytree -> device arrays.

        Single host: plain transfers (jit reshards per in_specs).  Multi-host
        (jax.distributed): every host builds the identical global batch, and
        each places only its addressable shards of the dp-sharded global
        array.
        """
        if jax.process_count() == 1:
            return jax.tree.map(jnp.asarray, tree)

        def put(a):
            spec = P(DP_AXIS) if leading_dp else P()
            sharding = NamedSharding(self.mesh, spec)
            return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])

        return jax.tree.map(put, tree)

    def _ctr(self, n: int):
        """Step counter as a replicated scalar operand (the per-program PRNG
        key is derived from it inside the program — see _key_data)."""
        return self._put_batch(np.asarray(n, np.int32), leading_dp=False)

    def run_score(self, seqs: list[Sequence]):
        """One scoring step over the scheduled chunks, batched across lanes
        AND dp groups; returns (lps [dp, T_pad], group_batches, group_idx).

        ``seqs`` may hold many documents with any dp_group assignment; each
        group's documents pack into one multi-lane prefill batch (the layout
        machinery in engine/batch.py), and groups run concurrently on their
        own chips — vs the retired one-doc/one-group path that serialized a
        WikiText eval document-by-document.  The target of each row is its
        sequence's NEXT token (teacher forcing); rows whose position is the
        last token of their sequence get target 0 and must be ignored by the
        caller.  ``group_idx[g]`` maps group g's lane order back to positions
        in ``seqs``.
        """
        bs = self.config.kvcache_block_size
        group_idx = self._group_indices(seqs)
        # one forced layout across groups (dp-stacked shapes must agree)
        layouts = [step_layout([seqs[i] for i in g], bs) for g in group_idx]
        layout = merge_layouts(layouts)[:4] + (self._p_pad,)
        group_batches, targets_list = [], []
        segments = layout[:3]
        for g in group_idx:
            gseqs = [seqs[i] for i in g]
            batch_np, _, segments = prepare_step_batch(gseqs, bs, layout)
            targets = np.zeros_like(batch_np.token_ids)
            if gseqs:
                # vectorized target gather (a per-row python loop measured
                # ~O(10 ms) per 8k-row step): pad token ids to a [n, max+1]
                # matrix, then targets = tok[lane, pos + 1] where valid
                lens = np.asarray([len(s) for s in gseqs], np.int64)
                tok = np.zeros((len(gseqs), int(lens.max()) + 1), np.int32)
                for li, seq in enumerate(gseqs):
                    tok[li, : len(seq)] = seq.token_ids
                lane = batch_np.token_seq
                # pad lanes carry their own index up to s_pad: clip before
                # indexing (they are masked out by slot_mapping == -1 anyway)
                lane_c = np.minimum(lane, len(gseqs) - 1)
                nxt = batch_np.positions + 1
                valid = (
                    (batch_np.slot_mapping >= 0)
                    & (lane < len(gseqs))
                    & (nxt < lens[lane_c])
                    & (nxt > 0)
                )
                targets[valid] = tok[lane_c[valid], nxt[valid]]
            group_batches.append(batch_np)
            targets_list.append(targets)
        packed = self._put_batch(self._stack_packed(group_batches))
        lps_dev, self.kv_pages = self._score(
            self.params, self.kv_pages, packed,
            self._put_batch(np.stack(targets_list)), segments,
        )
        return np.asarray(jax.device_get(lps_dev)), group_batches, group_idx

    def _build_burst(self):
        """W decode steps in one device program: lax.scan over the full
        forward+sample, feeding each step's sampled token to the next.

        This amortizes the per-step host round-trip (the single-controller
        analogue of the reference replaying pre-captured CUDA decode graphs,
        model_runner.py:570-600) and additionally removes the host from the
        token feedback loop entirely for W-1 of every W tokens.
        """
        spec = self.spec
        attn_impl = self.attn_impl
        block_size = self.config.kvcache_block_size
        pspecs = self._pspecs
        kvspec = self._kv_pspec()
        meta_specs = BurstMeta(*([P(DP_AXIS)] * len(BurstMeta._fields)))
        mesh = self.mesh
        split = self._dp_split

        s_cap = self._s_cap

        @functools.partial(jax.jit, static_argnums=(6,), donate_argnums=(1,))
        def burst(params, kv_pages, meta, fb, kd, ctr, w):
            def local(params, kv_pages, meta, fb, kd, ctr):
                g = lax.axis_index(DP_AXIS)
                key = jax.random.fold_in(
                    jax.random.wrap_key_data(kd, impl="rbg"), ctr
                )
                key = jax.random.fold_in(key, g)
                meta = split(meta)
                fbv = fb[g]
                fb_idx = meta.tp[2]
                tokens0 = jnp.where(
                    fb_idx >= 0,
                    fbv[jnp.clip(fb_idx, 0, fbv.shape[0] - 1)],
                    meta.tp[0],
                )
                pos0 = meta.tp[1]
                s = tokens0.shape[0]
                lane = jnp.arange(s, dtype=jnp.int32)
                valid = pos0 >= 0
                segments = (s, s, s)  # all rows are the decode segment

                def body(carry, i):
                    toks, pages = carry
                    pos = jnp.maximum(pos0 + i, 0)
                    slot = jnp.where(
                        valid,
                        meta.pages[lane, pos // block_size] * block_size
                        + pos % block_size,
                        -1,
                    )
                    batch = StepBatch(
                        token_ids=toks,
                        positions=pos,
                        slot_mapping=slot,
                        token_seq=lane,
                        fb_idx=jnp.full_like(lane, -1),  # resolved at burst entry
                        # pad lanes get kv_len 0: the decode kernel's causal
                        # limit hits 0 and skips them (no fetch, no compute)
                        kv_lens=jnp.where(valid, pos + 1, 0),
                        page_indices=meta.pages,
                        logits_indices=lane,
                        temperatures=meta.temps,
                    )
                    toks2, pages = forward_and_sample(
                        params, pages, batch, jax.random.fold_in(key, i),
                        spec, TP_AXIS, attn_impl, segments=segments,
                    )
                    return (toks2, pages), toks2

                (toks_last, kv_pages_out), tokens_ws = lax.scan(
                    body, (tokens0, kv_pages), jnp.arange(w, dtype=jnp.int32)
                )
                fb_out = jnp.pad(toks_last, (0, s_cap - s))
                # replicate across dp (see _build_step)
                return (
                    lax.all_gather(tokens_ws, DP_AXIS),
                    lax.all_gather(fb_out, DP_AXIS),
                    kv_pages_out,
                )

            fn = _shard_map(
                local,
                mesh=mesh,
                in_specs=(pspecs, kvspec, meta_specs, P(), P(), P()),
                out_specs=(P(), P(), kvspec),
                check_vma=False,
            )
            return fn(params, kv_pages, meta, fb, kd, ctr)

        return burst

    def _warmup_seqs(self, layout: tuple[int, ...]) -> list[Sequence]:
        """Synthetic sequences giving a warmup batch real work under
        ``layout``: one live decode row and (when the layout has a prefill
        segment) one chunk spanning as much of it as the KV pool allows."""
        dec_end, p_start, p_end, s_pad, p_pad = layout
        bs = self.config.kvcache_block_size
        pages_avail = max(min(self.config.num_kvcache_blocks, p_pad), 1)
        seqs = []
        d = Sequence([1, 1], block_size=bs)
        d.num_cached_tokens, d.num_new_tokens = 1, 1
        d.block_table = [0]
        seqs.append(d)
        n_new = min(p_end - p_start, pages_avail * bs)
        if n_new > 0:
            p = Sequence([1] * n_new, block_size=bs)
            p.num_new_tokens = n_new
            p.block_table = list(range((n_new + bs - 1) // bs))
            seqs.append(p)
        return seqs

    def _abstract_step_operands(self, layout, num_blocks: int | None = None):
        """ShapeDtypeStructs matching a real step call under ``layout``
        (shared helper of _measured_reserve and the parallel pre-compile).

        The sds shardings must reproduce the CALL-TIME jit cache key exactly,
        or the AOT compile seeds a cache entry the real call never hits (and
        every program compiles twice — measured as a 2.7x warmup regression
        at the 8B geometry).  Single-host, ``_put_batch`` produces
        UNCOMMITTED arrays (plain jnp.asarray), which key as unspecified
        shardings — so batch operands get NO sharding here.  kv/fb come from
        ``_zeros_global`` (committed NamedSharding) and keep theirs.
        Multi-host, ``_put_batch`` commits via make_array_from_callback, so
        everything carries its NamedSharding.
        """
        if num_blocks is None:
            num_blocks = self.config.num_kvcache_blocks
        bs = self.config.kvcache_block_size
        batch_np, _, segments = prepare_step_batch([], bs, layout)
        stacked = self._stack_packed([batch_np] * self.dp)
        multi = jax.process_count() > 1

        def sds(shape, dtype, spec):
            return jax.ShapeDtypeStruct(
                shape, dtype, sharding=NamedSharding(self.mesh, spec)
            )

        def sds_put(shape, dtype, spec):
            """Operand that the real call feeds through _put_batch."""
            if multi:
                return sds(shape, dtype, spec)
            return jax.ShapeDtypeStruct(shape, dtype)

        packed_sds = PackedBatch(*[
            sds_put(getattr(stacked, f).shape, getattr(stacked, f).dtype,
                    P(DP_AXIS))
            for f in PackedBatch._fields
        ])
        kv_shape = self._kv_page_shape(num_blocks)
        if self._kv_int8:
            kv_sds = {
                "data": sds(kv_shape, jnp.int8, kv_pspec()),
                "scale": sds(
                    (kv_shape[0] // self._kv_planes,
                     2 * self.spec.num_kv_heads, kv_shape[1]),
                    jnp.float32, P(DP_AXIS, TP_AXIS, None),
                ),
            }
        else:
            kv_sds = sds(kv_shape, jnp.dtype(self.spec.dtype), kv_pspec())
        fb_sds = sds((self.dp, self._s_cap), jnp.int32, P())
        kd_sds = sds_put((4,), jnp.uint32, P())
        ctr_sds = sds_put((), jnp.int32, P())
        return (kv_sds, packed_sds, fb_sds, kd_sds, ctr_sds), segments

    def _precompile_parallel(self, layouts, w: int) -> float:
        """Compile every warmup program concurrently (thread pool).

        ``lower().compile()`` populates the PERSISTENT compilation cache (not
        the jit call cache), so the serial first-execution loop afterwards
        deserializes instead of compiling.  Compilation runs backend-side
        (remote through the axon tunnel), so threads spend their time waiting
        on RPC — measured 584s of serial compiles at the 8B geometry for 15
        programs; parallel brings the compile phase down to roughly the
        slowest single program.  Failures fall back silently to the serial
        path (the executing loop compiles whatever is missing).
        """
        from concurrent.futures import ThreadPoolExecutor

        if not jax.config.jax_compilation_cache_dir:
            import sys

            print(
                "[nanovllm_tpu] warning: jax_compilation_cache_dir is unset —"
                " the parallel-compile phase cannot hand its executables to"
                " the serial warmup, so every program will compile twice"
                " (set compilation_cache_dir to roughly halve cold start)",
                file=sys.stderr,
            )
        t0 = time.perf_counter()
        params_sds = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding),
            self.params,
        )

        def compile_step(layout):
            (kv_sds, packed_sds, fb_sds, kd_sds, ctr_sds), segments = \
                self._abstract_step_operands(layout)
            self._step.lower(
                params_sds, kv_sds, packed_sds, fb_sds, kd_sds, ctr_sds,
                segments,
            ).compile()

        def compile_burst(s):
            multi = jax.process_count() > 1

            def sds_np(a):
                if multi:  # mirror _put_batch commitment (see
                    #          _abstract_step_operands docstring)
                    return jax.ShapeDtypeStruct(
                        a.shape, a.dtype,
                        sharding=NamedSharding(self.mesh, P(DP_AXIS)),
                    )
                return jax.ShapeDtypeStruct(a.shape, a.dtype)

            meta_sds = BurstMeta(
                tp=sds_np(np.zeros((self.dp, 3, s), np.int32)),
                pages=sds_np(np.zeros((self.dp, s, self._p_pad), np.int32)),
                temps=sds_np(np.zeros((self.dp, s), np.float32)),
            )
            (kv_sds, _, fb_sds, kd_sds, ctr_sds), _ = \
                self._abstract_step_operands(
                    (s, s, s, s, self._p_pad))
            self._burst.lower(
                params_sds, kv_sds, meta_sds, fb_sds, kd_sds, ctr_sds, w,
            ).compile()

        jobs = [(compile_step, l) for l in layouts]
        if w >= 2:
            jobs += [(compile_burst, s) for s in sorted({l[3] for l in layouts})]
        errs = []
        with ThreadPoolExecutor(max_workers=min(8, len(jobs))) as pool:
            futs = [pool.submit(fn, arg) for fn, arg in jobs]
            for f in futs:
                try:
                    f.result()
                except Exception as e:  # pragma: no cover - fallback probe
                    errs.append(e)
        if errs:
            import sys

            print(
                f"[nanovllm_tpu] parallel pre-compile: {len(errs)}/{len(jobs)}"
                f" failed ({errs[0]!r}); serial warmup will compile them",
                file=sys.stderr,
            )
        return time.perf_counter() - t0

    def warmup_buckets(self) -> None:
        """First-execute the whole step/burst program ladder.

        Every distinct (s_pad, t_pad) layout is a separate XLA program whose
        first execution pays compile + device load (10-18s each through a
        tunneled backend) — paying that mid-serving wrecks tail latency.
        This is the analogue of the reference capturing every CUDA decode
        graph at init (reference model_runner.py:640-715, bs ladder :686).
        Compilation of all programs runs first, in parallel (see
        _precompile_parallel); the serial loop below then pays only
        executable load + first execution per program.
        Warmup batches carry REAL work (live slots, real page tables,
        positive kv_lens spanning the whole token segment): executing a
        program with inert data (all slots -1, kv_len 0 — every kernel loop
        at zero trips) does NOT absorb the one-time first-execution cost;
        measured 14-74s on the first non-inert execution of each prefill
        program even after an inert warmup run.  Pages 0..k receive garbage
        K/V, which is safe at init: no request has been admitted, and every
        page is fully rewritten before it is ever read once allocated.
        """
        import sys

        bs = self.config.kvcache_block_size
        s_cap = self.config.max_num_seqs
        ladder = lane_ladder(s_cap)
        # Serving readiness needs only the smallest and largest tiers: every
        # step routes to the nearest READY tier (seq_pad(tiers=...)), so mid
        # tiers are a perf refinement, not a correctness requirement.  They
        # compile in a background thread after this returns and join
        # _tiers_ready as they land (their first real execution pays only
        # executable load, ~0.5s — compile is the 10-18s part).  Rationale:
        # the full power-of-two ladder at cap 256 is ~40 programs; warming
        # all of them doubled the driver-recorded cold start in round 3.
        eager_tiers = {ladder[0], ladder[-1]}
        s_pads = sorted(eager_tiers)
        self._bg_tiers = [s for s in ladder if s not in eager_tiers]
        t_max = bucket(max(self.config.max_num_batched_tokens, PREFILL_TILE))

        def tier_layouts(s):
            out = [(s, s, s, s, self._p_pad)]  # pure-decode step
            ps = round_up(s, PREFILL_TILE)
            t = bucket(ps + PREFILL_TILE)
            while t <= t_max:
                out.append((s, ps, t, s, self._p_pad))  # prefill/mixed
                t *= 2
            return out

        self._tier_layouts = tier_layouts
        layouts = [l for s in s_pads for l in tier_layouts(s)]
        w_pow = self.config.decode_burst
        if w_pow >= 2:
            w_pow = 1 << (w_pow.bit_length() - 1)
        # The parallel phase runs even on a warm persistent cache: its
        # lower().compile() calls seed the jit executable cache directly, so
        # the serial loop below is near-free (3-8s for 15 programs).  A
        # skip-when-warm marker was tried and measured WORSE (the serial jit
        # calls then pay trace + deserialize one by one: 149s vs 44+5s warm
        # at 0.6B) — concurrent re-trace + cache-deserialize is the fastest
        # known path for both cold and warm starts.
        t_compile = self._precompile_parallel(layouts, w_pow)
        t0 = time.perf_counter()
        for layout in layouts:
            seqs = self._warmup_seqs(layout)
            batches = [prepare_step_batch(seqs, bs, layout)[0]] * self.dp
            segments = layout[:3]
            packed = self._put_batch(self._stack_packed(batches))
            tokens, self.kv_pages = self._step(
                self.params, self.kv_pages, packed, self._fb,
                self._key_data, self._ctr(0), segments,
            )
            jax.block_until_ready(tokens)
        w = w_pow
        if w >= 2:
            for s in s_pads:
                tp = np.zeros((self.dp, 3, s), np.int32)
                tp[:, 1] = -1  # pad lanes inert
                tp[:, 2] = -1  # no feedback
                tp[:, 0, 0] = 1
                tp[:, 1, 0] = 0  # lane 0 live: decode at position 0, page 0
                meta = self._put_batch(BurstMeta(
                    tp=tp,
                    pages=np.zeros((self.dp, s, self._p_pad), np.int32),
                    temps=np.zeros((self.dp, s), np.float32),
                ))
                tokens, _fb_out, self.kv_pages = self._burst(
                    self.params, self.kv_pages, meta, self._fb,
                    self._key_data, self._ctr(0), w,
                )
                jax.block_until_ready(tokens)
        # One real D2H transfer: the tunnel's FIRST device->host fetch in a
        # process pays a one-time 14-111s channel-establishment stall
        # (measured; block_until_ready does not absorb it — only an actual
        # transfer does).  Without this, the first serving step eats it.
        jax.device_get(tokens)
        print(
            f"[nanovllm_tpu] warmed {len(layouts)} step + "
            f"{len(s_pads) if w >= 2 else 0} burst programs: "
            f"parallel compile {t_compile:.1f}s + "
            f"load/first-run {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
        self._tiers_ready = set(s_pads)
        if self._bg_tiers and jax.process_count() == 1:
            # Mid tiers compile off the serving path.  Multi-process engines
            # skip this: every controller must dispatch identical programs,
            # and per-process readiness timing would diverge the routing —
            # they warm the full ladder eagerly instead.
            import threading

            self._warm_thread = threading.Thread(
                target=self._warm_mid_tiers, args=(w_pow,), daemon=True,
                name="nvt-warm-tiers",
            )
            self._warm_thread.start()
        elif self._bg_tiers:
            mid = [l for s in self._bg_tiers for l in tier_layouts(s)]
            self._precompile_parallel(mid, w_pow)
            self._tiers_ready = set(self._tiers_ready) | set(self._bg_tiers)

    def _warm_mid_tiers(self, w_pow: int) -> None:
        """Background compile of the mid lane tiers, smallest first (the
        drain regime empties lanes downward).  Each tier joins _tiers_ready
        as soon as ITS programs are compiled; its first execution pays only
        executable load (~0.5s), taken as a one-time blip on the serving
        path instead of 10-18s/program of cold start.  Compile-only: a
        background warmup EXECUTION would scribble garbage K/V into pages
        that may by then belong to live requests."""
        import sys

        t0 = time.perf_counter()
        for s in self._bg_tiers:
            if self._shutdown:
                return
            try:
                self._precompile_parallel(self._tier_layouts(s), w_pow)
            except RuntimeError:
                # interpreter shutdown while compiles were in flight
                return
            except Exception as e:  # pragma: no cover - compile-path fallback
                print(
                    f"[nanovllm_tpu] background tier {s} compile failed "
                    f"({e!r}); steps keep routing around it",
                    file=sys.stderr,
                )
                continue
            # copy-on-write: readers hold a stable set (no lock needed)
            self._tiers_ready = set(self._tiers_ready) | {s}
        print(
            f"[nanovllm_tpu] background tier compile done: ladder "
            f"{sorted(self._tiers_ready)} ready "
            f"({time.perf_counter() - t0:.1f}s)",
            file=sys.stderr,
        )

    def wait_warm(self) -> None:
        """Block until the background tier compile (if any) finishes.

        Offline benchmarks call this between init and their timed section so
        mid-tier compile RPCs don't contend with measurement (observed -35%
        tok/s when they overlap); a serving deployment instead starts at
        init-ready and absorbs the per-tier first-load blips."""
        if self._warm_thread is not None:
            self._warm_thread.join()
            self._warm_thread = None

    def release(self) -> None:
        """Drop the device-array references (KV cache, params, feedback) so
        their HBM is reclaimed — LLMEngine.exit()'s data-plane half.  The
        background warm thread is told to stop at its next tier boundary
        (joining it could block teardown on a multi-second compile RPC)."""
        self._shutdown = True
        self._warm_thread = None
        self.kv_pages = None
        self.params = None
        self._fb = None

    # -- per-step execution ---------------------------------------------------

    def run_async(self, seqs: list[Sequence], kind: str = "step") -> StepHandle:
        """Dispatch one step WITHOUT fetching its results.

        Rows whose input token is a device-pending placeholder read it from
        the previous program's output via the feedback operand — no host
        round-trip sits between consecutive dispatched programs."""
        t0 = time.perf_counter()
        bs = self.config.kvcache_block_size
        groups = self._group_indices(seqs)
        s_cap = self.config.max_num_seqs
        layout = merge_layouts(
            [step_layout([seqs[i] for i in grp], bs, s_cap,
                         tiers=self._tiers_ready) for grp in groups]
        )
        layout = layout[:4] + (self._p_pad,)
        batches, sampled, lane_of = [], [], {}
        for g, grp in enumerate(groups):
            b, samp_local, segments = prepare_step_batch(
                [seqs[i] for i in grp], bs, layout, fb_lane=self._fb_lane
            )
            batches.append(b)
            sampled.extend(grp[j] for j in samp_local)
            for lane, i in enumerate(grp):
                lane_of[i] = (g, lane)
        packed = self._put_batch(self._stack_packed(batches))
        ctr = self._ctr(self._step_counter)
        self._step_counter += 1
        tokens_dev, self.kv_pages = self._step(
            self.params, self.kv_pages, packed, self._fb,
            self._key_data, ctr, segments,
        )
        self._fb = tokens_dev
        self._fb_lane = {
            seqs[i].seq_id: lane_of[i][1] for i in range(len(seqs))
        }
        if self.stats is not None:
            self.stats.add(kind, "prep", time.perf_counter() - t0)
        return StepHandle(
            seqs=seqs, tokens_dev=tokens_dev, sampled=sampled, lane_of=lane_of,
            kind=kind, w=0, pending=[], t_dispatch=time.perf_counter(),
        )

    def run_burst_async(self, seqs: list[Sequence], w: int) -> StepHandle:
        """Dispatch a W-step decode burst without fetching its results."""
        t0 = time.perf_counter()
        groups = self._group_indices(seqs)
        s_pad = seq_pad(max(len(grp) for grp in groups),
                        self.config.max_num_seqs, tiers=self._tiers_ready)
        p_pad = self._p_pad
        tp = np.zeros((self.dp, 3, s_pad), np.int32)
        tp[:, 1] = -1  # pad lanes: no KV write
        tp[:, 2] = -1  # no feedback: use tp[0]
        pages = np.zeros((self.dp, s_pad, p_pad), np.int32)
        temps = np.zeros((self.dp, s_pad), np.float32)
        lane_of = {}
        for g, grp in enumerate(groups):
            for lane, i in enumerate(grp):
                seq = seqs[i]
                if seq.num_pending:
                    assert seq.seq_id in self._fb_lane, (
                        "pending token with no feedback lane"
                    )
                    tp[g, 2, lane] = self._fb_lane[seq.seq_id]
                else:
                    tp[g, 0, lane] = seq.last_token
                tp[g, 1, lane] = len(seq) - 1
                pages[g, lane, : len(seq.block_table)] = seq.block_table
                temps[g, lane] = seq.temperature
                lane_of[i] = (g, lane)
        meta = self._put_batch(BurstMeta(tp=tp, pages=pages, temps=temps))
        ctr = self._ctr(self._step_counter)
        self._step_counter += 1
        tokens_dev, fb_dev, self.kv_pages = self._burst(
            self.params, self.kv_pages, meta, self._fb,
            self._key_data, ctr, w,
        )
        self._fb = fb_dev
        self._fb_lane = {
            seqs[i].seq_id: lane_of[i][1] for i in range(len(seqs))
        }
        if self.stats is not None:
            self.stats.add("burst", "prep", time.perf_counter() - t0)
        return StepHandle(
            seqs=seqs, tokens_dev=tokens_dev, sampled=list(range(len(seqs))),
            lane_of=lane_of, kind="burst", w=w, pending=[],
            t_dispatch=time.perf_counter(),
        )

    def resolve(self, handle: StepHandle) -> np.ndarray:
        """Fetch a dispatched step's tokens: [dp, S_CAP] or [dp, w, s_pad]."""
        tokens = np.asarray(jax.device_get(handle.tokens_dev))
        if self.stats is not None:
            n = len(handle.sampled) * max(handle.w, 1)
            self.stats.add(
                handle.kind, "device", time.perf_counter() - handle.t_dispatch, n
            )
        return tokens

    def run(self, seqs: list[Sequence], kind: str = "step") -> tuple[list[int], list[int]]:
        """Execute one step synchronously; returns (token ids, seq indices)."""
        h = self.run_async(seqs, kind)
        tokens = self.resolve(h)
        out = []
        for i in h.sampled:
            g, lane = h.lane_of[i]
            out.append(int(tokens[g, lane]))
        return out, h.sampled

    def run_burst(self, seqs: list[Sequence], w: int) -> list[list[int]]:
        """Execute a W-step decode burst; returns tokens as [w][len(seqs)]."""
        h = self.run_burst_async(seqs, w)
        tokens = self.resolve(h)  # [dp, w, s_pad]
        return [
            [int(tokens[h.lane_of[i][0], step, h.lane_of[i][1]])
             for i in range(len(seqs))]
            for step in range(w)
        ]
