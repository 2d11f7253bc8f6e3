"""Qwen3 (GQA + QK-Norm) — functional JAX model.

Capability parity with the reference's single model family (reference
models/qwen3.py:444-533): grouped-query attention with per-head QK RMSNorm,
rotate-half RoPE, SwiGLU MLP, pre-norm residual structure, tied embeddings
support.  Redesigned TPU-first:

  * Parameters are a pytree with layer weights *stacked* on axis 0 and the
    forward pass runs ``lax.scan`` over layers — one traced layer body instead
    of N, which keeps XLA compile time flat in depth.
  * Tensor parallelism is expressed as local-shard code inside ``shard_map``:
    every function here takes *local* shards and uses ``lax.psum`` where the
    reference used NCCL all_reduce (linear.py:410, embed_head.py:130).  With
    ``axis_name=None`` the same code runs unsharded.
  * Attention metadata arrives as an explicit pytree argument (StepBatch) —
    the reference's module-global Context (context.py) exists only to satisfy
    CUDA-Graph signatures and has no reason to exist under jit.

Weight layout (local shard shapes; ``_l`` = divided by tp):
  embed      [V_l, H]          vocab-sharded rows
  qkv        [H, (q+2kv)_l]    column-parallel, packed [q_s|k_s|v_s] per shard
  q_norm     [hd], k_norm [hd] replicated
  o          [q_l, H]          row-parallel (psum after)
  gate_up    [H, 2*I_l]        column-parallel, packed [gate_s|up_s] per shard
  down       [I_l, H]          row-parallel (psum after)
  lm_head    [V_l, H]          vocab-sharded rows (tied to embed when configured)
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from nanovllm_tpu.layers.common import apply_rope, rms_norm, rope_cos_sin, silu_and_mul
from nanovllm_tpu.layers.sampler import resolve_shards, sample_local
from nanovllm_tpu.ops.attention import paged_attention
from nanovllm_tpu.ops.kv_cache import write_kv_pages
from nanovllm_tpu.ops.quant_matmul import quant_linear


# Llama-family architectures sharing this decoder body, keyed by HF
# model_type.  Flags: (qk_norm, attention_bias).  The reference supports only
# Qwen3 (SURVEY.md §2.1); the others are the same GQA/SwiGLU/pre-norm
# structure minus per-head QK-Norm and/or plus qkv bias.
SUPPORTED_ARCHS: dict[str, tuple[bool, bool]] = {
    "qwen3": (True, False),
    "qwen2": (False, True),   # Qwen2/2.5: qkv bias, no QK-Norm
    "llama": (False, False),
    "mistral": (False, False),
}


@dataclass(frozen=True)
class ModelSpec:
    """Static model hyperparameters (hashable; safe to close over in jit)."""

    num_layers: int
    hidden_size: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    vocab_size: int
    rope_theta: float
    rms_eps: float
    tie_embeddings: bool
    dtype: str = "bfloat16"
    tp_size: int = 1
    qk_norm: bool = True          # Qwen3 per-head QK RMSNorm
    attention_bias: bool = False  # Qwen2-style qkv bias
    # Mistral sliding-window attention: a token at position p attends kv
    # positions [max(0, p+1-W), p+1).  None = full causal.
    sliding_window: int | None = None
    # Pallas kernel tuning knobs (ops.ragged_paged_attention.AttnKnobs) —
    # carried here so they are part of every jitted program's identity and
    # two engines in one process can diverge; None = env/default resolution
    # inside the kernel wrapper.
    attn_knobs: object = None

    @classmethod
    def from_hf(cls, hf_config, tp_size: int = 1, dtype: str = "bfloat16",
                attn_knobs=None):
        head_dim = getattr(hf_config, "head_dim", None) or (
            hf_config.hidden_size // hf_config.num_attention_heads
        )
        model_type = getattr(hf_config, "model_type", "qwen3")
        if model_type not in SUPPORTED_ARCHS:
            raise ValueError(
                f"unsupported architecture {model_type!r}; "
                f"supported: {sorted(SUPPORTED_ARCHS)}"
            )
        qk_norm, attn_bias = SUPPORTED_ARCHS[model_type]
        attn_bias = bool(getattr(hf_config, "attention_bias", attn_bias))
        sw = getattr(hf_config, "sliding_window", None)
        use_sw = bool(getattr(hf_config, "use_sliding_window", model_type == "mistral"))
        sliding_window = int(sw) if (sw and use_sw) else None
        spec = cls(
            num_layers=hf_config.num_hidden_layers,
            hidden_size=hf_config.hidden_size,
            num_heads=hf_config.num_attention_heads,
            num_kv_heads=hf_config.num_key_value_heads,
            head_dim=head_dim,
            intermediate_size=hf_config.intermediate_size,
            vocab_size=hf_config.vocab_size,
            rope_theta=float(getattr(hf_config, "rope_theta", 10000.0)),
            rms_eps=float(getattr(hf_config, "rms_norm_eps", 1e-6)),
            tie_embeddings=bool(getattr(hf_config, "tie_word_embeddings", False)),
            dtype=dtype,
            tp_size=tp_size,
            qk_norm=qk_norm,
            attention_bias=attn_bias,
            sliding_window=sliding_window,
            attn_knobs=attn_knobs,
        )
        assert spec.num_heads % tp_size == 0, "num_heads must divide tp"
        assert spec.num_kv_heads % tp_size == 0, "num_kv_heads must divide tp"
        assert spec.intermediate_size % tp_size == 0
        return spec

    # local (per-shard) sizes
    @property
    def heads_l(self):
        return self.num_heads // self.tp_size

    @property
    def kv_heads_l(self):
        return self.num_kv_heads // self.tp_size

    @property
    def q_size_l(self):
        return self.heads_l * self.head_dim

    @property
    def kv_size_l(self):
        return self.kv_heads_l * self.head_dim

    @property
    def inter_l(self):
        return self.intermediate_size // self.tp_size

    @property
    def vocab_padded(self):
        """Vocab rounded up to 1024 * tp (pad rows are zero + masked
        everywhere).  The per-shard slice must divide by a large power of two
        so the fused sampling kernel (ops/fused_sample.py) gets full-width
        vocab tiles — the true vocab is typically odd-factored (151936 =
        2^7 * 1187), which would shrink tiles to 128 and multiply grid
        overhead ~8x."""
        v, tp = self.vocab_size, self.tp_size
        m = 1024 * tp
        return (v + m - 1) // m * m

    @property
    def vocab_l(self):
        return self.vocab_padded // self.tp_size

    @property
    def sm_scale(self):
        return self.head_dim ** -0.5


def _maybe_psum(x, axis_name):
    return lax.psum(x, axis_name) if axis_name else x


def embed_lookup(embed_l, token_ids, spec: ModelSpec, axis_name):
    """Vocab-parallel embedding: mask + local lookup + psum (reference
    embed_head.py:95-131)."""
    v_l = embed_l.shape[0]
    shard = lax.axis_index(axis_name) if axis_name else 0
    local = token_ids - shard * v_l
    ok = (local >= 0) & (local < v_l)
    x = jnp.take(embed_l, jnp.clip(local, 0, v_l - 1), axis=0)
    x = jnp.where(ok[:, None], x, 0)
    return _maybe_psum(x, axis_name)


def decoder_layer(x, layer_params, kv_pages, layer, pages_per_layer, batch,
                  cos, sin, segments, spec: ModelSpec, axis_name, attn_impl):
    """One pre-norm decoder layer on local shards (reference qwen3.py:278-377).

    ``kv_pages`` is the FULL flat cache [2*L*pages_per_layer, page, kvh*hd];
    the layer writes via an in-place dim-0 scatter and attention gathers its
    pages from the same array (never slicing a whole layer in or out — see
    ops/kv_cache.py for why this layout is load-bearing for peak HBM).
    """
    t = x.shape[0]
    lp = layer_params

    # --- attention ---
    h = rms_norm(x, lp["input_norm"], spec.rms_eps)
    qkv = quant_linear(h, lp["qkv"], impl=attn_impl, layer=layer)  # [T, (q+2kv)_l]
    if spec.attention_bias:
        qkv = qkv + lp["qkv_b"]                           # Qwen2-style bias
    q, k, v = jnp.split(qkv, [spec.q_size_l, spec.q_size_l + spec.kv_size_l], axis=-1)
    q = q.reshape(t, spec.heads_l, spec.head_dim)
    k = k.reshape(t, spec.kv_heads_l, spec.head_dim)
    v = v.reshape(t, spec.kv_heads_l, spec.head_dim)
    if spec.qk_norm:
        # Qwen3 QK-Norm: per-head RMSNorm before RoPE (reference qwen3.py:126-128)
        q = rms_norm(q, lp["q_norm"], spec.rms_eps)
        k = rms_norm(k, lp["k_norm"], spec.rms_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    # Fused decode KV write (AttnKnobs.fused_kv_write): the decode segment's
    # rows are written by the attention kernel itself (patch fetched page +
    # aliased slab write-back) instead of the XLA row scatter; the prefill
    # segment keeps the page-plane write.  KV4 keeps the scatter.
    from nanovllm_tpu.ops.kv_cache import _quantize_rows, cache_kv_bits
    from nanovllm_tpu.ops.kv_cache import is_quantized_cache
    from nanovllm_tpu.ops.ragged_paged_attention import AttnKnobs

    dec_end = segments[0]
    knobs = spec.attn_knobs if spec.attn_knobs is not None else AttnKnobs.resolve()
    fuse = (
        attn_impl == "pallas" and dec_end > 0
        and knobs.fused_kv_write and cache_kv_bits(kv_pages) != 4
    )
    new_kv = None
    if fuse:
        kd, vd = k[:dec_end], v[:dec_end]
        kvh_l = spec.kv_heads_l
        if is_quantized_cache(kv_pages):
            qrows, qscale = _quantize_rows(jnp.concatenate([kd, vd], axis=1))
            new_kv = (qrows[:, :kvh_l].reshape(dec_end, -1),
                      qrows[:, kvh_l:].reshape(dec_end, -1), qscale)
        else:
            dt = kv_pages.dtype
            new_kv = (kd.astype(dt).reshape(dec_end, -1),
                      vd.astype(dt).reshape(dec_end, -1), None)
    kv_pages = write_kv_pages(kv_pages, layer, pages_per_layer, k, v,
                              batch.slot_mapping, segments=segments,
                              prefill_pages=batch.prefill_pages,
                              impl=attn_impl, skip_decode=fuse)
    o = paged_attention(
        q, kv_pages, layer, pages_per_layer, batch.kv_lens, batch.page_indices,
        batch.token_seq, batch.positions, segments,
        sm_scale=spec.sm_scale, impl=attn_impl, knobs=knobs,
        sliding_window=spec.sliding_window, new_kv=new_kv,
    )
    if fuse:
        o, kv_pages = o
    o = quant_linear(o.reshape(t, spec.q_size_l), lp["o"], impl=attn_impl,
                     layer=layer)
    x = x + _maybe_psum(o, axis_name)

    # --- mlp ---
    h = rms_norm(x, lp["post_norm"], spec.rms_eps)
    gate_up = quant_linear(h, lp["gate_up"], impl=attn_impl, layer=layer)
    m = quant_linear(silu_and_mul(gate_up), lp["down"], impl=attn_impl,
                     layer=layer)
    x = x + _maybe_psum(m, axis_name)
    return x, kv_pages


def forward_local(params, kv_pages, batch, segments, spec: ModelSpec, axis_name, attn_impl):
    """Full forward on local shards: embed -> scan(layers) -> final norm.

    Returns (hidden [T, H], new_kv_pages).
    """
    # logical pages per layer: the scale plane has one plane per logical
    # page; the bf16 split-plane cache has two (K/V) — see ops/kv_cache.py
    if isinstance(kv_pages, dict):
        pages_per_layer = kv_pages["scale"].shape[0] // spec.num_layers
    else:
        pages_per_layer = kv_pages.shape[0] // (2 * spec.num_layers)
    x = embed_lookup(params["embed"], batch.token_ids, spec, axis_name)
    if "rot" in params:
        # incoherence rotation (utils/rotation.py): the decoder stack runs
        # in a rotated residual basis; embed/final-norm/head stay original
        x = jnp.dot(x, params["rot"], preferred_element_type=jnp.float32
                    ).astype(x.dtype)
    cos, sin = rope_cos_sin(batch.positions, spec.head_dim, spec.rope_theta)

    # Quantized {"w","s"} weights stay STACKED [L, ...] and are closed over:
    # quant_linear indexes the layer plane inside the pallas kernel (scalar-
    # prefetched BlockSpec index_map).  Scanning them as xs instead makes XLA
    # materialize each layer's slice — a full extra HBM pass over every
    # weight, 0.73 ms/decode iteration at the flagship geometry.  Small
    # per-layer tensors (norm scales, biases) still scan as xs.
    big = {k: v for k, v in params["layers"].items() if isinstance(v, dict)}
    rest = {k: v for k, v in params["layers"].items() if k not in big}

    def body(carry, lp_rest):
        h, pages, layer = carry
        h, pages = decoder_layer(
            h, {**lp_rest, **big}, pages, layer, pages_per_layer, batch, cos,
            sin, segments, spec, axis_name, attn_impl,
        )
        return (h, pages, layer + 1), None

    (x, kv_pages, _), _ = lax.scan(
        body, (x, kv_pages, jnp.int32(0)), rest
    )
    if "unrot" in params:
        x = jnp.dot(x, params["unrot"], preferred_element_type=jnp.float32
                    ).astype(x.dtype)
    x = rms_norm(x, params["final_norm"], spec.rms_eps)
    return x, kv_pages


def compute_logits_local(params, hidden_sel, spec: ModelSpec):
    """Local vocab-shard logits for selected positions: [S, V_l] in fp32.

    The dot runs in the model dtype with fp32 accumulation (the reference
    computes logits in model dtype too, embed_head.py:205); casting the
    [V, H] head to fp32 would push the matmul onto the emulated-f32 MXU path.
    """
    lm = params["embed"] if spec.tie_embeddings else params["lm_head"]
    return jnp.einsum(
        "sh,vh->sv", hidden_sel, lm, preferred_element_type=jnp.float32
    )


def compute_logprobs_local(params, hidden, targets, spec: ModelSpec, axis_name):
    """Log-probability of ``targets`` [T] under the model, for every row.

    Used by the scoring/perplexity path (no reference equivalent — the
    reference is generation-only; BASELINE.md requires WikiText-2 ppl gates).

    Row-tiled: the per-row logsumexp needs the full [rows, V_l] f32 logits
    live, which at a batched-scoring T of 8-16k rows and a 152k vocab is
    many GiB of HBM temp (measured: 23.2 GiB requested at T=16384, tp=1 —
    compile-time OOM).  A lax.map over 512-row tiles keeps the temp at
    ~300 MB regardless of how many documents the step packs; the extra
    lm_head re-reads are noise next to the matmul itself.
    """
    t = hidden.shape[0]
    tile = 512
    if t > tile and t % tile == 0:
        hid = hidden.reshape(t // tile, tile, hidden.shape[1])
        tgt = targets.reshape(t // tile, tile)
        out = lax.map(
            lambda args: _logprobs_rows(params, args[0], args[1], spec,
                                        axis_name),
            (hid, tgt),
        )
        return out.reshape(t)
    return _logprobs_rows(params, hidden, targets, spec, axis_name)


def _logprobs_rows(params, hidden, targets, spec: ModelSpec, axis_name):
    """Target logprobs for one row tile.  Cross-shard math: global logsumexp
    via pmax + psum; the target logit is summed across shards (exactly one
    shard owns each target id)."""
    logits = compute_logits_local(params, hidden, spec)      # [T, V_l] f32
    t, v_l = logits.shape
    shard = lax.axis_index(axis_name) if axis_name else 0
    global_idx = shard * spec.vocab_l + lax.broadcasted_iota(jnp.int32, (t, v_l), 1)
    logits = jnp.where(global_idx < spec.vocab_size, logits, -jnp.inf)

    lmax = jnp.max(logits, axis=-1)
    gmax = lax.pmax(lmax, axis_name) if axis_name else lmax
    sumexp = jnp.sum(jnp.exp(logits - gmax[:, None]), axis=-1)
    if axis_name:
        sumexp = lax.psum(sumexp, axis_name)
    log_z = gmax + jnp.log(sumexp)

    local_t = targets - shard * spec.vocab_l
    owned = (local_t >= 0) & (local_t < spec.vocab_l)
    tl = jnp.take_along_axis(
        logits, jnp.clip(local_t, 0, v_l - 1)[:, None], axis=1
    )[:, 0]
    tl = jnp.where(owned, tl, 0.0)
    if axis_name:
        tl = lax.psum(tl, axis_name)
    return tl - log_z


def forward_and_score(params, kv_pages, batch, targets, spec: ModelSpec,
                      axis_name, attn_impl, segments=(0, 0, 0)):
    """Scoring step: forward + per-row target logprobs (perplexity eval).

    Returns (logprobs [T], new kv_pages) — KV is written so long documents
    stream through in chunks like chunked prefill.
    """
    hidden, new_kv_pages = forward_local(
        params, kv_pages, batch, segments, spec, axis_name, attn_impl
    )
    lps = compute_logprobs_local(params, hidden, targets, spec, axis_name)
    return lps, new_kv_pages


def forward_and_sample(params, kv_pages, batch, key, spec: ModelSpec, axis_name,
                       attn_impl, segments=(0, 0, 0)):
    """The jitted per-step body (run under shard_map when tp > 1).

    ``segments`` is the static (dec_end, p_start, p_end) token-layout triple
    (see ops/attention.py).  Returns (sampled token ids [S], new kv_pages).
    Tokens are computed for every padded sequence slot; the host keeps only
    the slots that were fully scheduled this step (reference
    model_runner.py:448-451 semantics).
    """
    hidden, new_kv_pages = forward_local(
        params, kv_pages, batch, segments, spec, axis_name, attn_impl
    )
    sel = jnp.take(hidden, batch.logits_indices, axis=0)   # [S, H]
    shard = lax.axis_index(axis_name) if axis_name else 0
    if axis_name:
        key = jax.random.fold_in(key, shard)
    if attn_impl == "pallas":
        # fused LM-head + Gumbel-max kernel: streams the head once, never
        # materializes [S, V] logits or noise (ops/fused_sample.py)
        from nanovllm_tpu.ops.fused_sample import fused_lm_sample

        lmq = params.get("lm_head_q")
        if lmq is not None:
            # per-row int8 head copy: half the stream bytes (the dominant
            # fixed cost of a decode sampling pass); exact per-channel dequant
            lm, lm_scale = lmq["w"], lmq["s"]
        else:
            lm = params["embed"] if spec.tie_embeddings else params["lm_head"]
            lm_scale = None
        seeds = lax.bitcast_convert_type(
            jax.random.key_data(key).reshape(-1), jnp.int32
        )
        seeds = jnp.resize(seeds, (4,))
        # off-TPU (interpret mode, e.g. the simulated-mesh tp tests) the core
        # PRNG has no lowering: inject operand Gumbel noise instead.  Greedy
        # rows (temperature <= 0) are exact either way.
        interpret = jax.default_backend() != "tpu"
        noise = None
        if interpret:
            noise = jax.random.gumbel(
                jax.random.fold_in(key, 7), (sel.shape[0], lm.shape[0]),
                dtype=jnp.float32,
            )
        local_tok, local_max = fused_lm_sample(
            sel, lm, batch.temperatures, seeds, shard * spec.vocab_l,
            vocab_size=spec.vocab_size, lm_scale=lm_scale,
            noise=noise, interpret=interpret,
        )
        tokens = resolve_shards(local_max, local_tok, axis_name)
        return tokens, new_kv_pages
    logits = compute_logits_local(params, sel, spec)       # [S, V_l]
    tokens = sample_local(
        logits, batch.temperatures, key,
        vocab_start=shard * spec.vocab_l,
        vocab_size=spec.vocab_size,
        axis_name=axis_name,
    )
    return tokens, new_kv_pages
