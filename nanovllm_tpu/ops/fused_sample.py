"""Pallas TPU kernel: fused LM-head matmul + Gumbel-max sampling.

The reference samples by materializing [B, vocab] logits, adding exponential
noise, and taking an argmax (reference layers/sampler.py:41-81, after a
gather-to-rank-0 of the logits, embed_head.py:205-211).  Under XLA the same
recipe costs three full HBM passes over [S, vocab] f32 per decode step at the
flagship geometry (write logits, write noise, read both for the argmax) —
measured 1.66 ms of a 13.7 ms decode iteration, ~1 ms of it avoidable.

This kernel streams the LM head once and never materializes logits: for each
vocab tile it runs the [S, H] x [H, BV] dot on the MXU, draws the tile's
Gumbel noise from the core PRNG, and folds the perturbed scores into a
running (max, argmax) carried in VMEM scratch.  Output is [S] token ids plus
the winning scores (for the cross-shard argmax when the vocab is
tensor-parallel — see layers/sampler.resolve_shards).

Semantics parity with layers/sampler.sample_local:
  * temperature <= 0 rows take a plain argmax (greedy),
  * vocab-padding columns (>= vocab_size) can never win,
  * ties resolve to the lowest global index (strict > across tiles, min-index
    within a tile).

The stochastic path needs the TPU PRNG (pltpu.prng_*), which has no interpret
-mode lowering — CPU tests cover the deterministic path; the noise path is
validated on hardware (tools/bench_sampler.py) and statistically in
tests/test_fused_sample.py::test_gumbel_distribution (TPU only).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32_MAX = 0x7FFFFFFF  # plain int: a jnp scalar would be a captured constant


def _uniform_from_bits(bits):
    """u32 bits -> f32 uniform in (0, 1): mantissa trick, then shift off 1."""
    if bits.dtype != jnp.uint32:
        bits = lax.bitcast_convert_type(bits, jnp.uint32)
    f = lax.bitcast_convert_type(
        (bits >> 9) | jnp.uint32(0x3F800000), jnp.float32
    )
    return f - (1.0 - 2.0 ** -24)


def _sample_kernel(meta_ref, sel_ref, lm_ref, t_ref, *rest,
                   n_v, bv, vocab_size, noise_mode, lm_int8):
    """meta_ref (SMEM i32): [seed0..seed3, vocab_start].

    ``noise_mode``: "prng" draws Gumbel noise from the core PRNG (TPU only),
    "operand" reads a caller-supplied noise tile (CPU/interpret testing),
    "none" is a pure argmax (greedy).

    ``lm_int8``: the head tile is per-row int8; its f32 scale tile follows in
    ``rest`` and multiplies the logits after the dot (exact per-channel
    dequant — int8 rows cast losslessly into the bf16 MXU operand).
    """
    if lm_int8:
        s_ref, *rest = rest
    else:
        s_ref = None
    if noise_mode == "operand":
        noise_ref, tok_ref, max_ref, best_ref, arg_ref = rest
    else:
        tok_ref, max_ref, best_ref, arg_ref = rest
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        best_ref[...] = jnp.full_like(best_ref, -jnp.inf)
        arg_ref[...] = jnp.zeros_like(arg_ref)

    sel = sel_ref[...]
    lm = lm_ref[...]
    if lm_int8:
        lm = lm.astype(sel.dtype)
    logits = lax.dot_general(
        sel, lm,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [S, BV]
    if lm_int8:
        logits = logits * s_ref[...]                        # [1, BV] broadcast
    vstart = meta_ref[4]
    gidx = vstart + j * bv + lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    if noise_mode == "none":
        score = logits
    else:
        if noise_mode == "prng":
            # Mosaic caps prng_seed at 2 values: fold the key words and the
            # tile index together (golden-ratio mix, wrapping i32 multiply)
            pltpu.prng_seed(
                meta_ref[0] ^ (j * (-1640531527) + meta_ref[2]),  # 0x9E3779B9
                meta_ref[1] + meta_ref[3] * (-2048144789),        # 0x85EBCA6B
            )
            u = _uniform_from_bits(pltpu.prng_random_bits(logits.shape))
            gumbel = -jnp.log(-jnp.log(u))
        else:
            gumbel = noise_ref[...]
        temps = t_ref[...]                                  # [S, 1]
        greedy = temps <= 0.0
        safe_t = jnp.where(greedy, 1.0, temps)
        score = jnp.where(greedy, logits, logits / safe_t + gumbel)
    score = jnp.where(gidx < vocab_size, score, -jnp.inf)

    tile_max = jnp.max(score, axis=1, keepdims=True)        # [S, 1]
    # lowest-index argmax via min-reduce (no argmax lowering needed)
    tile_arg = jnp.min(
        jnp.where(score == tile_max, gidx, _I32_MAX), axis=1, keepdims=True
    )
    better = tile_max > best_ref[...]
    arg_ref[...] = jnp.where(better, tile_arg, arg_ref[...])
    best_ref[...] = jnp.where(better, tile_max, best_ref[...])

    @pl.when(j == n_v - 1)
    def _():
        tok_ref[...] = arg_ref[...]
        max_ref[...] = best_ref[...]


def fused_lm_sample(
    sel: jnp.ndarray,          # [S, H] hidden rows to sample from
    lm: jnp.ndarray,           # [V_l, H] local LM-head rows (vocab-sharded)
    temps: jnp.ndarray,        # [S] float32; <= 0 means greedy
    seeds: jnp.ndarray,        # [4] int32 PRNG seed material
    vocab_start,               # scalar int32: global index of this shard's slice
    *,
    vocab_size: int,
    lm_scale: jnp.ndarray | None = None,  # [1, V_l] f32: lm is per-row int8
    stochastic: bool = True,
    noise: jnp.ndarray | None = None,  # [S, V_l] injected Gumbel (tests)
    block_v: int = 1024,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (token ids [S] int32 global indices, winning scores [S] f32)."""
    s, h = sel.shape
    v_l = lm.shape[0]
    bv = min(block_v, v_l)
    # keep the double-buffered LM tile within a VMEM budget at large H
    while bv > 128 and bv * h * lm.dtype.itemsize > 4 * 1024 * 1024:
        bv //= 2
    while v_l % bv:
        bv //= 2
    n_v = v_l // bv

    noise_mode = "none" if not stochastic else (
        "operand" if noise is not None else "prng"
    )
    meta = jnp.concatenate([
        jnp.asarray(seeds, jnp.int32).reshape(4),
        jnp.asarray(vocab_start, jnp.int32).reshape(1),
    ])
    kernel = functools.partial(
        _sample_kernel, n_v=n_v, bv=bv, vocab_size=vocab_size,
        noise_mode=noise_mode, lm_int8=lm_scale is not None,
    )
    in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((s, h), lambda j: (0, 0)),
            pl.BlockSpec((bv, h), lambda j: (j, 0)),
            pl.BlockSpec((s, 1), lambda j: (0, 0)),
    ]
    operands = [meta, sel, lm, temps.astype(jnp.float32).reshape(s, 1)]
    if lm_scale is not None:
        in_specs.append(pl.BlockSpec((1, bv), lambda j: (0, j)))
        operands.append(lm_scale)
    if noise_mode == "operand":
        in_specs.append(pl.BlockSpec((s, bv), lambda j: (0, j)))
        operands.append(noise.astype(jnp.float32))
    tok, best = pl.pallas_call(
        kernel,
        grid=(n_v,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((s, 1), lambda j: (0, 0)),
            pl.BlockSpec((s, 1), lambda j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, 1), jnp.int32),
            jax.ShapeDtypeStruct((s, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((s, 1), jnp.float32),
            pltpu.VMEM((s, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*operands)
    return tok[:, 0], best[:, 0]
