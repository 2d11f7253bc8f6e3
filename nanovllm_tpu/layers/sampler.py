"""Vocab-sharded Gumbel-max sampling.

Capability parity with the reference Sampler (reference layers/sampler.py:41-81,
Gumbel-max at temperature > 0), redesigned TPU-native: instead of gathering
[B, vocab] logits to rank 0 (reference embed_head.py:205-211), each shard
perturbs its local vocab slice with independent Gumbel noise, takes a local
argmax, and the winner is resolved with one tiny [tp, S] all_gather — O(S)
bytes on the interconnect instead of O(S * vocab).

Extensions over the reference: temperature == 0 selects plain argmax (greedy),
which the reference forbids (sampling_params.py:45).
"""

import jax
import jax.numpy as jnp
from jax import lax


def sample_local(
    logits: jnp.ndarray,        # [S, V_local] local logits shard
    temperatures: jnp.ndarray,  # [S] float32; <=0 means greedy
    key: jax.Array,             # PRNG key, already folded per shard
    vocab_start: jnp.ndarray,   # scalar: global index of this shard's vocab slice
    vocab_size: int,            # true (unpadded) vocab size
    axis_name: str | None,      # mesh axis for the cross-shard argmax, or None
) -> jnp.ndarray:
    """Returns sampled token ids [S] (global vocab indices), replicated."""
    S, v_local = logits.shape
    logits = logits.astype(jnp.float32)

    # mask vocab-padding columns so they can never win the argmax
    global_idx = vocab_start + lax.broadcasted_iota(jnp.int32, (S, v_local), 1)
    logits = jnp.where(global_idx < vocab_size, logits, -jnp.inf)

    greedy = temperatures <= 0.0
    safe_t = jnp.where(greedy, 1.0, temperatures)
    gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    scores = jnp.where(greedy[:, None], logits, logits / safe_t[:, None] + gumbel)

    local_max = jnp.max(scores, axis=-1)                          # [S]
    local_tok = vocab_start + jnp.argmax(scores, axis=-1).astype(jnp.int32)

    return resolve_shards(local_max, local_tok, axis_name)


def resolve_shards(
    local_max: jnp.ndarray,  # [S] per-shard winning score
    local_tok: jnp.ndarray,  # [S] per-shard winning global token id
    axis_name: str | None,
) -> jnp.ndarray:
    """Cross-shard argmax: one tiny [tp, S] all_gather resolves the winner."""
    if axis_name is None:
        return local_tok
    all_max = lax.all_gather(local_max, axis_name)                # [tp, S]
    all_tok = lax.all_gather(local_tok, axis_name)                # [tp, S]
    winner = jnp.argmax(all_max, axis=0)                          # [S]
    return jnp.take_along_axis(all_tok, winner[None, :], axis=0)[0]
