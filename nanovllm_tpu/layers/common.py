"""Elementwise / normalization / rotary layers as pure functions.

These are deliberately plain jnp: XLA fuses them into the surrounding
matmuls, which is the TPU-native equivalent of the reference's
``torch.compile``-decorated small ops (reference layernorm.py:57-141,
rotary_embedding.py:27-153, activation.py:36-58).  Precision discipline
matches the reference: norms and rotary math accumulate in float32 and cast
back to the activation dtype.
"""

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm over the last axis, fp32 accumulation (reference layernorm.py:57-93).

    Works for [T, H] activations and per-head [T, n, head_dim] QK-Norm alike.
    """
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def silu_and_mul(gate_up: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU: split the packed [.., 2*I] activation and gate (reference activation.py:36-58)."""
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return gate * lax.logistic(gate) * up


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float):
    """cos/sin tables for the given positions, fp32: [T, head_dim//2] each.

    Computed on the fly — a [T, hd/2] outer product is VPU noise, so no
    precomputed cache is needed (the reference's cos_sin_cache buffer,
    rotary_embedding.py:92-112, is a CUDA-graph-era artifact).
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate-half RoPE on [T, n_heads, head_dim] (reference rotary_embedding.py:27-65).

    Matches the HF/LLaMA convention: x1, x2 = split halves;
    out = [x1*cos - x2*sin, x2*cos + x1*sin].
    """
    xf = x.astype(jnp.float32)
    x1, x2 = jnp.split(xf, 2, axis=-1)
    c = cos[:, None, :]
    s = sin[:, None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)
