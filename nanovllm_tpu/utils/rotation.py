"""Data-free incoherence rotation for weight quantization (QuaRot-class).

W4A16's absmax/MSE group grids lose most of their 15 levels to outlier
weight rows; a random orthogonal rotation of the hidden (residual-stream)
basis spreads those outliers across all channels, typically halving int4
round-trip error — with NO calibration data (the rotation is exact in real
arithmetic).  This is the residual-rotation half of QuaRot (Q1); the
online-Hadamard half (down_proj's K=intermediate axis) is not implemented.

Absorption scheme (the "norm-commute trick"):
  * RMSNorm scales fold into the FOLLOWING linear (W <- diag(gamma) @ W,
    gamma <- 1): a weightless rms() commutes with rotation because
    ||x R|| = ||x||.
  * Per layer: qkv and gate_up absorb R on the input side (W <- R^T W);
    o and down emit into the rotated stream (W <- W R).  QK-Norm, RoPE,
    and the qkv bias act after the projection and are untouched.
  * The stream is rotated at RUNTIME by two [T,H]x[H,H] matmuls — ``rot``
    after the embedding lookup and ``unrot`` (= R^T) before the final norm
    — so the embedding, final norm, and LM head are bit-identical to the
    unrotated model and tied embeddings stay tied.  (QuaRot folds R into
    embed/head instead; that breaks ties: the tied matrix would need
    E R for the lookup and E for the head.)  Cost: 2 H^2 weights in HBM
    (13 MB at 4B bf16) and two thin matmuls per step — noise next to one
    decoder layer.

Applied on the HOST, on the unquantized full tree, BEFORE quantization —
so the quantized artifact simply carries rotated weights.  Incompatible
with the lazy sliced loader (R^T @ W needs every K row); the runner falls
back to the eager loader when rotation is on.

Reference for parity: none — the reference is bf16-only.  Mechanism:
QuaRot (arXiv 2404.00456), data-free variant; see QUALITY.md round 5 for
the measured effect on the 4B KL proxy.
"""

import numpy as np


def random_orthogonal(n: int, seed: int = 0) -> np.ndarray:
    """Haar-ish random orthogonal [n, n] f32 (QR of a Gaussian, sign-fixed)."""
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n))
    q, r = np.linalg.qr(a)
    return (q * np.sign(np.diag(r))[None, :]).astype(np.float32)


def _bcast(w) -> bool:
    return w.ndim >= 2 and w.strides[0] == 0


def _map_planes(w, fn):
    """Apply ``fn`` (f32 plane -> f32 plane) per layer plane, preserving
    broadcast stacks (random_weights="fast": one plane, stride-0 views)."""
    dt = w.dtype
    if w.ndim == 2:
        return np.ascontiguousarray(fn(np.asarray(w, np.float32)), dtype=dt)
    if _bcast(w):
        plane = np.ascontiguousarray(fn(np.asarray(w[0], np.float32)), dtype=dt)
        return np.broadcast_to(plane, w.shape)
    return np.stack(
        [np.ascontiguousarray(fn(np.asarray(p, np.float32)), dtype=dt)
         for p in w]
    )


def apply_incoherence_rotation(params: dict, spec, seed: int = 0) -> dict:
    """Rotate the residual basis of ``params`` (host numpy tree, unquantized).

    Returns a new tree: per-layer linears absorb R, input/post norms become
    ones, and ``rot``/``unrot`` [H, H] runtime matrices are added.  Exact in
    real arithmetic (logits unchanged up to fp rounding).
    """
    h = spec.hidden_size
    r = random_orthogonal(h, seed)
    layers = dict(params["layers"])

    def fold_then_rotate(norm_key, w_key):
        norm, w = layers[norm_key], layers[w_key]
        assert not isinstance(w, dict), "rotate before quantization"
        if w.ndim == 3 and _bcast(w) and norm.ndim > 1 and not _bcast(norm):
            # one shared weight plane cannot absorb per-layer-distinct norms
            raise ValueError("broadcast weight stack with distinct norms")
        plane_idx = iter(range(10 ** 9))

        def fn(plane):
            l = next(plane_idx)
            g = np.asarray(norm if norm.ndim == 1 else norm[l], np.float32)
            return r.T @ (g[:, None] * plane)

        layers[w_key] = _map_planes(w, fn)
        ones = np.ones(h, dtype=norm.dtype)
        layers[norm_key] = (
            np.broadcast_to(ones, norm.shape) if norm.ndim > 1 else ones
        )

    fold_then_rotate("input_norm", "qkv")
    fold_then_rotate("post_norm", "gate_up")
    layers["o"] = _map_planes(layers["o"], lambda p: p @ r)
    layers["down"] = _map_planes(layers["down"], lambda p: p @ r)

    out = dict(params)
    out["layers"] = layers
    dt = layers["o"].dtype
    out["rot"] = r.astype(dt)
    out["unrot"] = np.ascontiguousarray(r.T, dtype=dt)
    return out
