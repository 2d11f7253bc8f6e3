"""Host-side W4A16 scheme comparison: round-trip error of int4 variants.

Measures per-element round-trip MSE of the implementable int4 schemes
(symmetric absmax / MSE-scan scales x group 128/64) plus ASYMMETRIC
(zero-point) quantization, which is evaluated here analytically instead of
being built into the matmul kernel: if it cannot beat the symmetric schemes
on this error metric, the kernel work (per-group zero-point correction =
an extra per-group partial-sum pass over the activations) is not worth
doing.  Two weight distributions:

  * gaussian — what the on-device KL proxy (tools/quality_proxy.py) runs on
    (random_weights engines; no checkpoints exist on this machine), and a
    symmetric distribution by construction;
  * student-t (df=4) — a heavy-tailed stand-in for trained-weight outliers.

Prints one table; QUALITY.md records the conclusions next to the on-device
KL numbers.
"""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nanovllm_tpu.ops.quant_matmul import quantize_weight  # noqa: E402


def sym_mse(w, group, mse):
    q, s = quantize_weight(w, int4=True, group=group, mse=mse)
    k, n = w.shape
    low = (q.astype(np.int32) << 28) >> 28
    high = (q.astype(np.int32) << 24) >> 28
    full = np.stack([low, high], axis=1).reshape(k, n)
    deq = full.reshape(k // group, group, n) * s[:, None, :]
    return float(((deq.reshape(k, n) - w) ** 2).mean())


def asym_mse(w, group):
    """Per-group asymmetric (zero-point) int4: 16 levels over [min, max]."""
    k, n = w.shape
    g = w.reshape(k // group, group, n)
    lo, hi = g.min(axis=1), g.max(axis=1)
    s = np.maximum((hi - lo) / 15.0, 1e-8)
    zp = np.round(-lo / s)
    q = np.clip(np.round(g / s[:, None, :]) + zp[:, None, :], 0, 15)
    deq = (q - zp[:, None, :]) * s[:, None, :]
    return float(((deq - g) ** 2).mean())


def rotate(w, seed=1):
    """Incoherence rotation on the K axis (utils/rotation.py mechanism:
    W' = R^T W; the activation side absorbs R exactly)."""
    from nanovllm_tpu.utils.rotation import random_orthogonal

    r = random_orthogonal(w.shape[0], seed)
    return (r.T @ w).astype(np.float32)


def main():
    rng = np.random.default_rng(0)
    k, n = 2048, 1024
    # outlier-channel case: trained-LLM weights concentrate energy in a few
    # input channels (the regime QuaRot targets); gaussians are ROTATION-
    # INVARIANT, so the on-device random-weight KL proxy cannot show any
    # rotation effect by construction — this synthetic case can
    outlier = (rng.standard_normal((k, n)) * 0.02).astype(np.float32)
    ch = rng.choice(k, 16, replace=False)
    outlier[ch] *= 20.0
    cases = {
        "gaussian": (rng.standard_normal((k, n)) * 0.02).astype(np.float32),
        "student-t(4)": (rng.standard_t(4, (k, n)) * 0.02).astype(np.float32),
        "outlier-ch": outlier,
    }
    print(f"{'weights':<14}{'scheme':<26}{'rt-MSE':>12}{'vs sym g128':>12}")
    for name, w in cases.items():
        base = sym_mse(w, 128, False)
        rows = [
            ("sym absmax g128 (ship)", base),
            ("sym absmax g64", sym_mse(w, 64, False)),
            ("sym MSE-scan g128", sym_mse(w, 128, True)),
            ("sym MSE-scan g64", sym_mse(w, 64, True)),
            ("asym zero-point g128", asym_mse(w, 128)),
            ("asym zero-point g64", asym_mse(w, 64)),
            ("rotate + MSE-scan g128", sym_mse(rotate(w), 128, True)),
        ]
        for scheme, e in rows:
            print(f"{name:<14}{scheme:<26}{e:>12.3e}{e / base:>11.2f}x")


if __name__ == "__main__":
    main()
