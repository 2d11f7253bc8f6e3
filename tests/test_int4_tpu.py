"""TPU-gated bit-exactness tests for the native int4 (pltpu.bitcast) path.

ADVICE round-2 item: the production W4A16 kernel's bitcast unpack depends on
an undocumented Mosaic sublane nibble-ordering contract (packed int8 row i's
low nibble = int4 row 2i, high nibble = row 2i+1) that only executes on real
hardware — interpret-mode tests always take the legacy int32-shift path.
These tests run the bitcast kernel on the chip and require bit-exact
agreement with (a) the shift-path kernel (force_shift=True) and (b) the jnp
dequant reference, so a JAX/Mosaic layout change that silently breaks the
contract fails the suite instead of corrupting every W4A16 output.

Run on hardware:  NVT_TEST_TPU=1 python -m pytest tests/test_int4_tpu.py -q
(the normal CPU suite skips these — conftest pins the cpu backend unless
NVT_TEST_TPU is set, and the skipif below fires on cpu).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="bitcast int4 path only lowers through Mosaic on TPU "
    "(set NVT_TEST_TPU=1 and run on the chip)",
)


def _quantized(shape_kn, seed=0, layers=None):
    from nanovllm_tpu.ops.quant_matmul import quantize_weight

    rng = np.random.default_rng(seed)
    shape = ((layers,) if layers else ()) + shape_kn
    w = rng.standard_normal(shape).astype(np.float32) * 0.02
    w_q, s = quantize_weight(w, int4=True)
    return jnp.asarray(w_q), jnp.asarray(s)


def test_bitcast_unpack_contract_bit_exact():
    """The raw sublane nibble-ordering contract, isolated from the matmul.

    A minimal kernel bitcasts the packed [K//2, N] int8 tile to int4 [K, N]
    and writes it back widened to int8; the result must equal the numpy
    nibble unpack (low nibble -> even row, high -> odd) bit for bit.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k, n = 512, 1024
    rng = np.random.default_rng(1)
    packed = rng.integers(-128, 128, (k // 2, n)).astype(np.int8)

    def kernel(w_ref, out_ref):
        out_ref[...] = pltpu.bitcast(w_ref[...], jnp.int4).astype(jnp.int8)

    got = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((k, n), jnp.int8),
    )(jnp.asarray(packed))

    as_i32 = packed.astype(np.int32)
    low = ((as_i32 << 28) >> 28).astype(np.int8)
    high = ((as_i32 << 24) >> 28).astype(np.int8)
    ref = np.stack([low, high], axis=1).reshape(k, n)
    np.testing.assert_array_equal(np.asarray(got), ref)


@pytest.mark.parametrize("k,n", [(1024, 1024), (1024, 6144), (3072, 1024)])
def test_bitcast_matches_shift_path(k, n):
    """native4 kernel vs force_shift kernel on the chip.

    The shift path runs at halved tiles (int32 temporaries), so the f32
    accumulation split differs — require near-exact, not bit-exact (the
    bit-exact contract is test_bitcast_unpack_contract_bit_exact above).
    """
    from nanovllm_tpu.ops.quant_matmul import quant_matmul_pallas

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((256, k)) * 0.1, jnp.bfloat16)
    w_q, s = _quantized((k, n))
    got = quant_matmul_pallas(x, w_q, s, int4=True)
    ref = quant_matmul_pallas(x, w_q, s, int4=True, force_shift=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=2e-2)
    assert not np.all(np.asarray(got) == 0)


def test_bitcast_matches_dequant_reference():
    """native4 kernel vs jnp dequant-then-matmul (independent unpack code)."""
    from nanovllm_tpu.ops.quant_matmul import (
        dequant_weight,
        quant_matmul_pallas,
    )

    k, n = 1024, 2048
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((256, k)) * 0.1, jnp.bfloat16)
    w_q, s = _quantized((k, n), seed=3)
    got = np.asarray(
        quant_matmul_pallas(x, w_q, s, int4=True), np.float32)
    ref = np.asarray(x @ dequant_weight(w_q, s, int4=True), np.float32)
    # dequant values are identical (same nibbles, same scales); only the
    # matmul accumulation differs (tiled f32 scratch vs XLA's schedule)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-2)
    assert not np.all(got == 0)


def test_bitcast_stacked_layer_select():
    """stacked [L, K//2, N] weights: bitcast path + scalar-prefetch plane."""
    from nanovllm_tpu.ops.quant_matmul import quant_matmul_pallas

    k, n, L = 1024, 1024, 3
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((256, k)) * 0.1, jnp.bfloat16)
    w_q, s = _quantized((k, n), seed=5, layers=L)
    for layer in range(L):
        got = quant_matmul_pallas(x, w_q, s, int4=True, layer=layer)
        ref = quant_matmul_pallas(x, w_q[layer], s[layer], int4=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
