"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so multi-chip
sharding (shard_map over a Mesh) is exercised without TPU hardware.  The
ambient environment pins JAX_PLATFORMS=axon (the TPU tunnel) and overrides
plain env vars, so the backend is forced through jax.config before any
backend initializes (conftest imports run before test modules).
"""

import os

import jax

if not os.environ.get("NVT_TEST_TPU"):
    # NVT_TEST_TPU=1 leaves the ambient backend (the TPU tunnel) in place so
    # the TPU-gated hardware tests (tests/test_int4_tpu.py) can run on the
    # real chip: `NVT_TEST_TPU=1 pytest tests/test_int4_tpu.py`.  The normal
    # suite must NOT set it — most tests assume the 8-device CPU mesh.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
