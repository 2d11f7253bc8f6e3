"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so multi-chip
sharding (shard_map over a Mesh) is exercised without TPU hardware.  These
env vars must be set before jax initializes, hence at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
