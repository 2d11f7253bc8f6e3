"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so multi-chip
sharding (shard_map over a Mesh) is exercised without TPU hardware.  The
ambient environment pins JAX_PLATFORMS=axon (the TPU tunnel) and overrides
plain env vars, so the backend is forced through jax.config before any
backend initializes (conftest imports run before test modules).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
