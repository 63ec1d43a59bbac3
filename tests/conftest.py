"""Test configuration.

Tests run on CPU with a virtual 8-device mesh and x64 enabled so the host
numerics match the reference's f64 math (reference src/vectors.h:30-33);
sharding logic is exercised without TPU hardware (SURVEY.md section 4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
