"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so that sharding paths are
exercised without TPU hardware, and with x64 enabled so physics kernels can
be validated in double precision against closed-form references.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
