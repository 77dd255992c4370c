"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so that sharding paths are
exercised without TPU hardware, and with x64 enabled so physics kernels can
be validated in double precision against closed-form references.
"""

import os

# Force CPU for the test suite (virtual 8-device mesh): deterministic f64,
# fast compiles. Set MONORTM_TEST_PLATFORM=tpu (or any platform name) to run
# the physics tests on real hardware instead. The platform is forced via
# jax.config.update (not just the env var) because the environment's PJRT
# sitecustomize may have already imported jax and prepended its own platform
# to jax_platforms before this conftest runs.
_platform = os.environ.get("MONORTM_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if _platform == "cpu":
    # force CPU via jax.config too (not just the env var): the PJRT
    # sitecustomize may have imported jax already and prepended its own
    # platform (e.g. "axon" for tunneled TPUs) to jax_platforms
    jax.config.update("jax_platforms", _platform)
else:
    # hardware run: keep the environment's platform list (the TPU plugin
    # may register under a different name, e.g. "axon"), x64 off (TPUs
    # have no f64), and use a persistent compile cache
    jax.config.update("jax_compilation_cache_dir",
                      str(__import__("pathlib").Path(__file__).parent.parent
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

jax.config.update("jax_enable_x64", _platform == "cpu")


def pytest_xdist_auto_num_workers(config):
    """-n auto resolution: 2 workers on CPU (suite wall time is compile-
    bound; 2 workers take the 2-vCPU box from ~15 to ~7 minutes), but
    strictly ONE in-process session on hardware — the TPU grant is
    single-tenant and two workers would race on the chip."""
    if _platform != "cpu":
        return 0
    return 2
