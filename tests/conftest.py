"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY.md section 4e)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag
# does force the CPU backend (and enables the 8 virtual devices above).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

from royaltracer_dx_tpu import cache  # noqa: E402,F401  (persistent XLA cache)
