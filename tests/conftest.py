import os

# 8 virtual CPU devices for sharding tests (must be set before backend init)
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment pins jax_platforms to "axon,cpu" (tunneled TPU); unit
# tests must run on CPU in float64, so override via the config API — the
# JAX_PLATFORMS env var is ignored here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
