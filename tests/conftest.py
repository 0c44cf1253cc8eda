"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Numerics-critical validation runs in float64 on CPU (the reference library is
float64 end-to-end, ``experiments/curves/regression/main.py:401``); TPU runs
use float32 — the dtype is a config axis of the framework, not a hard-coded
global. The 8 virtual CPU devices exercise the multi-chip sharding paths.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pre-set JAX_PLATFORMS to a hardware plugin (e.g. axon);
# the config update below wins over the env var and pins tests to CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
