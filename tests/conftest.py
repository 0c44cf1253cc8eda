"""Test configuration: two lanes.

Default lane (no env var): CPU backend with 8 virtual devices, float64
enabled. Numerics-critical validation runs in float64 on CPU (the reference
library is float64 end-to-end, ``experiments/curves/regression/main.py:401``);
the 8 virtual CPU devices exercise the multi-chip sharding paths. Tests
marked ``tpu`` are skipped here (interpret-mode Pallas has zero PRNG noise,
so stochastic-law tests are meaningless off-hardware).

Hardware lane (``PLS_TPU_TESTS=1``): the platform is left to the environment
(the axon TPU plugin), float64 stays off (TPU is an f32/bf16 machine), and
``pytest -m tpu`` runs the hardware-only tests — the fused kernels'
stochastic law on the real PRNG. Run it as:

    PLS_TPU_TESTS=1 PYTHONPATH=/root/repo:/root/.axon_site \
        python -m pytest tests/ -m tpu -q
"""

import os

TPU_LANE = os.environ.get("PLS_TPU_TESTS") == "1"

if not TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

if not TPU_LANE:
    # The environment may pre-set JAX_PLATFORMS to a hardware plugin (e.g.
    # axon); the config update below wins over the env var and pins tests to
    # CPU.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: needs real TPU hardware (PRNG/MXU law tests); skipped on the "
        "default CPU lane, run with PLS_TPU_TESTS=1 pytest -m tpu",
    )


def pytest_collection_modifyitems(config, items):
    if TPU_LANE:
        return
    skip_tpu = pytest.mark.skip(
        reason="TPU-hardware lane only (PLS_TPU_TESTS=1 pytest -m tpu)"
    )
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)
