"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU (fast, deterministic, works without TPU access);
multi-device sharding tests use the 8 virtual host devices, mirroring
how the driver validates `dryrun_multichip`.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402

# The JAX_PLATFORMS env var is not honored once the axon TPU plugin is
# present; force the CPU backend through the config API instead.
jax.config.update("jax_platforms", "cpu")
# x64 on: float64 numpy oracles stay float64 through jnp; float32
# production paths still run float32 (dtype follows the input).
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(19971118)
