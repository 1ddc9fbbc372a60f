"""Test configuration: force a virtual 8-device CPU mesh.

Multi-chip sharding tests run on CPU via
``--xla_force_host_platform_device_count`` (the JAX-native fake backend for
distributed tests — SURVEY.md §4).  fp32 matmuls use highest precision so
parity tolerances vs the torch reference hold.
"""

import os

# NOTE: /root/.axon_site/sitecustomize.py imports jax at interpreter startup
# (before conftest), so JAX_PLATFORMS must be applied via jax.config, and
# XLA_FLAGS via the environment before the first backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
assert len(jax.devices()) == 8 and jax.default_backend() == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
