"""Test configuration.

Tests run on CPU with 8 virtual devices (the cluster-free analog of the
reference's local MATLAB worker pool, per SURVEY.md section 4) and with
float64 enabled so the randomized oracle tests can assert the reference's
tolerances (1e-6..1e-10 relative gaps).

Note: the environment's TPU plugin forcibly sets jax_platforms at
interpreter boot (sitecustomize), so the env var alone is not enough —
the config must be updated after importing jax, before any computation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
