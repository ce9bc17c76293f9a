"""Test configuration: run on a virtual 8-device CPU mesh.

Must set platform flags before jax initializes (SURVEY.md §4: multi-host
tests are simulated via ``xla_force_host_platform_device_count``; real-TPU
runs happen through ``bench.py``, not the unit suite).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize may have imported jax already (registering
# a remote TPU plugin); env vars alone are then too late — force the platform
# through the live config so unit tests never touch the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Finite-difference grad checks need f64; explicit f32 arrays are unaffected.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
