"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Correctness tests never need a real TPU; multi-chip sharding tests run on
XLA's forced host platform devices.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import re

flags = os.environ.get("XLA_FLAGS", "")
# FORCE 8 devices even if a pre-existing XLA_FLAGS set another count —
# the mesh tests assert exactly 8
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-updates jax_platforms to "axon,cpu" at
# interpreter boot, overriding the env var — undo that for tests.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
