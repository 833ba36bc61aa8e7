"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the survey's multi-device test plan (SURVEY.md §4.3): sharding paths are
validated on `xla_force_host_platform_device_count=8` CPU devices; real-TPU
benchmarking lives in bench.py, not the test suite.
"""

import os

# The harness exports JAX_PLATFORMS=axon (single real TPU chip over a tunnel)
# and its sitecustomize imports jax at interpreter startup, so env vars alone
# are latched too early — update the live jax config instead (backends
# initialize lazily, so this still takes effect here).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
