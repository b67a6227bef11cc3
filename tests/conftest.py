"""Test config: force JAX onto CPU with 8 virtual devices so sharding tests
run without a pod (SURVEY.md section 4, multi-host strategy).

NOTE: this environment pre-imports jax via sitecustomize (axon TPU tunnel),
so JAX_PLATFORMS env vars are too late — the platform must be forced through
jax.config instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# this box has few CPUs and slow XLA compiles; persist compiled executables
# across pytest runs
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running e2e tests (kilometer-scale loop)")


@pytest.fixture
def rng():
    return np.random.default_rng(42)
