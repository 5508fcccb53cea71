"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the fake-backend strategy the
reference lacks — SURVEY.md §4)."""

import os

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')
# Disable the persistent compile cache for tests: xla's executable
# SERIALIZER has segfaulted on specific CPU programs (observed round 4 on
# the rotated-Sobol optimizer program — crash inside
# compilation_cache.put_executable_and_time), and concurrent writers on the
# shared dir have also corrupted entries mid-read. CPU test compiles are
# cheap; cache-less is hermetic and immune to both failure modes.
os.environ.setdefault('ROMCOMMA_JAX_CACHE', '')

import jax  # noqa: E402

# The axon TPU plugin registers at interpreter startup; route tests to CPU.
try:
    jax.config.update('jax_platforms', 'cpu')
except Exception:
    pass
jax.config.update('jax_enable_x64', True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
    import random
    random.seed(0)
    yield


@pytest.fixture()
def tmp_root(tmp_path):
    return tmp_path
