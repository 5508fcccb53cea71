"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the fake-backend strategy the
reference lacks — SURVEY.md §4)."""

import os

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=8')
# Isolate the test run's persistent compile cache: concurrent writers on the
# shared ~/.cache/romcomma_jax have produced a fatal abort inside jax's
# cache deserialization (observed round 4); CPU test compiles are cheap and
# a per-run tmpdir keeps reruns hermetic.
import tempfile  # noqa: E402

os.environ.setdefault('ROMCOMMA_JAX_CACHE',
                      tempfile.mkdtemp(prefix='romcomma_test_cache_'))

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
