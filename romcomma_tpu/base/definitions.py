"""Global type/dtype registry and runtime configuration.

TPU-native counterpart of the reference's ``romcomma/base/definitions.py``
(which delegates dtypes to gpflow config and forces float64 at
``user/contexts.py:67``). Here precision is a process-wide JAX setting:

  - float64 is enabled by default (``jax_enable_x64``) so that CPU runs and
    verification match the reference's forced-f64 numerics at 1e-6 rtol.
  - On TPU, the compute dtype may be lowered per-call (mixed-precision
    calibration polishes in f64 after an f32 descent) — see
    ``romcomma_tpu.models.gp``.

Everything importing this module gets x64 configured before any jax arrays
are created, mirroring how the reference configures gpflow before model
construction.
"""

from __future__ import annotations

import os

# x64 capability is ALWAYS enabled (before jax initializes its backends):
# even the f32 fast path needs real float64 for the posterior factorization
# (an f32 Cholesky breaks down outright once cond(K) ~ N s2/noise exceeds
# 1/eps_f32 ~ 1e7 — reached near N~1e4 with converged noise). ROMCOMMA_X64
# only selects the *default* compute dtype: 1 (default) -> float64
# everywhere (verification mode); 0 -> float32 storage/training with f64
# reserved for the factorizations that need it.
os.environ.setdefault('JAX_ENABLE_X64', 'True')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update('jax_enable_x64', True)

# True-f32 matmul precision everywhere: on TPU the default lets the MXU
# multiply f32 operands in ONE bf16 pass (~3 decimal digits), which is fatal
# in a library whose every contraction feeds a linear solve or a variance
# cancellation (measured: 1e-2 abs gram error, 4e-3 relative LML error,
# NaN blocked-Cholesky trailing updates). The FLOP-heavy kernels (Pallas
# gram, XLA cholesky/triangular_solve internals) are unaffected or already
# pin their own precision; this default protects everything else.
jax.config.update('jax_default_matmul_precision', 'highest')

# Persistent compilation cache: first-compile costs (20-40s per program on a
# tunneled TPU) amortize across processes/rounds. ROMCOMMA_JAX_CACHE=''
# disables it entirely (no serialization): xla's executable serializer has
# segfaulted on specific CPU programs (observed round 4 on the rotated-Sobol
# optimizer program), so cache-less is the safe mode for test runs.
_cache_dir = os.environ.get('ROMCOMMA_JAX_CACHE', os.path.expanduser('~/.cache/romcomma_jax'))
if _cache_dir:
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', _cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    except Exception:  # cache is an optimization only — never fail import
        pass

import contextlib  # noqa: E402


@contextlib.contextmanager
def no_compile_cache():
    """Temporarily disable the persistent compilation cache around a
    compilation known to CRASH the XLA executable serializer.

    Observed (round 4): serializing the rotated-Sobol Cayley-optimizer
    program to a fresh cache SEGFAULTS the process (and concurrent writers
    corrupt shared entries). Tests run cache-less globally
    (ROMCOMMA_JAX_CACHE='' in conftest); PRODUCTION paths compiling such a
    program wrap the first compilation in this context instead, so the
    executable simply never serializes while every other program keeps the
    cross-process cache. No-op when the cache is already disabled."""
    try:
        cur = jax.config.jax_compilation_cache_dir
    except AttributeError:
        cur = None
    if not cur:
        yield
        return
    jax.config.update('jax_compilation_cache_dir', None)
    try:
        yield
    finally:
        jax.config.update('jax_compilation_cache_dir', cur)


#: N below which always-f64 stages (GSA, posterior factorization) run on the
#: host CPU backend when the default backend is an accelerator: native f64
#: beats TPU-emulated f64 on both compile time (seconds vs minutes) and
#: dispatch latency at small N.
HOST_F64_BELOW_N: int = 2048


def host_cpu_device(route: bool):
    """The host CPU device when ``route`` and the default backend is an
    accelerator; None otherwise (including when no CPU backend exists).
    The single source of the routing dance used by the GSA and posterior
    host-routing paths."""
    if not route or jax.default_backend() == 'cpu':
        return None
    try:
        return jax.devices('cpu')[0]
    except RuntimeError:
        return None


#: Quantities smaller than this are considered zero (reference: base/definitions.py:36).
EFFECTIVELY_ZERO = 1.0e-64

#: Lower bound on the diagonal of a trainable covariance Cholesky (reference: gpf/base.py:35).
CHOLESKY_DIAGONAL_LOWER_BOUND = 1e-3

#: Floor on likelihood noise variance (reference: gpr/models.py:62-65).
LIKELIHOOD_VARIANCE_FLOOR = 1.0001e-6

#: Floor on kernel signal variance (reference: gpr/kernels.py:176).
KERNEL_VARIANCE_FLOOR = 1.0005e-6


_F32_MODE = os.environ.get('ROMCOMMA_X64', '1') == '0'


def FLOAT() -> np.dtype:
    """The default float dtype: float64 (verification) unless ROMCOMMA_X64=0
    selected the f32 fast path."""
    return np.dtype(np.float32) if _F32_MODE else np.dtype(np.float64)


def INT() -> np.dtype:
    """The default int dtype."""
    return np.dtype(np.int32) if _F32_MODE else np.dtype(np.int64)


def compute_dtype() -> jnp.dtype:
    """The dtype hot kernels run in. Same as FLOAT() for now; mixed-precision
    paths override locally."""
    return FLOAT()
