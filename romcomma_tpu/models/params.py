"""GP hyperparameter pytrees and their constrained/unconstrained transforms.

The reference holds hyperparameters as live gpflow Parameters with softplus
bijectors (gpf/base.py:32-96, gpf/kernels.py:129-137). Here they are plain
NamedTuple pytrees of *raw* (unconstrained) leaves that jitted functions
constrain on the fly — the representation the on-device L-BFGS descends on.

Constraint conventions (identical to the reference):
  - kernel signal variance (variant): softplus, floored at init to
    KERNEL_VARIANCE_FLOOR = 1.0005e-6 (gpr/kernels.py:176).
  - lengthscales: softplus.
  - likelihood noise variance (variant): 1e-6 + softplus (gpflow Gaussian
    default lower bound), floored at init to 1.0001e-6 (gpr/models.py:62-65).
  - covariant (L,L) covariances are parameterized by their Cholesky:
    diagonal = 1e-3 + softplus (gpf/base.py:35,90), strict lower triangle
    unconstrained, packed row-major (gpf/base.py:93-94).
"""

from __future__ import annotations

from typing import NamedTuple, Dict

import jax.numpy as jnp
import numpy as np

from romcomma_tpu.base.definitions import (CHOLESKY_DIAGONAL_LOWER_BOUND,
                                           KERNEL_VARIANCE_FLOOR,
                                           LIKELIHOOD_VARIANCE_FLOOR, FLOAT)
from romcomma_tpu.ops.transforms import (positive, positive_inverse, build_tril,
                                         pack_tril_strict)

#: gpflow's Gaussian-likelihood lower bound on noise variance.
NOISE_LOWER_BOUND = 1e-6


class VariantParams(NamedTuple):
    """Raw parameters of L independent ARD-RBF GPs."""
    raw_variance: jnp.ndarray       # (L,)
    raw_lengthscales: jnp.ndarray   # (L,M)
    raw_noise: jnp.ndarray          # (L,)


class CovariantParams(NamedTuple):
    """Raw parameters of one covariant multi-output ARD-RBF GP."""
    raw_kernel_chol_diag: jnp.ndarray   # (L,)
    kernel_chol_lower: jnp.ndarray      # (L*(L-1)/2,)
    raw_lengthscales: jnp.ndarray       # (L,M)
    raw_noise_chol_diag: jnp.ndarray    # (L,)
    noise_chol_lower: jnp.ndarray       # (L*(L-1)/2,)


def variant_init(variance: np.ndarray, lengthscales: np.ndarray,
                 noise: np.ndarray) -> VariantParams:
    """Build raw params from constrained values (with reference floors).

    variance: (L,) kernel variances; lengthscales: (L,M); noise: (L,).
    """
    dt = FLOAT()
    variance = np.maximum(np.asarray(variance, dtype=dt).reshape(-1), KERNEL_VARIANCE_FLOOR)
    noise = np.maximum(np.asarray(noise, dtype=dt).reshape(-1), LIKELIHOOD_VARIANCE_FLOOR)
    lengthscales = np.asarray(lengthscales, dtype=dt)
    return VariantParams(
        raw_variance=jnp.asarray(positive_inverse(variance, 0.0)),
        raw_lengthscales=jnp.asarray(positive_inverse(lengthscales, 0.0)),
        raw_noise=jnp.asarray(positive_inverse(noise, NOISE_LOWER_BOUND)),
    )


def variant_constrain(p: VariantParams) -> Dict[str, jnp.ndarray]:
    return {
        'variance': positive(p.raw_variance, 0.0),
        'lengthscales': positive(p.raw_lengthscales, 0.0),
        'noise': positive(p.raw_noise, NOISE_LOWER_BOUND),
    }


def _chol_init(cov: np.ndarray):
    """Raw (diag, strict-lower) pair from an SPD (L,L) matrix."""
    chol = np.linalg.cholesky(np.asarray(cov, dtype=np.float64))
    diag = np.diagonal(chol)
    if np.min(diag) <= CHOLESKY_DIAGONAL_LOWER_BOUND:
        # The reference raises here (gpf/base.py:88-89); we clamp just above
        # the bound so broadcastable tiny variances remain constructible.
        diag = np.maximum(diag, CHOLESKY_DIAGONAL_LOWER_BOUND * (1 + 1e-6))
    raw_diag = positive_inverse(diag, CHOLESKY_DIAGONAL_LOWER_BOUND)
    lower = pack_tril_strict(chol)
    # The factorization above runs in f64 for robustness, but the RAW
    # PARAMS must land at the framework working dtype: x64 capability is
    # always on, so an f64 leaf here silently promotes the entire
    # covariant chain to emulated f64 on TPU under ROMCOMMA_X64=0
    # (measured: the f64 thin-matmul gram build emulates as f32 pair
    # temps of (8,LN,LN) — a compile-time OOM at LN~24k).
    dt = FLOAT()
    return (jnp.asarray(np.asarray(raw_diag, dtype=dt)),
            jnp.asarray(np.asarray(lower, dtype=dt)))


def covariant_init(kernel_cov: np.ndarray, lengthscales: np.ndarray,
                   noise_cov: np.ndarray) -> CovariantParams:
    """Build raw covariant params from (L,L) kernel/noise covariances."""
    kd, kl = _chol_init(kernel_cov)
    nd, nl = _chol_init(noise_cov)
    return CovariantParams(
        raw_kernel_chol_diag=kd, kernel_chol_lower=kl,
        raw_lengthscales=jnp.asarray(positive_inverse(np.asarray(lengthscales, dtype=FLOAT()), 0.0)),
        raw_noise_chol_diag=nd, noise_chol_lower=nl,
    )


def covariant_constrain(p: CovariantParams) -> Dict[str, jnp.ndarray]:
    kchol = build_tril(positive(p.raw_kernel_chol_diag, CHOLESKY_DIAGONAL_LOWER_BOUND),
                       p.kernel_chol_lower)
    nchol = build_tril(positive(p.raw_noise_chol_diag, CHOLESKY_DIAGONAL_LOWER_BOUND),
                       p.noise_chol_lower)
    return {
        'F': kchol @ kchol.T,
        'lengthscales': positive(p.raw_lengthscales, 0.0),
        'noise_cov': nchol @ nchol.T,
        'noise_chol': nchol,
    }


def variant_mask(kernel_variance: bool = True, lengthscales: bool = True,
                 noise: bool = True) -> VariantParams:
    """Trainability mask matching the reference META flag system
    (gpr/kernels.py:54-70, gpr/models.py:71-80). 1.0 = trainable."""
    f = lambda b: 1.0 if b else 0.0
    return VariantParams(raw_variance=f(kernel_variance),
                         raw_lengthscales=f(lengthscales),
                         raw_noise=f(noise))


def covariant_mask(kernel_variance: bool = True, kernel_covariance: bool = False,
                   lengthscales: bool = False, noise_variance: bool = True,
                   noise_covariance: bool = True) -> CovariantParams:
    """Covariant trainability mask. Reference defaults: kernel cholesky diag
    trains, kernel off-diagonals and lengthscales are frozen; the noise
    covariance trains fully (gpr/kernels.py:54-57, gpr/models.py:57-60)."""
    f = lambda b: 1.0 if b else 0.0
    return CovariantParams(raw_kernel_chol_diag=f(kernel_variance),
                           kernel_chol_lower=f(kernel_covariance),
                           raw_lengthscales=f(lengthscales),
                           raw_noise_chol_diag=f(noise_variance),
                           noise_chol_lower=f(noise_covariance))
