"""Generalized least squares regression (reference: romcomma/user/regression.py:36-58),
as a jitted double-Cholesky solve."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from romcomma_tpu.ops.linalg import cholesky, tri_solve


def gls(X, y, cov_y, is_through_origin: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GLS linear regression.

    Args:
        X: (N,M) regressors. y: (N,1) observations. cov_y: (N,N) covariance.
        is_through_origin: True constrains y(0)=0 (no intercept column).
    Returns: ((M[+1],1) coefficients, their covariance matrix); the intercept,
        when present, is the LAST coefficient (the reference pads a ones
        column on the right, regression.py:49-50).
    """
    X = jnp.asarray(X)
    y = jnp.asarray(y)
    cov_y = jnp.asarray(cov_y)
    if not is_through_origin:
        X = jnp.pad(X, ((0, 0), (0, 1)), mode='constant', constant_values=1.0)
    cov_cho = cholesky(cov_y)
    precision_cho_X = tri_solve(cov_cho, X)
    precision_cho_y = tri_solve(cov_cho, y)
    cov_beta_cho = cholesky(jnp.einsum('NM, Nm -> Mm', precision_cho_X, precision_cho_X))
    inv = tri_solve(cov_beta_cho, jnp.eye(X.shape[-1], dtype=X.dtype))
    cov_beta = jnp.einsum('NM, Nm -> Mm', inv, inv)
    beta = jnp.einsum('Mm, NM, Nl -> ml', cov_beta, precision_cho_X, precision_cho_y)
    return beta, cov_beta
