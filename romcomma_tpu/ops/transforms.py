"""Constrained-parameter transforms (softplus bijectors).

The reference constrains positive hyperparameters through gpflow's
``positive()`` bijector — softplus, optionally shifted by a lower bound
(gpf/base.py:90 for the 1e-3 Cholesky-diagonal bound; gpflow's Gaussian
likelihood uses lower=1e-6). Here the same transforms act on raw pytree
leaves so the L-BFGS optimizer works in unconstrained space on-device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def softplus(x):
    return jnp.logaddexp(x, 0.0)


def inv_softplus(y):
    # log(exp(y) - 1), stable: y + log1p(-exp(-y))
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


def positive(raw, lower: float = 0.0):
    """Constrained value from raw: lower + softplus(raw)."""
    return lower + softplus(raw)


def positive_inverse(value, lower: float = 0.0):
    """Raw parameter from constrained value."""
    return inv_softplus(jnp.asarray(value) - lower)


def np_inv_softplus(y: np.ndarray) -> np.ndarray:
    y = np.asarray(y, dtype=np.float64)
    return y + np.log1p(-np.exp(-y))


def tril_indices_strict(L: int):
    """Row/col indices of the strictly-lower triangle, row-major — the packing
    order the reference uses for the trainable Cholesky lower triangle
    (gpf/base.py:93-94)."""
    rows, cols = np.tril_indices(L, k=-1)
    order = np.lexsort((cols, rows))
    return rows[order], cols[order]


def pack_tril_strict(mat: np.ndarray) -> np.ndarray:
    """Flatten the strictly-lower triangle of (L,L) mat, row-major."""
    rows, cols = tril_indices_strict(mat.shape[-1])
    return np.asarray(mat)[..., rows, cols]


def build_tril(diag: jnp.ndarray, flat_lower: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular matrix from diagonal (L,) and strict-lower flat vector."""
    L = diag.shape[-1]
    rows, cols = tril_indices_strict(L)
    out = jnp.diag(diag)
    if len(rows):
        out = out.at[rows, cols].set(flat_lower)
    return out
