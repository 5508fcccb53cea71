"""Dense linear algebra helpers for the GP hot path.

All call sites in the reference route through tf.linalg
(cholesky: gpr/models.py:439, gpf/models.py:81; triangular/cholesky solves:
gpr/models.py:402-444, user/regression.py:52-56). Here they are thin jnp
wrappers so the whole training step stays inside one XLA computation —
XLA's TPU cholesky is blocked and MXU-tiled already; a Pallas variant can be
slotted in behind the same interface later.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
import jax.scipy.linalg as jsl


def cholesky(a: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor; batched over leading dims."""
    return jnp.linalg.cholesky(a)


def tri_solve(chol: jnp.ndarray, b: jnp.ndarray, lower: bool = True,
              trans: bool = False) -> jnp.ndarray:
    """Solve chol x = b (or cholᵀ x = b) for triangular chol.

    Batch dimensions broadcast against each other (TF-style), which
    lax.linalg.triangular_solve does not do natively."""
    batch = jnp.broadcast_shapes(chol.shape[:-2], b.shape[:-2])
    dt = jnp.promote_types(chol.dtype, b.dtype)   # lax requires exact match
    chol = jnp.broadcast_to(chol.astype(dt), batch + chol.shape[-2:])
    b = jnp.broadcast_to(b.astype(dt), batch + b.shape[-2:])
    return lax.linalg.triangular_solve(chol, b, left_side=True, lower=lower,
                                       transpose_a=trans)


def cho_solve(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve (chol cholᵀ) x = b given the lower Cholesky factor; batched."""
    return tri_solve(chol, tri_solve(chol, b, lower=True, trans=False),
                     lower=True, trans=True)


def add_diag(a: jnp.ndarray, d) -> jnp.ndarray:
    """Add d (scalar or (N,) vector) to the diagonal of (..., N, N) a."""
    n = a.shape[-1]
    return a + jnp.eye(n, dtype=a.dtype) * jnp.asarray(d)[..., None]


def mvn_logpdf(y: jnp.ndarray, mean: jnp.ndarray, chol: jnp.ndarray) -> jnp.ndarray:
    """Multivariate-normal log density of columns of y (N,D) under N(mean, chol cholᵀ).

    Matches gpflow.logdensities.multivariate_normal: returns (D,) — one log
    density per column of y (reference call: gpf/models.py:82).
    """
    d = y - mean
    alpha = tri_solve(chol, d, lower=True)
    num_dims = y.shape[0]
    p = -0.5 * jnp.sum(alpha * alpha, axis=0)
    p -= 0.5 * num_dims * jnp.log(2.0 * jnp.pi)
    p -= jnp.sum(jnp.log(jnp.diagonal(chol)))
    return p
