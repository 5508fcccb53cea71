"""Mean functions for the GP prior (reference: romcomma/gpf/mean_functions.py).

The reference's ``MOMeanFunction`` broadcasts a gpflow MeanFunction across L
outputs and defaults to ``Zero`` (gpf/mean_functions.py:30-64); every model
the reference constructs uses that default (gpf/models.py:127). Here the GP
core (models.gp) is written against the Zero prior mean directly; a non-zero
mean composes functionally through ``GPR(..., mean_function=...)``
(models/gpr.py): the GP fits the residuals ``Y - mean(X)`` and predictions
(predict / predict_f / predict_df / predict_gradient) add the mean back.
"""

from __future__ import annotations

import jax.numpy as jnp


class Zero:
    """Zero prior mean over L outputs (the reference default)."""

    def __init__(self, L: int = 1):
        self.L = L

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros((x.shape[0], self.L), dtype=x.dtype)

    def gradient(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros((x.shape[0], self.L, x.shape[1]), dtype=x.dtype)


class Constant:
    """Constant prior mean c (L,) per output."""

    def __init__(self, c) -> None:
        self.c = jnp.atleast_1d(jnp.asarray(c))
        self.L = self.c.shape[0]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.broadcast_to(self.c[None, :], (x.shape[0], self.L)).astype(x.dtype)

    def gradient(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros((x.shape[0], self.L, x.shape[1]), dtype=x.dtype)


class Linear:
    """Affine prior mean A^T x + b: A (M,L), b (L,)."""

    def __init__(self, A, b) -> None:
        self.A = jnp.atleast_2d(jnp.asarray(A))
        self.b = jnp.atleast_1d(jnp.asarray(b))
        self.L = self.b.shape[0]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return (x @ self.A + self.b[None, :]).astype(x.dtype)

    def gradient(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.broadcast_to(self.A.T[None, :, :],
                                (x.shape[0],) + self.A.T.shape).astype(x.dtype)
