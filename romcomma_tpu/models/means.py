"""Mean functions for the GP prior (reference: romcomma/gpf/mean_functions.py).

The reference's ``MOMeanFunction`` broadcasts a gpflow MeanFunction across L
outputs and defaults to ``Zero`` (gpf/mean_functions.py:30-64); every model
the reference constructs uses that default (gpf/models.py:127). Here the GP
core (models.gp) is written against the Zero prior mean directly; a non-zero
mean composes functionally: fit on ``y - mean(x)``, predict as
``mean(xs) + posterior``, which `apply`/`unapply` implement.
"""

from __future__ import annotations

import jax.numpy as jnp


class Zero:
    """Zero prior mean over L outputs (the reference default)."""

    def __init__(self, L: int = 1):
        self.L = L

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.zeros((x.shape[0], self.L), dtype=x.dtype)


class Constant:
    """Constant prior mean c (L,) per output."""

    def __init__(self, c) -> None:
        self.c = jnp.atleast_1d(jnp.asarray(c))
        self.L = self.c.shape[0]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.broadcast_to(self.c[None, :], (x.shape[0], self.L)).astype(x.dtype)


def apply(mean, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Residual targets for fitting a GP with a non-zero prior mean."""
    return y - mean(x)


def unapply(mean, xs: jnp.ndarray, posterior_mean: jnp.ndarray) -> jnp.ndarray:
    """Add the prior mean back onto the posterior mean at test points."""
    return posterior_mean + mean(xs)
