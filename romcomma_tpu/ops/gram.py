"""ARD-RBF gram construction, designed for the TPU MXU.

The reference builds pairwise scaled differences as an explicit
(L,N,L,N,M) tensor and contracts it (romcomma/gpf/kernels.py:74-113,153-154,
via gpflow's ``difference_matrix``). On TPU this is the wrong shape: it is
HBM-bandwidth-bound and never touches the MXU. Here the squared distance is
computed by the matmul expansion

    ||u - v||^2 = ||u||^2 + ||v||^2 - 2 u.v

so the O(N^2 M) work is a single batched matmul on the MXU and XLA fuses the
exp into the matmul epilogue. No (N,N,M) intermediate is ever materialized.

Kernel definitions (matching reference semantics exactly):
  variant (independent outputs, gpflow RBF per output l):
      K_l[n,n'] = s2_l * exp(-1/2 sum_m ((x_n[m]-x_n'[m]) / lam_l[m])^2)
  covariant (MOStationary/RBF, gpf/kernels.py:140-154):
      K[l,n,j,n'] = F[l,j] * exp(-1/2 sum_m (x_n[m]/lam_l[m] - x_n'[m]/lam_j[m])^2)
  i.e. the cross-output blocks difference the *differently scaled* inputs
  (gpflow flattens batch dims in difference_matrix, producing the full outer
  difference of X/lam over (l,n) x (j,n')).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sqdist(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distance matrix between rows of u (A,M) and v (B,M),
    by matmul expansion, clamped at 0 against cancellation."""
    uu = jnp.sum(u * u, axis=-1)
    vv = jnp.sum(v * v, axis=-1)
    uv = u @ v.T
    return jnp.maximum(uu[:, None] + vv[None, :] - 2.0 * uv, 0.0)


def _use_pallas(*arrays) -> bool:
    """Route to the fused Pallas tile kernel for f32 compute on TPU; the jnp
    path below stays as the f64/CPU implementation and numerical oracle."""
    from romcomma_tpu.ops import pallas_kernels
    return (all(jnp.asarray(a).dtype == jnp.float32 for a in arrays)
            and pallas_kernels.available())


def rbf_gram(x1: jnp.ndarray, x2: jnp.ndarray, lengthscales: jnp.ndarray,
             variance: jnp.ndarray, ff_exp: bool = False) -> jnp.ndarray:
    """Single-output ARD-RBF gram: variance * exp(-1/2 ||(x1-x2)/ls||^2).

    Args:
        x1: (A,M) inputs. x2: (B,M) inputs.
        lengthscales: (M,) or scalar. variance: scalar.
        ff_exp: evaluate a float64 gram's exp through the float-float tier
            (ops.fastmath.ff_exp_nonpos, ~3e-11 relative — the RBF exponent
            is non-positive by construction) instead of the emulated-f64
            transcendental; the fast mode for f64 grams on accelerators
            (refinement residuals rebuild O(N^2) of them per round).
            Ignored for non-f64 dtypes.
    Returns: (A,B).
    """
    if _use_pallas(x1, x2, lengthscales, variance):
        from romcomma_tpu.ops import pallas_kernels
        return pallas_kernels.rbf_gram_pallas(x1, x2, jnp.asarray(lengthscales),
                                              jnp.asarray(variance))
    ls = jnp.broadcast_to(jnp.asarray(lengthscales), (x1.shape[-1],))
    e = -0.5 * _sqdist(x1 / ls, x2 / ls)
    if ff_exp and e.dtype == jnp.float64:
        from romcomma_tpu.ops.fastmath import ff_exp_nonpos
        return variance * ff_exp_nonpos(e)
    return variance * jnp.exp(e)


def rbf_gram_variant(x1: jnp.ndarray, x2: jnp.ndarray, lengthscales: jnp.ndarray,
                     variance: jnp.ndarray) -> jnp.ndarray:
    """Batched per-output ARD-RBF gram, vmapped over the L axis.

    Args:
        x1: (A,M). x2: (B,M).
        lengthscales: (L,M). variance: (L,).
    Returns: (L,A,B).
    """
    return jax.vmap(rbf_gram, in_axes=(None, None, 0, 0))(x1, x2, lengthscales, variance)


def rbf_gram_covariant(x1: jnp.ndarray, x2: jnp.ndarray, lengthscales: jnp.ndarray,
                       F: jnp.ndarray) -> jnp.ndarray:
    """Covariant multi-output ARD-RBF gram.

    K[l,a,j,b] = F[l,j] * exp(-1/2 || x1_a/lam_l - x2_b/lam_j ||^2)

    computed as one (L*A, L*B) MXU matmul over scaled inputs.

    Args:
        x1: (A,M). x2: (B,M). lengthscales: (L,M). F: (L,L) signal covariance.
    Returns: (L,A,L,B).
    """
    if _use_pallas(x1, x2, lengthscales, F):
        from romcomma_tpu.ops import pallas_kernels
        return pallas_kernels.rbf_gram_covariant_pallas(x1, x2, lengthscales, F)
    L, M = lengthscales.shape
    A, B = x1.shape[0], x2.shape[0]
    u = (x1[None, :, :] / lengthscales[:, None, :]).reshape(L * A, M)
    v = (x2[None, :, :] / lengthscales[:, None, :]).reshape(L * B, M)
    unit = jnp.exp(-0.5 * _sqdist(u, v)).reshape(L, A, L, B)
    return F[:, None, :, None] * unit


def rbf_gram_covariant_unit(x: jnp.ndarray, lengthscales: jnp.ndarray) -> jnp.ndarray:
    """Unit-variance covariant gram (L,N,L,N) — the cacheable factor the
    reference reuses when only the variance trains (gpf/kernels.py:74-104).

    On TPU the (LN,M)@(M,LN) cross term MUST go through the fused Pallas
    tile kernel: XLA lowers the thin-contraction (M ~ 10-30) matmul of the
    jnp fallback into a broadcast-and-reduce that materializes an
    (8, LN, LN) HLO temp — 33 GB at LN=32k, an instant compile-time OOM
    (measured, chain5 2026-08-18)."""
    if _use_pallas(x, lengthscales):
        from romcomma_tpu.ops import pallas_kernels
        L, M = lengthscales.shape
        N = x.shape[0]
        u = (x[None, :, :] / lengthscales[:, None, :]).reshape(L * N, M)
        return pallas_kernels.unit_gram(u, u).reshape(L, N, L, N)
    L, M = lengthscales.shape
    N = x.shape[0]
    u = (x[None, :, :] / lengthscales[:, None, :]).reshape(L * N, M)
    return jnp.exp(-0.5 * _sqdist(u, u)).reshape(L, N, L, N)
