"""Pallas TPU kernels for the gram hot path.

The ARD-RBF gram is the O(N^2 M) inner loop of every LML evaluation
(reference call sites: romcomma/gpf/kernels.py:82-113 build an explicit
difference tensor; gpflow's per-output RBF does the same). The XLA fallback
in ``romcomma_tpu.ops.gram`` already uses the matmul expansion; this module
fuses the whole tile pipeline — row-norm computation, the MXU cross-term
matmul, and the exp epilogue — into one Pallas kernel so the (A,B) cross
term never round-trips through HBM.

Layout (per pallas guide):
  - grid (A/TA, B/TB); u/v tiles live in VMEM, M padded to the 128-lane
    boundary with zeros (zero padding leaves squared distances unchanged).
  - cross term via lax.dot_general on the MXU with f32 accumulation.
  - epilogue on the VPU: sqdist = relu(uu + vv - 2 uv) -> exp(-.5 d).

The differentiable core is ``unit_gram(u, v) = exp(-1/2 ||u_a - v_b||^2)``
with an analytic custom VJP: with W = gbar * E, the input cotangents are
    dL/du = W @ v - u * rowsum(W),   dL/dv = W.T @ u - v * colsum(W)
— all MXU matmuls, never an (A,B,M) tensor. Lengthscale scaling and the
variance factor are applied *outside* the op, so JAX's chain rule carries
gradients to every hyperparameter for free.

Dispatch policy: ``ops.gram`` routes here only for float32 inputs on a TPU
backend (or under forced interpret mode for tests); float64 and CPU runs use
the jnp path, which is also the numerical oracle for the kernel tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Tile sizes for the gram grid. 256x256 f32 out-tile + two 256x128 input
#: tiles is ~0.5 MB VMEM; small enough to double-buffer, big enough for MXU.
TILE_A = 256
TILE_B = 256
LANE = 128

_INTERPRET = False  # flipped by tests to run kernels on CPU


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_axis(x: jnp.ndarray, axis: int, size: int) -> jnp.ndarray:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _gram_kernel(u_ref, v_ref, out_ref):
    """One (TILE_A, TILE_B) gram tile: exp(-1/2 ||u_a - v_b||^2)."""
    u = u_ref[:]                                        # (TA, Mp)
    v = v_ref[:]                                        # (TB, Mp)
    uu = jnp.sum(u * u, axis=1, keepdims=True)          # (TA, 1)
    vv = jnp.sum(v * v, axis=1, keepdims=True)          # (TB, 1)
    # precision=HIGHEST: preferred_element_type only sets the ACCUMULATOR
    # type — without it the v5e MXU multiplies in one bf16 pass, which
    # costs ~3 decimal digits in the gram (measured 1e-2 abs err at M=30)
    # and drags the whole f32 LML to ~4e-3 relative error.
    uv = lax.dot_general(u, v, dimension_numbers=(((1,), (1,)), ((), ())),
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
    sqd = jnp.maximum(uu + vv.T - 2.0 * uv, 0.0)
    out_ref[:] = jnp.exp(-0.5 * sqd)


def _unit_gram_impl(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """exp(-1/2 ||u_a - v_b||^2) over rows of u (A,M), v (B,M) via Pallas."""
    A, M = u.shape
    B = v.shape[0]
    Ap, Bp, Mp = _round_up(A, TILE_A), _round_up(B, TILE_B), _round_up(M, LANE)
    u = _pad_axis(_pad_axis(u.astype(jnp.float32), 1, Mp), 0, Ap)
    v = _pad_axis(_pad_axis(v.astype(jnp.float32), 1, Mp), 0, Bp)
    grid = (Ap // TILE_A, Bp // TILE_B)
    out = pl.pallas_call(
        _gram_kernel,
        grid=grid,
        in_specs=[
            # zeros derived from the (i32) program ids: a literal 0 becomes
            # i64 under jax_enable_x64 and Mosaic cannot legalize mixed
            # (i32, i64) index-map returns.
            pl.BlockSpec((TILE_A, Mp), lambda i, j: (i, j * 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, Mp), lambda i, j: (j, i * 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_A, TILE_B), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ap, Bp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Ap * Bp * Mp + 4 * Ap * Bp,
            bytes_accessed=4 * (Ap * Mp + Bp * Mp + Ap * Bp),
            transcendentals=Ap * Bp),
        interpret=_INTERPRET,
    )(u, v)
    return out[:A, :B]


@jax.custom_vjp
def unit_gram(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """E[a,b] = exp(-1/2 ||u_a - v_b||^2) for u (A,M), v (B,M). f32, fused."""
    return _unit_gram_impl(u, v)


def _unit_gram_fwd(u, v):
    E = _unit_gram_impl(u, v)
    return E, (u, v, E)


def _unit_gram_bwd(res, gbar):
    u, v, E = res
    W = gbar * E
    r = jnp.sum(W, axis=1)                              # (A,)
    c = jnp.sum(W, axis=0)                              # (B,)
    du = jnp.matmul(W, v, precision=lax.Precision.HIGHEST) - u * r[:, None]
    dv = jnp.matmul(W.T, u, precision=lax.Precision.HIGHEST) - v * c[:, None]
    return du.astype(u.dtype), dv.astype(v.dtype)


unit_gram.defvjp(_unit_gram_fwd, _unit_gram_bwd)


# --------------------------------------------------------------------------- #
# Public ARD-RBF grams built on the fused core.
# --------------------------------------------------------------------------- #

def rbf_gram_pallas(x1: jnp.ndarray, x2: jnp.ndarray, lengthscales: jnp.ndarray,
                    variance: jnp.ndarray) -> jnp.ndarray:
    """Single-output ARD-RBF gram on the TPU MXU via Pallas.

    K[a,b] = variance * exp(-1/2 sum_m ((x1[a,m]-x2[b,m]) / ls[m])^2)

    Args:  x1 (A,M), x2 (B,M), lengthscales (M,) or scalar, variance scalar.
    Returns: (A,B) float32. Differentiable in every argument (scaling and
    variance sit outside the custom-VJP core).
    """
    ls = jnp.broadcast_to(jnp.asarray(lengthscales), (x1.shape[-1],))
    return variance * unit_gram(x1 / ls, x2 / ls)


def rbf_gram_variant_pallas(x1: jnp.ndarray, x2: jnp.ndarray,
                            lengthscales: jnp.ndarray, variance: jnp.ndarray) -> jnp.ndarray:
    """Batched per-output gram (L,A,B) — vmap of the Pallas tile kernel."""
    return jax.vmap(rbf_gram_pallas, in_axes=(None, None, 0, 0))(
        x1, x2, lengthscales, variance)


def rbf_gram_covariant_pallas(x1: jnp.ndarray, x2: jnp.ndarray,
                              lengthscales: jnp.ndarray, F: jnp.ndarray) -> jnp.ndarray:
    """Covariant gram (L,A,L,B): unit gram over the stacked differently-scaled
    inputs (one (LA, LB) Pallas sweep), then the (L,L) signal covariance
    applied outside (reference semantics: gpf/kernels.py:140-154)."""
    L, M = lengthscales.shape
    A, B = x1.shape[0], x2.shape[0]
    u = (x1[None, :, :] / lengthscales[:, None, :]).reshape(L * A, M)
    v = (x2[None, :, :] / lengthscales[:, None, :]).reshape(L * B, M)
    unit = unit_gram(u, v).reshape(L, A, L, B)
    return F[:, None, :, None] * unit


def available() -> bool:
    """True when the Pallas path should be used: f32 compute on a TPU-like
    backend (or tests forcing interpret mode)."""
    if _INTERPRET:
        return True
    try:
        platform = jax.default_backend()
    except Exception:
        return False
    return platform in ('tpu', 'axon')
