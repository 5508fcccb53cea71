"""GSA primitives: the (un-normalized) Gaussian pdf algebra.

Counterpart of the reference's ``romcomma/gsa/base.py``. ``Gaussian`` stores a
pdf as a broadcast-aware (exponent, cho_diag) pair so *ratios* of Gaussians
cost one exp and no overflow (reference gsa/base.py:52-127). Broadcast
semantics — including the LBunch axis-insertion rule and the equal-shape
outer-product rule — are reproduced exactly, since every ClosedSobol einsum
downstream depends on them.
"""

from __future__ import annotations

import copy
from abc import ABC, abstractmethod
from typing import Dict, Sequence

import jax.numpy as jnp

from romcomma_tpu.ops.linalg import tri_solve


def shifted_exp(E: jnp.ndarray, axes, mode: str = 'f32',
                negate: bool = False) -> tuple:
    """(exp(E - c), c) with c = max(E) over ``axes`` (keepdims) — the
    mixed-precision GSA transcendental.

    The shifted exp is evaluated below f64-transcendental cost — the TPU
    fast path where emulated-f64 exp dominates the sweeps. Shifting by the
    per-plane max is exact log-sum-exp stabilization: the argument is <= 0,
    so the fast exp can never overflow (a naive f32 exp of the raw exponent
    goes inf at E > 88 — reached at N=50k with trained tight lengthscales,
    observed as negative suffix variances), and entries far below the max
    underflow to 0 where f64 keeps < 1e-38 relative dust — negligible in
    any reduction against the dominant terms. Callers contract the plane
    over ``axes`` and multiply the reduced result by exp(c) (an f64 exp
    over the tiny remaining dims).

    ``mode`` selects the accuracy/cost tier for float64 inputs:
      'f32' — f32 exp on a two-float split of the argument (~6e-8 relative,
              the cheapest tier; the V-pass default).
      'ff'  — :func:`ff_exp_nonpos` float-float evaluation (~3e-11
              relative at a few emulated-f64 elementwise ops — no f64
              transcendental). Near-oracle T in the error (W/T) pass,
              whose mu_phi/mu_psi cancellation amplifies plane noise
              ~1000x into near-zero T entries.

    For float32 inputs the shift is applied directly (exp of the
    non-positive remainder, no split needed — the working dtype IS f32):
    the f32 fast mode reaches the same E > 88 overflow regime.

    ``negate=True`` treats ``E`` as the POSITIVE quadratic form ``P`` of an
    exponent ``-P`` (the factorized error sweeps accumulate ``sum d*d``
    without materializing the negation): the shift becomes ``min(P) - P``
    (still <= 0) and the returned ``c`` is ``-min(P)``, so callers multiply
    the reduced plane by ``exp(c)`` exactly as in the default form."""
    if negate:
        c = -jnp.min(E, axis=tuple(axes), keepdims=True)
        r = -c - E
    else:
        c = jnp.max(E, axis=tuple(axes), keepdims=True)
        r = E - c
    if E.dtype != jnp.float64:
        return jnp.exp(r), c
    if mode == 'ff':
        return ff_exp_nonpos(r), c
    rhi = r.astype(jnp.float32)
    rlo = (r - rhi.astype(E.dtype)).astype(jnp.float32)
    return (jnp.exp(rhi) * (1.0 + rlo)).astype(E.dtype), c


def exp_mode_of(intervals_mixed, dtype):
    """Resolve a meta ``intervals_mixed`` value (False | True | 'ff' | 'df')
    and the working dtype to a plane tier: None (pure f64 exp), 'f32', 'ff'
    (float-float exp on f64 planes) or 'df' (the whole plane pipeline in
    double-f32 pairs — ops/fastmath.py — at native f32 rate). A float32
    working dtype always shifts ('f32' — the direct path; it reaches the
    same E > 88 overflow regime)."""
    if dtype != jnp.float64:
        return 'f32'
    if not intervals_mixed:
        return None
    return intervals_mixed if intervals_mixed in ('ff', 'df') else 'f32'


# the float-float exp implementation lives in the ops layer so the gram
# builders can share it without a layering inversion; re-exported here as
# part of this module's public surface (the GSA sweep tiers' home).
from romcomma_tpu.ops.fastmath import ff_exp_nonpos  # noqa: F401,E402


def contract_by_reduce(x) -> bool:
    """True when float64 plane contractions should run as elementwise
    multiply + axis reduction instead of a dot_general/einsum.

    On accelerators f64 is emulated and a dot_general runs off the MXU at
    ~10.5 ms per (8192, 2048) plane vs ~0.3 ms for multiply + reduce
    (benchmarks/egsa_ops.py, slope-timed).  On the host CPU the einsum
    lowers to native-f64 BLAS and the ranking INVERTS (~10x the other
    way, measured) — so the choice follows where the planes live: the
    concrete placement of ``x`` when it has one, the default backend when
    ``x`` is a tracer (traced constructors)."""
    try:
        return any(d.platform != 'cpu' for d in x.devices())
    except Exception:                     # tracer — no concrete placement
        import jax
        return jax.default_backend() != 'cpu'


def diag_det(tensor: jnp.ndarray) -> jnp.ndarray:
    """Determinant of a diagonal tensor stored as its last axis."""
    return jnp.prod(tensor, axis=-1)


class Calibrator(ABC):
    """Interface to a GSA calibrator."""

    @abstractmethod
    def marginalize(self, m) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError


class Gaussian:
    """An un-normalized Gaussian pdf held as (exponent, cho_diag).

    ``pdf = exp(exponent) / prod(cho_diag, -1)`` — the 2*pi factor is omitted
    throughout, exactly as in the reference (gsa/base.py:52-66).
    """

    exponent: jnp.ndarray
    cho_diag: jnp.ndarray

    def __init__(self, mean: jnp.ndarray, variance: jnp.ndarray,
                 is_variance_diagonal: bool, ordinate=None, LBunch: int = 2):
        mean = jnp.asarray(mean)
        variance = jnp.asarray(variance)
        ordinate = jnp.asarray(0.0, dtype=mean.dtype) if ordinate is None else jnp.asarray(ordinate)
        variance_cho = jnp.sqrt(variance) if is_variance_diagonal else jnp.linalg.cholesky(variance)
        # Equal-shape rule: ordinate and mean expand into each other's batch
        # dims (outer product) — reference gsa/base.py:108-112.
        if ordinate.shape == mean.shape:
            shape = list(ordinate.shape)
            fill = [1] * (len(shape) - 1)
            ordinate = ordinate.reshape(shape[:-1] + fill + [shape[-1]])
            mean = mean.reshape(fill + shape)
        ordinate = ordinate - mean
        # LBunch rule: insert broadcast axes into variance_cho every LBunch
        # output dims — reference gsa/base.py:114-118.
        insertions = variance_cho.ndim - (1 if is_variance_diagonal else 2)
        insertions -= insertions % LBunch
        for axis in range(insertions, 0, -LBunch):
            variance_cho = jnp.expand_dims(variance_cho, axis=axis)
        if is_variance_diagonal:
            target = tuple(variance_cho.shape[:-2]) + tuple(ordinate.shape[-2:])
            exponent = ordinate / jnp.broadcast_to(variance_cho, target)
        else:
            exponent = jnp.squeeze(tri_solve(variance_cho, ordinate[..., None]), axis=-1)
        self.exponent = -0.5 * jnp.einsum('...o, ...o -> ...', exponent, exponent)
        self.cho_diag = (variance_cho if is_variance_diagonal
                         else jnp.diagonal(variance_cho, axis1=-2, axis2=-1))

    @property
    def det(self) -> jnp.ndarray:
        """sqrt-determinant of the covariance (product of Cholesky diagonal)."""
        return jnp.prod(self.cho_diag, axis=-1)

    @property
    def pdf(self) -> jnp.ndarray:
        return jnp.exp(self.exponent) / self.det

    def expand_dims(self, axes: Sequence[int]) -> 'Gaussian':
        result = copy.copy(self)
        for axis in sorted(axes, reverse=True):
            result.exponent = jnp.expand_dims(result.exponent, axis)
            result.cho_diag = jnp.expand_dims(result.cho_diag,
                                              (axis - 1) if axis < 0 else axis)
        return result

    def __truediv__(self, other: 'Gaussian') -> 'Gaussian':
        result = copy.copy(self)
        result.exponent = self.exponent - other.exponent
        result.cho_diag = self.cho_diag / other.cho_diag
        return result


def sym_check(tensor: jnp.ndarray, transposition: Sequence[int]) -> jnp.ndarray:
    """Symmetry residual — debug reduction (reference gsa/base.py:129-130)."""
    return jnp.sum((tensor - jnp.transpose(tensor, transposition)) ** 2)


def mean(tensor: jnp.ndarray) -> jnp.ndarray:
    """Mean — debug reduction (reference gsa/base.py:133-135)."""
    n = tensor.size
    return jnp.sum(tensor) / n


def sos(tensor: jnp.ndarray) -> jnp.ndarray:
    """Sum of squares — debug reduction (reference gsa/base.py:138-140)."""
    return jnp.sum(tensor * tensor)


def ms(tensor: jnp.ndarray) -> jnp.ndarray:
    """Mean square — debug reduction (reference gsa/base.py:143-145)."""
    return sos(tensor) / tensor.size


def rms(tensor: jnp.ndarray) -> jnp.ndarray:
    """Root mean square — debug reduction (reference gsa/base.py:148-150)."""
    return jnp.sqrt(ms(tensor))
