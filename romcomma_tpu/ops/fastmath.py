"""Fast mixed-precision transcendentals for emulated-f64 accelerator paths.

TPUs have no native float64: XLA emulates every f64 elementwise op as
float-float arithmetic, and transcendentals (exp) pay a full double-double
range reduction + high-degree polynomial core. The helpers here trade the
last ~20 bits — which no downstream consumer in this framework needs — for
an order-of-magnitude cheaper evaluation.

Home of the implementation shared by the GSA sweep tiers (gsa/base.py
re-exports :func:`ff_exp_nonpos` as part of its public surface) and the
posterior-refinement residual gram (ops/gram.rbf_gram(ff_exp=True)).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

#: ln 2 split so the f64 product n * LN2 reconstructs the reduction exactly
_LN2 = 0.6931471805599453
_INV_LN2_F32 = 1.4426950408889634


# -- double-f32 ("df") arithmetic ------------------------------------------- #
#
# An unevaluated (hi, lo) pair of float32 with hi = fl(x), |lo| <~ eps |hi|
# — ~48 bits of effective mantissa at native f32 VPU rate. This is the 'df'
# GSA interval tier's number system: on TPU every f64 elementwise op is
# software-emulated at ~10-20x an f32 op AND doubles the HBM bytes of the
# (N, chunk) plane streams, while the pairs here stay in plain f32 tensors.
# The error-free transformations are the classical branch-free ones (Knuth
# two_sum, Dekker split/two_prod — no FMA assumed; if XLA contracts
# a*b - p into an FMA the Dekker error term becomes exact rather than
# wrong, so correctness is robust either way).  Ops deliberately do NOT
# renormalize unless stated: callers accumulate few enough terms that
# |lo| stays far below |hi| and the final consumer adds hi + lo in f64.

_F32 = jnp.float32
#: Dekker splitter for the 24-bit f32 mantissa: 2^12 + 1.
_SPLIT = np.float32(4097.0)


#: runtime-opaque 1.0f (a traced value, never a literal) installed by
#: :func:`opaque_one` — see _seal.
_OPAQUE_ONE = None


class opaque_one:
    """Context manager installing a RUNTIME float32 1.0 for _seal.

    ``one`` must be a traced jit argument (e.g. a pack entry), never a
    Python/numpy literal: the whole point is that the compiler cannot
    prove its value, so ``x * one`` is an unfoldable identity."""

    def __init__(self, one):
        self.one = one

    def __enter__(self):
        global _OPAQUE_ONE
        self._old, _OPAQUE_ONE = _OPAQUE_ONE, self.one
        return self

    def __exit__(self, *exc):
        global _OPAQUE_ONE
        _OPAQUE_ONE = self._old
        return False


def _seal(*xs):
    """Pin EFT-critical intermediates against value-changing rewrites.

    Two compiler behaviors break error-free transformations (both
    verified in dumped HLO / bitwise A-B tests on XLA:CPU):
      1. algsimp applies ``sub(add(x, y), y) -> x`` — exact in real
         arithmetic, WRONG in floats, and exactly the two_sum pattern;
      2. the CPU emitter FMA-contracts ``mul + add`` EVEN ACROSS an
         optimization_barrier (s = fl(p + sh) became fma(x, y, sh) with
         p = barrier(x * y) — a 1-ulp non-IEEE add that silently destroys
         the captured rounding).
    Inside an :class:`opaque_one` context the seal is ``x * one`` with a
    runtime 1.0 — value-exact, register-cheap, no fusion boundary, and
    opaque to both rewrites (contracting through it yields
    ``fma(p, 1, sh) = fl(p + sh)``, the IEEE add itself). Outside a
    context it falls back to an optimization_barrier, which suffices for
    rewrite (1) and for eager/op-by-op execution."""
    if _OPAQUE_ONE is not None:
        one = _OPAQUE_ONE
        sealed = tuple(x * one for x in xs)
    else:
        from jax import lax
        sealed = lax.optimization_barrier(tuple(xs))
    return sealed if len(xs) > 1 else sealed[0]


def two_sum(a, b):
    """Knuth branch-free exact sum: a + b = s + e with s = fl(a + b)."""
    s = _seal(a + b)
    bb = _seal(s - a)
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Exact sum REQUIRING |a| >= |b| (3 ops)."""
    s = _seal(a + b)
    return s, b - (s - a)


def dekker_split(a):
    """a = hi + lo with hi, lo each fitting 12 mantissa bits."""
    c = _SPLIT * a
    hi = _seal(c - _seal(c - a))
    return hi, a - hi


def two_prod(a, b):
    """Dekker exact product: a * b = p + e with p = fl(a * b)."""
    p = _seal(a * b)
    ahi, alo = dekker_split(a)
    bhi, blo = dekker_split(b)
    e = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, e


def split_f64(x):
    """float64 -> (hi, lo) float32 pair with hi + lo == x to f32-pair
    precision (the staging op of every df input). The hi convert is sealed:
    fused unsealed, the XLA CPU emitter computes a downstream
    ``f32(x) + q`` as an f64 add rounded once (excess precision), which is
    a different f32 value than the IEEE two-step — a 1-ulp divergence that
    defeats the two_sum error capture (measured at s of df_add_norm)."""
    hi = _seal(jnp.asarray(x, _F32))
    lo = jnp.asarray(x - jnp.asarray(hi, x.dtype), _F32)
    return hi, lo


def df_add(x, y):
    """(x_hi+x_lo) + (y_hi+y_lo) with the hi-sum error captured exactly.

    NOT renormalized: when x and y cancel, |lo| of the result can be far
    above eps |hi| — any result feeding a first-order op (df_mul,
    df_square) must go through :func:`df_add_norm` instead, or the dropped
    second-order lo terms dominate the error (measured: 9e-6 relative on a
    cancelling (a-b)^2 pipeline vs 1e-14 normalized)."""
    s, e = two_sum(x[0], y[0])
    return s, e + (x[1] + y[1])


def df_add_norm(x, y):
    """df_add + renormalization (|lo| <= eps |hi|) — the cancellation-safe
    form for results that feed multiplications."""
    s, e = two_sum(x[0], y[0])
    return quick_two_sum(s, e + (x[1] + y[1]))


def df_neg(x):
    return -x[0], -x[1]


def df_mul(x, y):
    """(x_hi+x_lo) * (y_hi+y_lo) to first order in the lo parts."""
    p, e = two_prod(x[0], y[0])
    return p, e + (x[0] * y[1] + x[1] * y[0])


def df_square(x):
    """x * x exploiting symmetry (one Dekker split instead of two)."""
    p = _seal(x[0] * x[0])
    hi, lo = dekker_split(x[0])
    e = ((hi * hi - p) + 2.0 * (hi * lo)) + lo * lo
    return p, e + 2.0 * (x[0] * x[1])


def df_normalize(x):
    """Compress the pair so |lo| <= eps |hi| (one quick_two_sum)."""
    return quick_two_sum(x[0], x[1])


def df_to_f64(x):
    return jnp.asarray(x[0], jnp.float64) + jnp.asarray(x[1], jnp.float64)


# -- double-f32 exp --------------------------------------------------------- #
#
# exp(r) for r <= 0 (clamped at -87) on a df pair, to ~1e-12 relative, with
# no f64 ops and no gather: Cody-Waite reduction r = (8n + j) ln2/8 + d with
# |d| <= ln2/16 ~ 0.0434, a degree-2 df core + f32 degree-3 tail, and the
# 8-entry 2^(j/8) df table selected by a branch-free binary where-tree.
# The ln2/8 splits keep k*c1 and k*c2 EXACT in f32 for |k| < 2^11 (12-bit
# mantissas against k's <= 11 bits), so the reduced argument carries no
# cancellation error.

_LN2_8 = _LN2 / 8.0
_INV_LN2_8 = np.float32(8.0 / _LN2)
_C1 = np.float32(np.trunc(_LN2_8 * 2 ** 16) / 2 ** 16)           # 12-bit
_C2 = np.float32(np.trunc((_LN2_8 - float(_C1)) * 2 ** 28) / 2 ** 28)
_C3 = np.float32(_LN2_8 - float(_C1) - float(_C2))

_J8 = np.exp2(np.arange(8) / 8.0)                                 # float64
_T_HI = np.asarray(_J8, np.float32)
_T_LO = np.asarray(_J8 - np.asarray(_T_HI, np.float64), np.float32)


def _select8(j1, j2, j4, table):
    """Branch-free 8-way constant select by binary digits (f32 bool masks)."""
    t = [np.float32(v) for v in table]
    a = jnp.where(j1, t[1], t[0])
    b = jnp.where(j1, t[3], t[2])
    c = jnp.where(j1, t[5], t[4])
    d = jnp.where(j1, t[7], t[6])
    ab = jnp.where(j2, b, a)
    cd = jnp.where(j2, d, c)
    return jnp.where(j4, cd, ab)


def df_exp_nonpos(r_hi, r_lo):
    """exp(r_hi + r_lo) for NON-POSITIVE df input to ~1e-12 relative error
    at pure-f32 rate — the transcendental of the 'df' GSA interval tier.
    Entries below -87 are clamped (zero relative dust downstream, same
    policy as :func:`ff_exp_nonpos`). Returns a df pair."""
    clamp = r_hi < -87.0
    r_hi = jnp.where(clamp, np.float32(-87.0), r_hi)
    r_lo = jnp.where(clamp, np.float32(0.0), r_lo)
    k = jnp.round(r_hi * _INV_LN2_8)                  # int-valued f32
    d1 = r_hi - k * _C1                               # exact (Sterbenz)
    d_hi, e_d = two_sum(d1, -(k * _C2))               # capture the rounding
    d_lo = e_d + (r_lo - k * _C3)
    # core = exp(d_hi) * exp(d_lo): the hi factor is a pure-d_hi expansion
    # 1 + d + d^2/2 + d^3 R(d) (R in plain f32 — its rounding scales a
    # <= 8.2e-5 term: ~4e-13 absolute); the lo factor multiplies in as a
    # first-order correction on the pair (d_lo <= ~5e-6, so d_lo^3/6 is
    # ~2e-17 dust). Keeping the factors separate avoids every d_hi^k d_lo
    # cross term a direct expansion of (d_hi + d_lo)^k would need.
    R = np.float32(1 / 6) + d_hi * (np.float32(1 / 24) + d_hi * (
        np.float32(1 / 120) + d_hi * np.float32(1 / 720)))
    p, e = two_prod(d_hi, d_hi)                       # d_hi^2 exactly
    t = (p * d_hi) * R
    s_hi, s_e = two_sum(d_hi, np.float32(0.5) * p)
    s_lo = s_e + (np.float32(0.5) * e + t)
    c_hi, c_e = quick_two_sum(np.float32(1.0), s_hi)
    c_lo = c_e + s_lo
    c_lo = c_lo + c_hi * (d_lo * (np.float32(1.0) + np.float32(0.5) * d_lo))
    # table factor 2^(j/8), j = k mod 8; n = (k - j)/8
    n = jnp.floor(k * np.float32(0.125))
    j = k - 8.0 * n                                   # exact, in [0, 8)
    j4 = j >= 4.0
    r4 = j - jnp.where(j4, np.float32(4.0), np.float32(0.0))
    j2 = r4 >= 2.0
    j1 = (r4 - jnp.where(j2, np.float32(2.0), np.float32(0.0))) >= 1.0
    T_hi = _select8(j1, j2, j4, _T_HI)
    T_lo = _select8(j1, j2, j4, _T_LO)
    m_hi, m_e = two_prod(c_hi, T_hi)
    m_lo = m_e + (c_hi * T_lo + c_lo * T_hi)
    pow2 = jnp.ldexp(np.float32(1.0), n.astype(jnp.int32))
    return m_hi * pow2, m_lo * pow2


def ff_exp_nonpos(r: jnp.ndarray) -> jnp.ndarray:
    """exp(r) for NON-POSITIVE float64 ``r`` to ~3e-11 relative error with
    no f64 transcendental — the 'ff' (float-float) tier of the GSA sweeps
    and the refinement-residual gram.

    On TPU float64 is software-emulated and ``jnp.exp`` costs a full
    double-double range reduction + high-degree core; the GSA planes only
    need ~35 bits (the W/T assembly amplifies plane noise into near-zero T
    entries by ~1e3, so f32's 6e-8 floors T at ~1e-4..3e-3 while 3e-11
    keeps every T within ~1e-7 of the f64 oracle). This evaluation is:

      n  = round(r / ln2)                      (f32 — exact for |n| < 2^23)
      d  = r - n ln2                           (2 f64 ops, |d| <= 0.3466)
      exp(d) = 1 + d(1 + d(1/2 + d(1/6 + d(1/24 + d P5(d)))))
               -- Horner in f64 (10 elementwise ops); the degree-5..10 tail
                  P5 in plain f32 (its 2^-24 noise lands below 3e-12)
      exp(r) = exp(d) * 2^n                    (exact f32 ldexp, 1 f64 mul)

    Entries below -87 are clamped: exp(-87) ~ 1.6e-38 is zero relative dust
    against the plane max exp(0) = 1 in every downstream reduction."""
    r = jnp.maximum(r, -87.0)
    n = jnp.round(r.astype(jnp.float32) * jnp.float32(_INV_LN2_F32))
    d = r - n.astype(jnp.float64) * _LN2                   # |d| <= ln2/2 + eps
    d32 = d.astype(jnp.float32)
    # degree-5..10 tail: P5 = sum_{k>=5} d^{k-5}/k!  (f32 is plenty: the
    # term it scales is <= |d|^5/120 ~ 4e-5)
    p5 = jnp.float32(1 / 120.0) + d32 * (
        jnp.float32(1 / 720.0) + d32 * (
            jnp.float32(1 / 5040.0) + d32 * (
                jnp.float32(1 / 40320.0) + d32 * (
                    jnp.float32(1 / 362880.0) + d32 * jnp.float32(1 / 3628800.0)))))
    core = 1.0 + d * (1.0 + d * (0.5 + d * (
        jnp.float64(1 / 6) + d * (jnp.float64(1 / 24) + d * p5.astype(jnp.float64)))))
    pow2 = jnp.ldexp(jnp.float32(1.0), n.astype(jnp.int32)).astype(jnp.float64)
    return core * pow2
