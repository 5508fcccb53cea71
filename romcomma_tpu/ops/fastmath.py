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

import jax.numpy as jnp

#: ln 2 split so the f64 product n * LN2 reconstructs the reduction exactly
_LN2 = 0.6931471805599453
_INV_LN2_F32 = 1.4426950408889634


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
