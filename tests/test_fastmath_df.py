"""Unit tests for the double-f32 ("df") arithmetic in ops/fastmath.py — the
number system of the 'df' GSA interval tier. Oracles are native float64 on
the CPU backend (conftest forces jax_platforms=cpu, x64 on)."""

import numpy as np
import jax.numpy as jnp
import pytest

from romcomma_tpu.ops import fastmath as fm


def _f64(pair):
    return np.asarray(pair[0], np.float64) + np.asarray(pair[1], np.float64)


def test_two_sum_two_prod_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(4096) * 50, jnp.float32)
    b = jnp.asarray(rng.standard_normal(4096) * 50, jnp.float32)
    s, e = fm.two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    assert np.abs((np.asarray(s, np.float64) + np.asarray(e, np.float64))
                  - exact).max() == 0.0
    p, e2 = fm.two_prod(a, b)
    exactp = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    assert np.abs((np.asarray(p, np.float64) + np.asarray(e2, np.float64))
                  - exactp).max() == 0.0


def test_split_f64_reconstructs():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(4096) * 300
    hi, lo = fm.split_f64(jnp.asarray(x))
    rel = np.abs(_f64((hi, lo)) - x) / np.abs(x)
    assert rel.max() < 1e-13


def test_df_quadratic_pipeline():
    """The e_step shape: w * (a - b)^2 + sh, with heavy (a - b) cancellation
    — absolute error (the exponent metric: it maps to plane relative error)
    stays at the double-f32 level."""
    rng = np.random.default_rng(2)
    a = rng.standard_normal(65536) * 20
    b = a + rng.standard_normal(65536) * 0.01      # adversarial cancellation
    sh = rng.uniform(0, 300, 65536)
    w = -0.37
    ap, bp = fm.split_f64(jnp.asarray(a)), fm.split_f64(jnp.asarray(b))
    shp = fm.split_f64(jnp.asarray(sh))
    wp = fm.split_f64(jnp.asarray(np.full((), w)))
    d = fm.df_add_norm(ap, fm.df_neg(bp))
    q = fm.df_mul(fm.df_square(d), tuple(jnp.broadcast_to(t, d[0].shape)
                                         for t in wp))
    e = fm.df_add_norm(q, shp)
    want = w * (a - b) ** 2 + sh
    err = np.abs(_f64(e) - want)
    assert err.max() < 1e-10, err.max()


def test_df_add_requires_norm_for_products():
    """Documents WHY df_add_norm exists: an unnormalized cancelling pair fed
    to df_square loses the lo^2 term (measured ~1e-5 relative). The error
    metric is ABSOLUTE at the input scale: a cancelled difference of
    O(50)-scale pairs carries an irreducible ~1e-13 representation error,
    which dominates the RELATIVE error when d happens to be tiny."""
    rng = np.random.default_rng(3)
    a = rng.standard_normal(4096) * 50
    b = a + rng.standard_normal(4096) * 1e-3
    ap, bp = fm.split_f64(jnp.asarray(a)), fm.split_f64(jnp.asarray(b))
    d_norm = fm.df_add_norm(ap, fm.df_neg(bp))
    sq = _f64(fm.df_square(d_norm))
    want = (a - b) ** 2
    # absolute at the e-plane metric: pair representation ~1e-13 at |a|~50,
    # times 2|d| <= 7e-3 — far below 1e-12
    assert np.abs(sq - want).max() < 1e-12


def test_df_exp_nonpos_accuracy():
    """Plane-relative (vs the max entry exp(0) = 1) error <= ~3e-12, and
    pointwise relative <= 1e-10 down to r = -60 (below that the entries are
    relative dust in every GSA reduction)."""
    rng = np.random.default_rng(4)
    r = -rng.uniform(0, 87, 200000)
    r = np.concatenate([r, [-87.0, 0.0, -1e-30, -0.0433, -0.0434, -20.0,
                            -59.9, -86.99]])
    rh, rl = fm.split_f64(jnp.asarray(r))
    got = _f64(fm.df_exp_nonpos(rh, rl))
    want = np.exp(r)
    assert np.abs(got - want).max() < 5e-12            # vs plane max 1
    mask = r >= -60
    rel = np.abs(got[mask] / want[mask] - 1)
    assert rel.max() < 1e-10
    # clamp region: exact zero dust, never negative
    deep = _f64(fm.df_exp_nonpos(*fm.split_f64(jnp.asarray(np.array([-500.0])))))
    assert 0 <= deep[0] < 2e-38


def test_df_exp_float32_shift_capture():
    """The qf path feeds two_sum-captured shifted arguments; check the pair
    (r_hi, r_lo) form agrees with a pure-f64 shift."""
    rng = np.random.default_rng(5)
    E64 = -rng.uniform(0, 300, 50000)
    hi, lo = fm.split_f64(jnp.asarray(E64))
    c = jnp.max(hi)
    r_hi, e_r = fm.two_sum(hi, -c)
    got = _f64(fm.df_exp_nonpos(r_hi, e_r + lo))
    want = np.exp(E64 - float(np.asarray(c, np.float64)))
    assert np.abs(got - want).max() < 5e-12


def test_eft_survives_compilation_in_context():
    """Regression guard for the round-5 compiler findings: XLA:CPU applies
    the float-invalid algsimp rewrite sub(add(x,y),y)->x and FMA-contracts
    mul+add across optimization_barrier, both of which silently destroy
    error-free transformations INSIDE fusions (while the same ops are exact
    eagerly). The production seal (multiply by a runtime-opaque 1.0,
    fastmath.opaque_one) must keep a jitted e-step-like pipeline at pair
    accuracy; without it this test measured ~1e-6 relative error."""
    import jax

    rng = np.random.default_rng(0)
    N, c = 512, 256
    Gp = rng.standard_normal(N) * 3
    Gq = rng.standard_normal(c) * 3
    Phi, PsiPhi = 0.3, 0.25
    sh64 = 0.5 * Gp ** 2 / Phi
    w64 = -0.5 / PsiPhi
    pairs = dict(Gp=fm.split_f64(jnp.asarray(Gp)),
                 bq=fm.split_f64(jnp.asarray(Phi * Gq)),
                 sh=fm.split_f64(jnp.asarray(sh64)),
                 w=fm.split_f64(jnp.asarray(np.full((), w64))),
                 one=jnp.ones((), jnp.float32))

    def estep(p):
        with fm.opaque_one(p['one']):
            d = fm.df_add_norm(tuple(t[:, None] for t in p['Gp']),
                               fm.df_neg(tuple(t[None, :] for t in p['bq'])))
            q = fm.df_mul(fm.df_square(d),
                          tuple(jnp.broadcast_to(t, d[0].shape)
                                for t in p['w']))
            e = fm.df_add_norm(q, tuple(t[:, None] for t in p['sh']))
            c_max = jnp.max(e[0])
            r_hi, e_r = fm.two_sum(e[0], -c_max)
            ph, pl = fm.df_exp_nonpos(r_hi, e_r + e[1])
            return (ph.astype(jnp.float64) + pl.astype(jnp.float64),
                    c_max.astype(jnp.float64))

    plane, c_max = jax.jit(estep)(pairs)
    e_true = (w64 * (Gp[:, None] - Phi * Gq[None, :]) ** 2 + sh64[:, None])
    want = np.exp(e_true - float(c_max))
    assert np.abs(np.asarray(plane) - want).max() < 1e-10, \
        np.abs(np.asarray(plane) - want).max()
