"""f32 fast-path consistency: the TPU benchmark mode (ROMCOMMA_X64=0) runs
the same math in float32. These tests bound the f32/f64 divergence through
the LML, posterior, and closed-Sobol chains — the justification for
reporting benchmark numbers from the f32 path."""

import jax
import jax.numpy as jnp
import numpy as np

from romcomma_tpu.models import gp
from romcomma_tpu.models.params import variant_init
from romcomma_tpu.gsa.calibrators import ClosedSobol


def _problem(N=200, M=4, L=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1.5, 1.5, (N, M))
    f = np.stack([np.sin(np.pi * x[:, 0]) + 0.3 * x[:, 1],
                  x[:, 2] ** 2 - 0.5 * x[:, 3]], axis=-1)[:, :L]
    y = f + 0.05 * rng.standard_normal((N, L))
    raw = variant_init(np.full(L, 1.0), np.full((L, M), 1.0), np.full(L, 0.05))
    return x, y, raw


def _cast(tree, dt):
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dt), tree)


def test_lml_f32_close_to_f64():
    x, y, raw = _problem()
    lml64 = gp.lml_variant(_cast(raw, jnp.float64), jnp.asarray(x), jnp.asarray(y))
    lml32 = gp.lml_variant(_cast(raw, jnp.float32),
                           jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))
    np.testing.assert_allclose(np.asarray(lml32), np.asarray(lml64), rtol=1e-4)


def test_predict_f32_close_to_f64():
    x, y, raw = _problem()
    xs = x[:32]
    m64, v64 = gp.predict_variant(_cast(raw, jnp.float64), jnp.asarray(x),
                                  jnp.asarray(y), jnp.asarray(xs))
    m32, v32 = gp.predict_variant(_cast(raw, jnp.float32),
                                  jnp.asarray(x, jnp.float32),
                                  jnp.asarray(y, jnp.float32),
                                  jnp.asarray(xs, jnp.float32))
    np.testing.assert_allclose(np.asarray(m32), np.asarray(m64), atol=2e-3)
    np.testing.assert_allclose(np.asarray(v32), np.asarray(v64), atol=2e-3)
    assert np.all(np.asarray(v32) > 0)


def test_calibrate_f32_params_f64_data():
    """f32 fast-path calibration must accept f64 data under x64 capability:
    the objective is pinned to the params' working dtype (regression — optax's
    value_and_grad_from_state lax.cond branches diverged f32/f64 and the
    whole fused descent failed to trace)."""
    from romcomma_tpu.models.params import variant_mask
    x, y, raw = _problem(N=64, L=1)
    raw32 = _cast(raw, jnp.float32)
    raw_opt, lml, iters = gp.calibrate_variant(raw32, variant_mask(),
                                               jnp.asarray(x), jnp.asarray(y),
                                               maxiter=15)
    assert np.all(np.isfinite(np.asarray(lml)))
    assert jax.tree_util.tree_leaves(raw_opt)[0].dtype == jnp.float32


def test_closed_sobol_f32_close_to_f64():
    x, y, raw = _problem()
    L, M, N = y.shape[1], x.shape[1], x.shape[0]

    def sobol(dt):
        r = _cast(raw, dt)
        xx, yy = jnp.asarray(x, dt), jnp.asarray(y, dt)
        K_cho, K_inv_Y = gp.posterior_factors_variant(r, xx, yy)
        from romcomma_tpu.models.params import variant_constrain
        c = variant_constrain(r)
        cal = ClosedSobol.from_arrays(
            F=c['variance'][None, :], K_cho=K_cho, K_inv_Y=K_inv_Y,
            Lambda=c['lengthscales'], X=xx, is_F_diagonal=True, L=L, M=M, N=N)
        return np.asarray(cal.marginalize((0, 2))['S'])

    s64, s32 = sobol(jnp.float64), sobol(jnp.float32)
    # Sobol indices live in [~0,1]; f32 agreement far inside the reported
    # standard errors T (which are O(1e-2) on such datasets).
    np.testing.assert_allclose(s32, s64, atol=1e-3)
