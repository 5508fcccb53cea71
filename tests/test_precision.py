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


def test_f32_exact_sd_routes_through_f64_factors(tmp_path, monkeypatch):
    """In the f32 fast mode, GPR.predict's default exact_sd routes the
    variance solve through host f64 factors: the SD (and hence the Z-score /
    outlier columns of test()) match the f64 oracle to ~1e-6, while the
    fast (exact_sd=False) working-dtype solve is measurably worse at high
    condition number (VERDICT round-1 item 10)."""
    import pandas as pd
    from romcomma_tpu.base import definitions
    from romcomma_tpu.data.storage import Fold, Repository
    from romcomma_tpu.models.gpr import MOGP

    monkeypatch.setattr(definitions, '_F32_MODE', True)
    assert definitions.FLOAT().itemsize == 4

    rng = np.random.default_rng(0)
    N, M = 2048, 4                      # N >= HOST_F64_BELOW_N: factors NOT
    X = rng.uniform(size=(N, M))        # auto-routed to host; the exact-SD
    y = np.sin(2 * np.pi * X[:, 0]) + 0.3 * X[:, 1]     # branch must kick in
    y = y + 0.001 * rng.standard_normal(N)
    columns = pd.MultiIndex.from_tuples([('X', f'X.{i}') for i in range(M)]
                                        + [('Y', 'Y.0')])
    df = pd.DataFrame(np.column_stack([X, y]), columns=columns, dtype=float)
    repo = Repository.from_df(tmp_path / 'repo', df).into_K_folds(-1)
    fold = Fold(repo, 0)
    gpm = MOGP('gpr.sd', fold, is_read=False, is_covariant=False,
               is_isotropic=False,
               likelihood_variance=np.atleast_2d(1e-4))  # tiny noise: cond ~ 1e6
    gpm.kernel.data.replace(lengthscales=np.full((1, M), 1.0))
    xs = gpm.X[::8][:256]

    mean_e, sd_e = gpm.predict(xs)                      # default: exact SD
    mean_f, sd_f = gpm.predict(xs, exact_sd=False)      # fast f32 SD

    # f64 oracle from the raw parameters.
    import jax
    from romcomma_tpu.models import gp as gpcore
    raw64 = jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a), jnp.float64),
                                   gpm._variant_raw())
    m64, v64 = gpcore.predict_variant(raw64, jnp.asarray(gpm._X, jnp.float64),
                                      jnp.asarray(gpm._Y, jnp.float64),
                                      jnp.asarray(np.asarray(xs), jnp.float64))
    sd64 = np.sqrt(np.asarray(v64))
    rel_exact = np.max(np.abs(sd_e - sd64) / sd64)
    rel_fast = np.max(np.abs(sd_f - sd64) / sd64)
    assert rel_exact < 1e-6, rel_exact
    # The fast path's error is what motivated the routing; don't assert its
    # exact size (platform-dependent), just that exact is categorically better.
    assert rel_exact < rel_fast / 10 or rel_fast < 1e-6, (rel_exact, rel_fast)
    # Z-scores built on the exact SD agree with the f64 oracle.
    z_e = (np.asarray(mean_e) - np.asarray(m64)) / sd_e
    z64 = 0.0
    assert np.max(np.abs(z_e - z64)) < 1e-3
