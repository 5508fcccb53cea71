"""Persistent MOGP tests: calibration, persistence round-trip, test() output
formats, warm-start copy chain."""

import numpy as np
import pandas as pd

from romcomma_tpu.data.storage import Fold, Repository
from romcomma_tpu.models.gpr import MOGP
from romcomma_tpu.user import run, sample, functions


def _repo(tmp_root, N=60, M=3, K=-1):
    # Deterministic fixture: the DOE engine and the global-np.random noise
    # draw are otherwise fresh per run, which made threshold asserts flaky.
    np.random.seed(11)
    noise = sample.GaussianNoise.Variance(3, 0.1, False, True)
    return sample.Function(tmp_root, sample.DOE.latin_hypercube, functions.ISHIGAMI,
                           N, M, noise, overwrite_existing=True,
                           seed=7).repo.into_K_folds(K)


def test_mogp_calibrate_persist_reload(tmp_root):
    repo = _repo(tmp_root)
    fold = Fold(repo, 0)
    gp = MOGP('gpr.v.a', fold, is_read=False, is_covariant=False, is_isotropic=False)
    meta = gp.calibrate(maxiter=150)
    assert 'result' in meta and meta['kernel']['variance'] is True
    folder = fold.folder / 'gpr.v.a'
    for f in ['kernel.csv', 'meta.json', 'kernel/variance.csv', 'kernel/lengthscales.csv',
              'likelihood/variance.csv', 'likelihood/log_marginal.csv']:
        assert (folder / f).exists(), f
    # Reload from disk: same parameters, same LML.
    gp2 = MOGP('gpr.v.a', fold, is_read=True, is_covariant=False, is_isotropic=False)
    np.testing.assert_allclose(gp2.kernel.data.lengthscales.np,
                               gp.kernel.data.lengthscales.np, rtol=1e-12)
    lml_disk = gp.likelihood.data.log_marginal.np
    from romcomma_tpu.models import gp as gpcore
    import jax.numpy as jnp
    lml_recomputed = np.asarray(gpcore.lml_variant(gp2._variant_raw(),
                                                   jnp.asarray(gp2.X), jnp.asarray(gp2.Y)))
    np.testing.assert_allclose(lml_recomputed[None, :], lml_disk, rtol=1e-9)


def test_mogp_test_outputs(tmp_root):
    repo = _repo(tmp_root, N=100, K=2)
    # The reference's default flow: isotropic first, warm-started anisotropic —
    # which escapes the local optimum a cold anisotropic start can fall into.
    run.gpr('gpr', repo, is_read=False, is_covariant=False, is_isotropic=None,
            ignore_exceptions=False)
    fold = Fold(repo, 2)  # the improper fold: train == test == all data
    test = pd.read_csv(fold.folder / 'gpr.v.a' / 'test.csv', header=[0, 1], index_col=0)
    heads = {c[0] for c in test.columns}
    assert {'X', 'Y', 'Mean', 'SD', 'Abs Error', 'Z Score', 'Outlier'} <= heads
    assert ('Outlier', 'Any Output') in test.columns
    summary = pd.read_csv(fold.folder / 'gpr.v.a' / 'test_summary.csv', header=[0, 1], index_col=0)
    assert {'RMSE', 'SD', 'Outlier'} <= {c[0] for c in summary.columns}
    # Abs Error equals |Y - Mean|
    np.testing.assert_allclose(test['Abs Error'].values,
                               np.abs(test['Y'].values - test['Mean'].values), atol=1e-5)
    # On the improper (overfit-control) fold a trained GP must beat chance
    # easily (Y std ~ 1; the bound is loose against optimization-basin
    # variance across platforms).
    assert np.all(summary['RMSE'].values < 0.4)


def test_check_K_inv_Y_small(tmp_root):
    repo = _repo(tmp_root)
    fold = Fold(repo, 0)
    gp = MOGP('gpr.v.a', fold, is_read=False, is_covariant=False, is_isotropic=False)
    resid = gp.check_K_inv_Y(gp.X[:10])
    assert np.all(resid < 1e-8)


def test_warm_start_copy_chain(tmp_root):
    """is_read=None copies gpr.v.i -> gpr.v.a before calibrating
    (reference run.py:79-88)."""
    repo = _repo(tmp_root)
    models = run.gpr('gpr', repo, is_read=False, is_covariant=False, is_isotropic=True,
                     ignore_exceptions=False, maxiter=100)
    assert models == ['gpr.v.i']
    fold = Fold(repo, 0)
    iso_ls = MOGP('gpr.v.i', fold, True, False, True).kernel.data.lengthscales.np
    assert iso_ls.shape == (3, 1)
    models = run.gpr('gpr', repo, is_read=None, is_covariant=False, is_isotropic=False,
                     ignore_exceptions=False, is_calibrated=False, is_tested=False)
    assert models == ['gpr.v.a']
    aniso = MOGP('gpr.v.a', fold, True, False, False)
    # warm start: anisotropic lengthscales broadcast from the isotropic ones
    assert aniso.kernel.data.lengthscales.np.shape == (3, 3)
    np.testing.assert_allclose(aniso.kernel.data.lengthscales.np,
                               np.broadcast_to(iso_ls, (3, 3)), rtol=1e-12)


def test_covariant_roundtrip(tmp_root):
    repo = _repo(tmp_root, N=40)
    fold = Fold(repo, 0)
    gp = MOGP('gpr.c.a', fold, is_read=False, is_covariant=True, is_isotropic=False)
    assert gp.is_covariant
    assert gp.kernel.data.variance.np.shape == (3, 3)
    gp.calibrate(maxiter=60)
    gp2 = MOGP('gpr.c.a', fold, is_read=True, is_covariant=True, is_isotropic=False)
    mean, sd = gp2.predict(gp2.X[:5])
    assert mean.shape == (5, 3) and sd.shape == (5, 3)
    assert np.all(sd > 0)
    resid = gp2.check_K_inv_Y(gp2.X[:8])
    assert np.all(resid < 1e-6)


def test_covariant_reload_diagonalizes_noise(tmp_root):
    """Reference-parity quirk: the ctor always broadcasts with
    is_diagonal=True (reference gpr/models.py:321, base/classes.py:87-88),
    so reloading a covariant model zeroes trained noise off-diagonals —
    calibrate writes the full matrix, reload diagonalizes it."""
    repo = _repo(tmp_root, N=40)
    fold = Fold(repo, 0)
    gp = MOGP('gpr.c.a', fold, is_read=False, is_covariant=True, is_isotropic=False)
    gp.calibrate(maxiter=60)
    written = np.asarray(gp.likelihood.data.variance.np)   # full (L,L), as calibrated
    assert written.shape == (3, 3)
    off = written[~np.eye(3, dtype=bool)]
    assert np.any(off != 0.0), 'noise covariance off-diagonals should train'
    gp2 = MOGP('gpr.c.a', fold, is_read=True, is_covariant=True, is_isotropic=False)
    reloaded = np.asarray(gp2.likelihood.data.variance.np)
    np.testing.assert_allclose(np.diag(reloaded), np.diag(written), rtol=1e-12)
    assert np.all(reloaded[~np.eye(3, dtype=bool)] == 0.0)


def test_large_n_route_matches_fused(tmp_path):
    """Variant calibration routed through the distributed engine (threshold
    forced low) converges to the same hyperparameters as the fused path."""
    import numpy as np
    from romcomma_tpu import user
    from romcomma_tpu.models.gpr import MOGP
    from romcomma_tpu.data.storage import Fold

    noise = user.sample.GaussianNoise.Variance(1, 0.1, False, True)
    repo = user.sample.Function(tmp_path, user.sample.DOE.latin_hypercube,
                                user.functions.ISHIGAMI.subVector('i1', ['standard']),
                                64, 3, noise, None, True).repo.into_K_folds(-1)
    fold = Fold(repo, 0)
    gp_fused = MOGP('fused', fold, is_read=False, is_covariant=False, is_isotropic=False)
    gp_fused.calibrate(maxiter=60)
    gp_large = MOGP('large', fold, is_read=False, is_covariant=False, is_isotropic=False)
    gp_large.calibrate(maxiter=60, large_n_threshold=1, distributed_block=8)
    lml_fused = float(gp_fused.likelihood.data.log_marginal.np[0, 0])
    lml_large = float(gp_large.likelihood.data.log_marginal.np[0, 0])
    # DETERMINISTIC route parity: the distributed engine's LML evaluated at
    # the FUSED model's trained hyperparameters must match the fused LML —
    # same math, no optimizer in the loop. (Endpoint equality of two
    # independent descents is NOT asserted tightly: the N=64 likelihood is
    # multimodal and the eager-scipy and fused line searches legitimately
    # land on different optima on rare seeds.)
    from romcomma_tpu.parallel import distributed as dist
    import jax.numpy as jnp
    c = gp_fused._variant_raw()
    from romcomma_tpu.models import gp as gpmod
    lml_at_fused = float(np.asarray(gpmod.lml_variant(
        c, jnp.asarray(gp_fused._X), jnp.asarray(gp_fused._Y))).sum())
    dgp = dist.DistributedGP(gp_fused.N, dist.make_n_mesh(), block=8,
                             dense_kernels=True)
    x_dev, y_dev = dgp.stage(gp_fused._X, gp_fused._Y)
    from romcomma_tpu.models.params import variant_constrain
    cc = {k: np.asarray(v, float) for k, v in variant_constrain(c).items()}
    lml_dist = float(dgp.lml(cc['lengthscales'][0], float(cc['variance'][0]),
                             float(cc['noise'][0]), x_dev, y_dev))
    assert abs(lml_dist - lml_at_fused) < max(1e-6 * abs(lml_at_fused), 1e-5)
    # loose endpoint sanity only: both descents found a real optimum
    assert abs(lml_fused - lml_large) < max(0.25 * abs(lml_fused), 10.0)


def test_model_pass_expansion_and_warm_start(tmp_path):
    """Pin the tri-state pass expansion and the warm-start ancestor chain of
    user.run (reference run.py:69-88 semantics)."""
    from romcomma_tpu.user.run import _model_passes, _resolve_warm_start

    assert _model_passes(None, None) == [(False, True), (False, False), (True, False)]
    assert _model_passes(None, True) == [(False, True), (True, True)]
    assert _model_passes(None, False) == [(False, False), (True, False)]
    assert _model_passes(True, None) == [(True, True), (True, False)]
    assert _model_passes(False, None) == [(False, True), (False, False)]
    assert _model_passes(True, False) == [(True, False)]

    class FakeFold:
        folder = tmp_path

    def mk(name):
        (tmp_path / name).mkdir()
        (tmp_path / name / 'marker.csv').write_text(name)

    # Nothing trained: train from scratch.
    assert _resolve_warm_start('gpr', FakeFold, 'gpr.v.i', False) is False
    # Anisotropic variant warm-starts from its isotropic sibling.
    mk('gpr.v.i')
    assert _resolve_warm_start('gpr', FakeFold, 'gpr.v.a', False) is True
    assert (tmp_path / 'gpr.v.a' / 'marker.csv').read_text() == 'gpr.v.i'
    (tmp_path / 'gpr.v.a' / 'marker.csv').write_text('gpr.v.a')
    # Covariant prefers its variant twin over the isotropic sibling.
    mk('gpr.c.i')
    assert _resolve_warm_start('gpr', FakeFold, 'gpr.c.a', True) is True
    assert (tmp_path / 'gpr.c.a' / 'marker.csv').read_text() == 'gpr.v.a'
    # An existing model folder is reused untouched.
    (tmp_path / 'gpr.c.a' / 'marker.csv').write_text('trained')
    assert _resolve_warm_start('gpr', FakeFold, 'gpr.c.a', True) is True
    assert (tmp_path / 'gpr.c.a' / 'marker.csv').read_text() == 'trained'


def test_mean_function_wiring(tmp_path):
    """GPR(mean_function=...) fits the residuals Y - mean(X) and adds the mean
    back in predict/predict_f (reference MOMeanFunction,
    gpf/mean_functions.py:30-64; default Zero at gpf/models.py:127)."""
    from romcomma_tpu.models import means

    import jax
    import jax.numpy as jnp
    from romcomma_tpu.models import gp as gpcore

    repo = _repo(tmp_path)
    fold = Fold(repo, 0)
    c = np.full(fold.L, 0.6)
    gp0 = MOGP('gpr.zero', fold, is_read=False, is_covariant=False, is_isotropic=False)
    gpm = MOGP('gpr.mean', fold, is_read=False, is_covariant=False, is_isotropic=False,
               mean_function=means.Constant(c))
    # The model fits the residuals Y - mean(X).
    np.testing.assert_allclose(gpm._Y, gp0._Y - c[None, :], rtol=1e-6)
    gpm.calibrate(maxiter=150)
    xs = gpm.X[:12]
    # The mean is added back in predict: the public prediction equals the
    # zero-mean posterior over the residual targets plus mean(xs), exactly.
    m_res, _ = jax.device_get(gpcore.predict_variant(
        gpm._variant_raw(), jnp.asarray(gpm._X), jnp.asarray(gpm._Y),
        jnp.asarray(np.asarray(xs, dtype=gpm._X.dtype)), y_instead_of_f=True))
    mm, _ = gpm.predict(xs)
    np.testing.assert_allclose(mm, np.asarray(m_res) + c[None, :], atol=1e-6)
    mf, vf = gpm.predict_f(xs)
    np.testing.assert_allclose(mf, mm, atol=1e-5)
    assert vf.shape == mm.shape
    _, var_joint = gpm.predict_f(xs, full_cov=True)
    assert var_joint.shape == (12, 12, fold.L, fold.L)


def test_masked_large_n_route(tmp_path):
    """Frozen hyperparameter groups are honoured when calibration routes
    through the distributed large-N engine (round-1 VERDICT item 5): a
    variance-frozen descent must leave the kernel variance at its initial
    value while still optimizing the free groups."""
    noise = sample.GaussianNoise.Variance(1, 0.1, False, True)
    repo = sample.Function(tmp_path, sample.DOE.latin_hypercube,
                           functions.ISHIGAMI.subVector('i1', ['standard']),
                           64, 3, noise, None, True).repo.into_K_folds(-1)
    fold = Fold(repo, 0)
    gp = MOGP('masked', fold, is_read=False, is_covariant=False, is_isotropic=False)
    v0 = gp.kernel.data.variance.np.copy()
    ls0 = gp.kernel.data.lengthscales.np.copy()
    gp.calibrate(maxiter=40, large_n_threshold=1, distributed_block=8,
                 kernel={'variance': False})
    np.testing.assert_allclose(gp.kernel.data.variance.np, v0, atol=0)
    assert not np.allclose(gp.kernel.data.lengthscales.np, ls0)
    assert np.isfinite(float(gp.likelihood.data.log_marginal.np[0, 0]))


def test_covariant_large_ln_threshold_routes_upper_engine(tmp_root):
    """Covariant calibration past meta['large_n_threshold'] routes through
    calibrate_covariant_host's blocked upper-engine chain (VERDICT r2 #5)
    and lands on the fused on-device descent's optimum — the covariant
    analog of the masked-variant threshold test."""
    repo = _repo(tmp_root, N=40)
    fold = Fold(repo, 0)
    gp_f = MOGP('cov.fused', fold, is_read=False, is_covariant=True,
                is_isotropic=False)
    gp_f.calibrate(maxiter=80)
    gp_u = MOGP('cov.upper', fold, is_read=False, is_covariant=True,
                is_isotropic=False)
    gp_u.calibrate(maxiter=80, large_n_threshold=1)   # LN=120 >= 1 -> host
    lml_f = float(np.asarray(gp_f.likelihood.data.log_marginal.np).sum())
    lml_u = float(np.asarray(gp_u.likelihood.data.log_marginal.np).sum())
    assert abs(lml_f - lml_u) < max(0.01 * abs(lml_f), 0.1)
    mean_f, sd_f = gp_f.predict(gp_f.X[:6])
    mean_u, sd_u = gp_u.predict(gp_u.X[:6])
    np.testing.assert_allclose(mean_u, mean_f, rtol=1e-2, atol=5e-3)
    np.testing.assert_allclose(sd_u, sd_f, rtol=5e-2, atol=5e-3)
