"""Functional GP core vs independent numpy/scipy f64 oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from romcomma_tpu.models import gp
from romcomma_tpu.models import params as P


def _np_lml(x, y, v, lam, nz):
    d = (x[:, None, :] - x[None, :, :]) / lam
    K = v * np.exp(-0.5 * np.sum(d * d, -1)) + nz * np.eye(len(x))
    c = np.linalg.cholesky(K)
    a = np.linalg.solve(c, y)
    return float(-0.5 * a @ a - np.log(np.diag(c)).sum() - len(x) / 2 * np.log(2 * np.pi))


def _data(N=30, M=3, L=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(N, M)), rng.normal(size=(N, L))


def test_variant_lml_oracle():
    X, Y = _data()
    raw = P.variant_init(np.array([2.0, 1.5]), np.array([[5., 4., 3.], [2., 2., 2.]]),
                         np.array([0.05, 0.1]))
    c = jax.tree_util.tree_map(np.asarray, P.variant_constrain(raw))
    ours = np.asarray(gp.lml_variant(raw, jnp.asarray(X), jnp.asarray(Y)))
    oracle = np.array([_np_lml(X, Y[:, l], c['variance'][l], c['lengthscales'][l], c['noise'][l])
                       for l in range(2)])
    np.testing.assert_allclose(ours, oracle, rtol=1e-11)


def test_covariant_lml_block_diagonal_reduces_to_variant():
    X, Y = _data()
    ls = np.array([[5., 4., 3.], [2., 2., 2.]])
    rawc = P.covariant_init(np.diag([2.0, 1.5]), ls, np.diag([0.05, 0.1]))
    cc = jax.tree_util.tree_map(np.asarray, P.covariant_constrain(rawc))
    ours = float(gp.lml_covariant(rawc, jnp.asarray(X), jnp.asarray(Y)))
    oracle = sum(_np_lml(X, Y[:, l], cc['F'][l, l], cc['lengthscales'][l], cc['noise_cov'][l, l])
                 for l in range(2))
    np.testing.assert_allclose(ours, oracle, rtol=1e-10)


def test_covariant_lml_full_covariance_oracle():
    """Dense (LN,LN) oracle with full F and noise covariance."""
    X, Y = _data(N=12, M=2, L=2, seed=7)
    F = np.array([[2.0, 0.4], [0.4, 1.5]])
    noise = np.array([[0.05, 0.01], [0.01, 0.1]])
    ls = np.array([[3., 2.], [1., 2.]])
    rawc = P.covariant_init(F, ls, noise)
    cc = jax.tree_util.tree_map(np.asarray, P.covariant_constrain(rawc))
    L, N = 2, 12
    K = np.zeros((L, N, L, N))
    for l in range(L):
        for j in range(L):
            u, v = X / cc['lengthscales'][l], X / cc['lengthscales'][j]
            d = u[:, None, :] - v[None, :, :]
            K[l, :, j, :] = cc['F'][l, j] * np.exp(-0.5 * np.sum(d * d, -1))
            K[l, :, j, :] += cc['noise_cov'][l, j] * np.eye(N)
    Kf = K.reshape(L * N, L * N)
    c = np.linalg.cholesky(Kf)
    yy = Y.T.reshape(-1)
    a = np.linalg.solve(c, yy)
    oracle = float(-0.5 * a @ a - np.log(np.diag(c)).sum() - L * N / 2 * np.log(2 * np.pi))
    ours = float(gp.lml_covariant(rawc, jnp.asarray(X), jnp.asarray(Y)))
    np.testing.assert_allclose(ours, oracle, rtol=1e-10)


def test_predict_posterior_identity():
    """predict mean == k(x,X) K^-1 y — the check_K_inv_Y identity
    (reference gpr/models.py:446-463)."""
    X, Y = _data()
    raw = P.variant_init(np.array([2.0, 1.5]), np.array([[5., 4., 3.], [2., 2., 2.]]),
                         np.array([0.05, 0.1]))
    xs = X[:7] + 0.1
    mean, var = gp.predict_variant(raw, jnp.asarray(X), jnp.asarray(Y), jnp.asarray(xs))
    chol, kiy = gp.posterior_factors_variant(raw, jnp.asarray(X), jnp.asarray(Y))
    c = P.variant_constrain(raw)
    from romcomma_tpu.ops.gram import rbf_gram_variant
    Ks = rbf_gram_variant(jnp.asarray(xs), jnp.asarray(X), c['lengthscales'], c['variance'])
    m2 = jnp.einsum('lon,lin->ol', Ks, kiy)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(m2), atol=1e-10)
    assert np.all(np.asarray(var) > 0)


def test_predict_variance_oracle():
    X, Y = _data(N=20, M=2, L=1, seed=3)
    v, lam, nz = 1.7, np.array([[2.0, 1.0]]), np.array([0.1])
    raw = P.variant_init(np.array([v]), lam, nz)
    xs = X[:5] * 0.5
    mean, var = gp.predict_variant(raw, jnp.asarray(X), jnp.asarray(Y), jnp.asarray(xs),
                                   y_instead_of_f=True)
    d = (X[:, None, :] - X[None, :, :]) / lam[0]
    K = v * np.exp(-0.5 * np.sum(d * d, -1)) + nz[0] * np.eye(20)
    ds = (X[:, None, :] - xs[None, :, :]) / lam[0]
    Ks = v * np.exp(-0.5 * np.sum(ds * ds, -1))
    mean_o = Ks.T @ np.linalg.solve(K, Y[:, 0])
    var_o = v - np.einsum('no,no->o', Ks, np.linalg.solve(K, Ks)) + nz[0]
    np.testing.assert_allclose(np.asarray(mean)[:, 0], mean_o, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var)[:, 0], var_o, rtol=1e-9)


def test_calibrate_variant_improves_and_respects_mask():
    X, Y = _data(N=25)
    raw = P.variant_init(np.array([2.0, 2.0]), np.array([[5., 5., 5.], [5., 5., 5.]]),
                         np.array([0.1, 0.1]))
    lml0 = np.asarray(gp.lml_variant(raw, jnp.asarray(X), jnp.asarray(Y)))
    mask = P.variant_mask(kernel_variance=True, lengthscales=False, noise=True)
    ropt, lml, _ = gp.calibrate_variant(raw, mask, jnp.asarray(X), jnp.asarray(Y), maxiter=100)
    assert np.all(np.asarray(lml) >= lml0 - 1e-9)
    # Frozen lengthscales must not have moved.
    np.testing.assert_allclose(np.asarray(ropt.raw_lengthscales),
                               np.asarray(raw.raw_lengthscales), rtol=0, atol=0)
    assert not np.allclose(np.asarray(ropt.raw_variance), np.asarray(raw.raw_variance))


def test_calibrate_covariant_improves():
    X, Y = _data(N=20)
    rawc = P.covariant_init(np.diag([2.0, 2.0]), np.full((2, 3), 5.0), np.diag([0.1, 0.1]))
    lml0 = float(gp.lml_covariant(rawc, jnp.asarray(X), jnp.asarray(Y)))
    mask = P.covariant_mask()
    ropt, lml, _ = gp.calibrate_covariant(rawc, mask, jnp.asarray(X), jnp.asarray(Y), maxiter=100)
    assert float(lml) >= lml0 - 1e-9
    # Default covariant mask freezes lengthscales and the kernel off-diagonals.
    np.testing.assert_allclose(np.asarray(ropt.raw_lengthscales),
                               np.asarray(rawc.raw_lengthscales), atol=0)
    np.testing.assert_allclose(np.asarray(ropt.kernel_chol_lower),
                               np.asarray(rawc.kernel_chol_lower), atol=0)


def test_predict_full_cov_shapes_and_diagonal_consistency():
    """predict_*_full obeys the reference's shape contract
    (gpf/models.py:84-111) and its diagonal matches the diagonal path."""
    X, Y = _data()
    xs = np.random.default_rng(5).normal(size=(7, 3))
    ls = np.array([[5., 4., 3.], [2., 2., 2.]])
    F = np.array([[2.0, 0.4], [0.4, 1.5]])
    noise = np.array([[0.05, 0.01], [0.01, 0.1]])
    rawc = P.covariant_init(F, ls, noise)

    mean_d, var_d = gp.predict_covariant(rawc, jnp.asarray(X), jnp.asarray(Y),
                                         jnp.asarray(xs), y_instead_of_f=False)
    mean0, var0 = gp.predict_covariant_full(rawc, jnp.asarray(X), jnp.asarray(Y),
                                            jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(mean0), np.asarray(mean_d), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(var0), np.asarray(var_d), rtol=1e-7, atol=1e-12)
    assert var0.shape == (7, 2)

    _, var1 = gp.predict_covariant_full(rawc, jnp.asarray(X), jnp.asarray(Y),
                                        jnp.asarray(xs), full_output_cov=True)
    assert var1.shape == (7, 2, 2)
    np.testing.assert_allclose(np.einsum('nll->nl', np.asarray(var1)),
                               np.asarray(var0), rtol=1e-9)
    # full_cov forces full_output_cov regardless of the flag passed
    _, var2 = gp.predict_covariant_full(rawc, jnp.asarray(X), jnp.asarray(Y),
                                        jnp.asarray(xs), full_cov=True,
                                        full_output_cov=False)
    assert var2.shape == (7, 7, 2, 2)
    np.testing.assert_allclose(np.einsum('nnjl->njl', np.asarray(var2)),
                               np.asarray(var1), rtol=1e-9, atol=1e-12)
    # symmetry of the joint covariance: var2[a,b,j,l] == var2[b,a,l,j]
    np.testing.assert_allclose(np.asarray(var2),
                               np.transpose(np.asarray(var2), (1, 0, 3, 2)),
                               rtol=1e-7, atol=1e-12)


def test_predict_variant_full_matches_variant_and_zero_cross_cov():
    X, Y = _data()
    xs = np.random.default_rng(6).normal(size=(5, 3))
    raw = P.variant_init(np.array([2.0, 1.5]), np.array([[5., 4., 3.], [2., 2., 2.]]),
                         np.array([0.05, 0.1]))
    mean_d, var_d = gp.predict_variant(raw, jnp.asarray(X), jnp.asarray(Y),
                                       jnp.asarray(xs), y_instead_of_f=False)
    mean0, var0 = gp.predict_variant_full(raw, jnp.asarray(X), jnp.asarray(Y),
                                          jnp.asarray(xs))
    np.testing.assert_allclose(np.asarray(mean0), np.asarray(mean_d), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(var0), np.asarray(var_d), rtol=1e-6, atol=1e-12)
    _, var2 = gp.predict_variant_full(raw, jnp.asarray(X), jnp.asarray(Y),
                                      jnp.asarray(xs), full_cov=True)
    assert var2.shape == (5, 5, 2, 2)
    v = np.asarray(var2)
    assert np.all(v[:, :, 0, 1] == 0.0) and np.all(v[:, :, 1, 0] == 0.0)
    np.testing.assert_allclose(np.einsum('nnll->nl', v), np.asarray(var0),
                               rtol=1e-6, atol=1e-12)


def test_calibrate_covariant_frozen_ls_cache_matches():
    """The unit-gram-cached descent (ls_frozen=True) reproduces the uncached
    result bit-for-bit when lengthscales are mask-frozen (the reference's
    default covariant configuration, gpr/kernels.py:54-57)."""
    X, Y = _data(N=24)
    ls = np.array([[2., 2., 2.], [2., 2., 2.]])
    rawc = P.covariant_init(np.diag([1.5, 1.0]), ls, np.diag([0.1, 0.1]))
    mask = P.covariant_mask()   # reference defaults: lengthscales frozen
    out_plain = gp.calibrate_covariant(rawc, mask, jnp.asarray(X), jnp.asarray(Y),
                                       maxiter=40)
    out_cached = gp.calibrate_covariant(rawc, mask, jnp.asarray(X), jnp.asarray(Y),
                                        maxiter=40, ls_frozen=True)
    np.testing.assert_allclose(float(out_plain[1]), float(out_cached[1]),
                               rtol=1e-9)
    for a, b in zip(jax.tree_util.tree_leaves(out_plain[0]),
                    jax.tree_util.tree_leaves(out_cached[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-9)


def test_calibrate_covariant_host_matches_fused():
    """The host-paced (scipy) large-LN covariant route converges to the same
    optimum as the fused on-device descent."""
    X, Y = _data(N=24)
    ls = np.array([[2., 2., 2.], [2., 2., 2.]])
    rawc = P.covariant_init(np.diag([1.5, 1.0]), ls, np.diag([0.1, 0.1]))
    mask = P.covariant_mask()
    _, lml_fused, _ = gp.calibrate_covariant(rawc, mask, jnp.asarray(X),
                                             jnp.asarray(Y), maxiter=200,
                                             ls_frozen=True)
    _, lml_host, _ = gp.calibrate_covariant_host(rawc, mask, jnp.asarray(X),
                                                 jnp.asarray(Y), maxiter=200,
                                                 ls_frozen=True)
    assert abs(float(lml_fused) - float(lml_host)) < max(0.01 * abs(float(lml_fused)), 0.1)


def test_covariant_upper_chain_matches_builtin_objective():
    """The blocked upper-engine covariant chain (covariant_upper_lml, the
    large-LN production objective) reproduces the XLA-builtin autodiff
    objective's value AND gradients exactly — including through the SPD
    Cholesky parameterization and the default trainability mask."""
    rng = np.random.default_rng(3)
    L, N, M = 3, 70, 4
    X = rng.uniform(size=(N, M))
    Y = np.stack([np.sin((l + 1) * X[:, 0]) + 0.1 * rng.standard_normal(N)
                  for l in range(L)], 1)
    ls = np.full((L, M), 1.7)
    F0 = np.array([[1.2, .3, .1], [.3, .9, .2], [.1, .2, 1.5]])
    raw = P.covariant_init(F0, ls, np.diag([.1, .12, .08]) + 0.01)
    mask = P.covariant_mask()
    obj_ref, _ = gp._covariant_objective(raw, mask, jnp.asarray(X),
                                         jnp.asarray(Y), ls_frozen=True)
    obj_up, _ = gp._covariant_objective_upper(raw, mask, jnp.asarray(X),
                                              jnp.asarray(Y), block=64)
    # at the init and at a perturbed point (asymmetric raw state)
    for p in (raw, jax.tree_util.tree_map(
            lambda t: t + 0.05 * jnp.asarray(
                rng.standard_normal(np.shape(t))), raw)):
        v1, g1 = jax.value_and_grad(obj_ref)(p)
        v2, g2 = jax.value_and_grad(obj_up)(p)
        np.testing.assert_allclose(float(v2), float(v1), rtol=1e-12)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-7, atol=1e-10)


def test_covariant_host_upper_calibration_converges():
    """calibrate_covariant_host (ls_frozen -> upper engine, eager pacing)
    lands on the fused builtin descent's optimum."""
    X, Y = _data(N=40)
    ls = np.array([[2., 2., 2.], [2., 2., 2.]])
    rawc = P.covariant_init(np.diag([1.5, 1.0]), ls, np.diag([0.1, 0.1]))
    mask = P.covariant_mask()
    _, lml_fused, _ = gp.calibrate_covariant(rawc, mask, jnp.asarray(X),
                                             jnp.asarray(Y), maxiter=200,
                                             ls_frozen=True)
    _, lml_host, _ = gp.calibrate_covariant_host(rawc, mask, jnp.asarray(X),
                                                 jnp.asarray(Y), maxiter=200,
                                                 ls_frozen=True)
    assert abs(float(lml_fused) - float(lml_host)) < max(
        0.01 * abs(float(lml_fused)), 0.1)
