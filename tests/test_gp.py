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
