"""Numerics-core tests against independent numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from romcomma_tpu.ops import gram, linalg, transforms, lbfgs


def _np_sqdist(u, v):
    d = u[:, None, :] - v[None, :, :]
    return np.sum(d * d, axis=-1)


def test_rbf_gram_matches_direct_difference():
    rng = np.random.default_rng(1)
    x1, x2 = rng.normal(size=(17, 5)), rng.normal(size=(13, 5))
    ls, var = rng.uniform(0.5, 3.0, size=5), 2.3
    ours = np.asarray(gram.rbf_gram(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(ls), var))
    oracle = var * np.exp(-0.5 * _np_sqdist(x1 / ls, x2 / ls))
    np.testing.assert_allclose(ours, oracle, rtol=1e-10, atol=1e-12)


def test_rbf_gram_isotropic_broadcast():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(9, 4))
    iso = np.asarray(gram.rbf_gram(jnp.asarray(x), jnp.asarray(x), jnp.asarray([2.0]), 1.0))
    full = np.asarray(gram.rbf_gram(jnp.asarray(x), jnp.asarray(x), jnp.asarray([2.0] * 4), 1.0))
    np.testing.assert_allclose(iso, full, rtol=1e-12)


def test_rbf_gram_covariant_cross_lengthscale_blocks():
    """Cross-output blocks difference the *differently scaled* inputs —
    the defining property of the reference's MOStationary kernel."""
    rng = np.random.default_rng(3)
    L, N, M = 3, 7, 2
    x = rng.normal(size=(N, M))
    ls = rng.uniform(0.5, 2.0, size=(L, M))
    F = np.eye(L) + 0.3
    K = np.asarray(gram.rbf_gram_covariant(jnp.asarray(x), jnp.asarray(x),
                                           jnp.asarray(ls), jnp.asarray(F)))
    for l in range(L):
        for j in range(L):
            oracle = F[l, j] * np.exp(-0.5 * _np_sqdist(x / ls[l], x / ls[j]))
            np.testing.assert_allclose(K[l, :, j, :], oracle, rtol=1e-10, atol=1e-12)


def test_tri_solve_broadcasts_batch_dims():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(2, 5, 5))
    chol = np.linalg.cholesky(a @ a.transpose(0, 2, 1) + 5 * np.eye(5))
    b = rng.normal(size=(3, 2, 5, 1))
    x = np.asarray(linalg.tri_solve(jnp.asarray(chol), jnp.asarray(b)))
    for i in range(3):
        for j in range(2):
            np.testing.assert_allclose(chol[j] @ x[i, j], b[i, j], rtol=1e-10)


def test_mvn_logpdf_oracle():
    rng = np.random.default_rng(5)
    n = 8
    a = rng.normal(size=(n, n))
    cov = a @ a.T + n * np.eye(n)
    y = rng.normal(size=(n, 2))
    chol = np.linalg.cholesky(cov)
    ours = np.asarray(linalg.mvn_logpdf(jnp.asarray(y), jnp.zeros((n, 2)), jnp.asarray(chol)))
    from scipy.stats import multivariate_normal
    oracle = np.array([multivariate_normal.logpdf(y[:, i], mean=np.zeros(n), cov=cov)
                       for i in range(2)])
    np.testing.assert_allclose(ours, oracle, rtol=1e-10)


def test_softplus_roundtrip_and_lower_bound():
    v = np.array([1e-5, 0.1, 2.0, 50.0])
    raw = transforms.positive_inverse(v, 0.0)
    np.testing.assert_allclose(np.asarray(transforms.positive(raw, 0.0)), v, rtol=1e-12)
    raw = transforms.positive_inverse(v + 1e-3, 1e-3)
    np.testing.assert_allclose(np.asarray(transforms.positive(raw, 1e-3)), v + 1e-3, rtol=1e-12)


def test_build_tril_matches_cholesky_packing():
    rng = np.random.default_rng(6)
    a = rng.normal(size=(4, 4))
    spd = a @ a.T + 4 * np.eye(4)
    chol = np.linalg.cholesky(spd)
    flat = transforms.pack_tril_strict(chol)
    rebuilt = np.asarray(transforms.build_tril(jnp.asarray(np.diag(chol)), jnp.asarray(flat)))
    np.testing.assert_allclose(rebuilt, chol, rtol=1e-14)


def test_lbfgs_converges_on_rosenbrock():
    def rosen(p):
        x = p['x']
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

    res = jax.jit(lambda p: lbfgs.minimize(rosen, p, maxiter=500))({'x': jnp.zeros(4)})
    assert float(res.value) < 1e-10
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.params['x']), np.ones(4), atol=1e-4)


def test_gsa_debug_reductions():
    import jax.numpy as jnp
    from romcomma_tpu.gsa import base as gsa_base
    t = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    assert float(gsa_base.mean(t)) == 2.5
    assert float(gsa_base.sos(t)) == 30.0
    assert float(gsa_base.ms(t)) == 7.5
    import numpy as np
    np.testing.assert_allclose(float(gsa_base.rms(t)), 7.5 ** 0.5)
    assert float(gsa_base.sym_check(t, (1, 0))) == 2.0


def test_kernel_type_from_parameters():
    from romcomma_tpu.models.kernels import Kernel, RBF
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as d:
        k = RBF(pathlib.Path(d) / 'k')
        assert Kernel.TypeFromParameters(k.data) is RBF


def test_mean_functions():
    import jax.numpy as jnp
    import numpy as np
    from romcomma_tpu.models import means
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)))
    assert means.Zero(2)(x).shape == (5, 2)
    assert means.Zero(2).gradient(x).shape == (5, 2, 3)
    c = means.Constant([1.0, -2.0])
    np.testing.assert_allclose(np.asarray(c(x)),
                               np.broadcast_to([1.0, -2.0], (5, 2)))
    np.testing.assert_allclose(np.asarray(c.gradient(x)), 0.0)
    A = np.random.default_rng(1).normal(size=(3, 2))
    lin = means.Linear(A, [0.5, -0.5])
    np.testing.assert_allclose(np.asarray(lin(x)),
                               np.asarray(x) @ A + np.array([0.5, -0.5]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lin.gradient(x)),
                               np.broadcast_to(A.T, (5, 2, 3)), rtol=1e-6)
