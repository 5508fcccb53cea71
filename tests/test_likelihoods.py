"""Quadrature-likelihood layer: Gauss-Hermite base vs Gaussian closed forms.

The oracle is the closed form itself — for a Gaussian likelihood the
variational expectation is a degree-2 polynomial in F, which Gauss-Hermite
integrates EXACTLY, so quadrature-vs-closed-form agreement is a sharp test
of both sides (the same identity gpflow's own test-suite uses).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from romcomma_tpu.models.likelihoods import (DEFAULT_NUM_GAUSS_HERMITE,
                                             MOGaussian, gauss_hermite_grid)


@pytest.fixture(scope='module')
def rng():
    return np.random.default_rng(7)


def test_gauss_hermite_grid_moments():
    nodes, w = gauss_hermite_grid(2, 16)
    assert nodes.shape == (256, 2) and w.shape == (256,)
    np.testing.assert_allclose(float(jnp.sum(w)), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.tensordot(w, nodes, axes=1)),
                               0.0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(jnp.tensordot(w, nodes ** 2, axes=1)), 1.0, atol=1e-10)
    # degree-2 polynomial with cross term integrates exactly
    f = 1.3 + 0.4 * nodes[:, 0] - 2.0 * nodes[:, 0] * nodes[:, 1]
    np.testing.assert_allclose(float(jnp.tensordot(w, f, axes=1)), 1.3,
                               atol=1e-10)


@pytest.fixture(scope='module')
def moments(rng):
    N, L = 11, 2
    Fmu = rng.normal(size=(N, L))
    Fvar = rng.uniform(0.01, 0.2, size=(N, L))
    Y = Fmu + rng.normal(size=(N, L)) * 0.5
    A = rng.normal(size=(L, L)) * 0.3
    sigma = A @ A.T + 0.5 * np.eye(L)          # full noise covariance
    return Fmu, Fvar, Y, sigma


def test_quad_variational_expectations_match_closed_form(moments):
    Fmu, Fvar, Y, sigma = moments
    lik = MOGaussian(sigma)
    got = np.asarray(lik.quad_variational_expectations(
        jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)))
    # closed form per point: log N(y; mu, Sigma) - tr(Sigma^{-1} diag(v))/2
    si = np.linalg.inv(sigma)
    d = Y - Fmu
    want = (-0.5 * np.einsum('nl,lk,nk->n', d, si, d)
            - 0.5 * len(sigma) * np.log(2 * np.pi)
            - 0.5 * np.linalg.slogdet(sigma)[1]
            - 0.5 * Fvar @ np.diag(si))
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_quad_predict_log_density_matches_closed_form(moments):
    Fmu, Fvar, Y, sigma = moments
    lik = MOGaussian(sigma, n_quad=30)
    got = np.asarray(lik.quad_predict_log_density(
        jnp.asarray(Fmu), jnp.asarray(Fvar), jnp.asarray(Y)))
    d = Y - Fmu
    want = np.empty(len(Y))
    for n in range(len(Y)):                    # oracle: dense per-point mvn
        c = sigma + np.diag(Fvar[n])
        want[n] = (-0.5 * d[n] @ np.linalg.solve(c, d[n])
                   - 0.5 * len(sigma) * np.log(2 * np.pi)
                   - 0.5 * np.linalg.slogdet(c)[1])
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_quad_predict_mean_and_var_match_closed_form(moments):
    Fmu, Fvar, Y, sigma = moments
    lik = MOGaussian(sigma)
    mean, var = lik.quad_predict_mean_and_var(jnp.asarray(Fmu),
                                              jnp.asarray(Fvar))
    np.testing.assert_allclose(np.asarray(mean), Fmu, atol=1e-10)
    np.testing.assert_allclose(np.asarray(var), Fvar + np.diag(sigma),
                               rtol=1e-8)


def test_closed_forms_flattened_convention(moments, rng):
    """log_prob / predict_log_density / variational_expectations on the
    reference's (L*N,) latent-axis-first flattening, vs dense numpy."""
    Fmu, _, Y, sigma = moments
    L = sigma.shape[0]
    n = 5
    f = np.asfortranarray(Fmu[:n]).T.reshape(-1)   # (L*n,) latent-first
    y = np.asfortranarray(Y[:n]).T.reshape(-1)
    lik = MOGaussian(sigma)
    assert lik.N(jnp.asarray(y)) == n
    kron = np.kron(sigma, np.eye(n))
    d = y - f
    want_lp = (-0.5 * d @ np.linalg.solve(kron, d)
               - 0.5 * L * n * np.log(2 * np.pi)
               - 0.5 * np.linalg.slogdet(kron)[1])
    np.testing.assert_allclose(float(lik.log_prob(jnp.asarray(f),
                                                  jnp.asarray(y))),
                               want_lp, rtol=1e-10)
    # dense latent covariance (LN, LN), SPD
    B = rng.normal(size=(L * n, L * n)) * 0.1
    fvar = B @ B.T + 0.3 * np.eye(L * n)
    c = kron + fvar
    want_pld = (-0.5 * d @ np.linalg.solve(c, d)
                - 0.5 * L * n * np.log(2 * np.pi)
                - 0.5 * np.linalg.slogdet(c)[1])
    np.testing.assert_allclose(
        float(lik.predict_log_density(jnp.asarray(f), jnp.asarray(fvar),
                                      jnp.asarray(y))), want_pld, rtol=1e-9)
    want_ve = want_lp - 0.5 * np.trace(np.linalg.solve(kron, fvar))
    np.testing.assert_allclose(
        float(lik.variational_expectations(jnp.asarray(f), jnp.asarray(fvar),
                                           jnp.asarray(y))),
        want_ve, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(lik.add_to(jnp.asarray(fvar))),
                               c, rtol=1e-12)


def test_predict_mean_and_var_rank_rules(moments):
    _, _, _, sigma = moments
    L = sigma.shape[0]
    lik = MOGaussian(sigma)
    f2, v2 = lik.predict_mean_and_var(jnp.zeros((4, L)), jnp.ones((4, L)))
    np.testing.assert_allclose(np.asarray(v2),
                               np.broadcast_to(1.0 + np.diag(sigma), (4, L)))
    _, v3 = lik.predict_mean_and_var(jnp.zeros((4, L)),
                                     jnp.zeros((4, L, L)))
    np.testing.assert_allclose(np.asarray(v3[0]), sigma)
    _, v4 = lik.predict_mean_and_var(jnp.zeros((4, 3, L)),
                                     jnp.zeros((4, 3, L, L)))
    np.testing.assert_allclose(np.asarray(v4[2, 1]), sigma)
    with pytest.raises(IndexError):
        lik.predict_mean_and_var(jnp.zeros((L,)), jnp.zeros((1, 1, 1, 1, 1)))
    with pytest.raises(IndexError):
        MOGaussian(np.ones((2, 3)))


def test_likelihood_wrapper_exposes_mo_gaussian(tmp_path):
    """The persistent Likelihood's variance frame feeds the math layer —
    variant (1, L) rows diagonalize."""
    from romcomma_tpu.models.gpr import Likelihood

    class Parent:
        folder = tmp_path
    lik = Likelihood(Parent(), read_data=False,
                     variance=np.array([[0.2, 0.3, 0.4]]))
    mo = lik.mo_gaussian()
    np.testing.assert_allclose(np.asarray(mo.variance),
                               np.diag([0.2, 0.3, 0.4]))
