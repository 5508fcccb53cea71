"""Mesh-distributed covariant chain (parallel/covariant_mesh.py) against the
single-chip oracles: the dense f64 covariant LML and the blocked upper
engine's custom-VJP gradient (models/gp.covariant_upper_lml)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from romcomma_tpu.models import gp
from romcomma_tpu.parallel import distributed as dist
from romcomma_tpu.parallel.covariant_mesh import DistributedCovariantGP


def _fixture(N=24, M=3, L=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, (N, M))
    Y = np.stack([np.sin(2 * X[:, 0]), X[:, 1] ** 2], axis=-1)[:, :L] \
        + 0.05 * rng.standard_normal((N, L))
    ls = np.full((L, M), 0.9)
    F = np.array([[1.0, 0.3], [0.3, 0.8]])[:L, :L]
    noise_cov = np.array([[0.05, 0.01], [0.01, 0.04]])[:L, :L]
    return X, Y, ls, F, noise_cov


@pytest.mark.parametrize('S', [1, 2, 8])
def test_lml_and_grads_match_upper_oracle(S):
    X, Y, ls, F, noise_cov = _fixture()
    N, L = Y.shape
    oracle = gp.covariant_upper_lml(jnp.asarray(X), jnp.asarray(ls),
                                    jnp.asarray(Y), block=16)
    want_v, (want_dF, want_dnz) = jax.value_and_grad(oracle, argnums=(0, 1))(
        jnp.asarray(F), jnp.asarray(noise_cov))

    dgp = DistributedCovariantGP(N, L, dist.make_n_mesh(S), block=8)
    st = dgp.stage(X, Y, ls)
    lml = dgp.lml_fn(st)
    got_v, (got_dF, got_dnz) = jax.value_and_grad(lml, argnums=(0, 1))(
        jnp.asarray(F), jnp.asarray(noise_cov))
    np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(got_dF), np.asarray(want_dF),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(got_dnz), np.asarray(want_dnz),
                               rtol=1e-7, atol=1e-9)


def test_gram_matches_dense_covariant():
    X, Y, ls, F, noise_cov = _fixture(N=20, L=2)
    N, L = Y.shape
    from romcomma_tpu.ops.gram import rbf_gram_covariant
    K_dense = np.array(rbf_gram_covariant(
        jnp.asarray(X), jnp.asarray(X), jnp.asarray(ls), jnp.asarray(F))
    ).reshape(L * N, L * N)
    K_dense += np.kron(np.asarray(noise_cov), np.eye(N))
    dgp = DistributedCovariantGP(N, L, dist.make_n_mesh(2), block=8)
    st = dgp.stage(X, Y, ls)
    K = np.asarray(dgp._gram(st.u, st.O, st.ns, jnp.asarray(F),
                             jnp.asarray(noise_cov)))
    # stored rows, global cols -> global/global, trim padding
    perm = np.asarray(dgp.plan.perm)
    real = perm < dgp.plan.N
    K_g = np.empty((dgp.plan.N, dgp.plan.Npad), K.dtype)
    K_g[perm[real]] = K[real]
    np.testing.assert_allclose(K_g[:, :L * N], K_dense, rtol=1e-10,
                               atol=1e-12)


def test_calibrate_smoke_matches_host():
    """A short frozen-ls calibration run reaches the single-chip host
    calibrator's optimum (same objective, same optimizer)."""
    X, Y, ls, F, noise_cov = _fixture(N=16, L=2, seed=3)
    N, L = Y.shape
    from romcomma_tpu.models.params import covariant_init, covariant_mask
    raw = covariant_init(np.eye(L), ls, 0.05 * np.eye(L))
    mask = covariant_mask()
    want_p, want_lml, _ = gp.calibrate_covariant_host(
        raw, mask, jnp.asarray(X), jnp.asarray(Y), maxiter=25,
        ls_frozen=True)
    dgp = DistributedCovariantGP(N, L, dist.make_n_mesh(2), block=8)
    got_p, got_lml, _ = dgp.calibrate(X, Y, raw, mask, maxiter=25)
    np.testing.assert_allclose(float(got_lml), float(want_lml), rtol=1e-6)
