"""The multi-device deferred two-level engine (parallel/cyclic_deferred.py —
the round-3 single-chip engine on the mesh, VERDICT r3 #1) vs numpy oracles
and the single-device engines, on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from romcomma_tpu.ops.gram import rbf_gram
from romcomma_tpu.parallel import distributed as dist
from romcomma_tpu.parallel import cyclic_deferred as cd


S = len(jax.devices())
B = 32
N = 300         # not divisible by B*S -> padding path live


@pytest.fixture(scope='module', params=[1, 2])
def engine(request):
    """A DeferredEngine + oracle data; params force NS = c/q super panels
    (q=2 -> one super panel spans 2 local blocks; q=1 -> 2 panels/device)."""
    rng = np.random.default_rng(3)
    M = 4
    X = rng.uniform(-1, 1, (N, M))
    Y = rng.normal(size=(N, 1))
    ls = jnp.asarray(np.full(M, 0.7))
    s2, noise = jnp.asarray(1.3), jnp.asarray(0.05)
    mesh = dist.make_n_mesh()
    pl = dist.plan(N, S=mesh.devices.size, B=B)
    assert pl.c == 2
    eng = cd.DeferredEngine(pl, mesh,
                            super_block=request.param * mesh.devices.size * B,
                            chol_precision=None,
                            grad_precision=lax.Precision.HIGHEST)
    assert eng.q == request.param
    xs = dist.to_stored(pl, X)
    x_dev = jax.device_put(jnp.asarray(xs), dist._row_sharding(mesh))
    y_dev = jnp.asarray(dist.to_stored(pl, Y))
    Kg = (np.asarray(rbf_gram(jnp.asarray(X), jnp.asarray(X), ls, s2))
          + float(noise) * np.eye(N))
    Kpad = np.eye(pl.Npad)
    Kpad[:N, :N] = Kg
    perm, inv = cd.stored_global_perms(pl)
    return dict(pl=pl, eng=eng, X=X, Y=Y, ls=ls, s2=s2, noise=noise,
                x_dev=x_dev, y_dev=y_dev, Kg=Kg, Kpad=Kpad, inv=inv)


def test_gram_chol_inv_match_oracle(engine):
    e = engine
    K = e['eng'].gram(e['x_dev'], e['ls'], e['s2'], e['noise'])
    K_grows = np.asarray(K)[e['inv']]          # rows to global order
    np.testing.assert_allclose(K_grows, e['Kpad'], atol=1e-12)
    U = e['eng'].chol(K)
    U_oracle = np.linalg.cholesky(e['Kpad']).T
    np.testing.assert_allclose(np.asarray(U)[e['inv']], U_oracle, atol=1e-11)
    assert abs(float(e['eng'].logdiag(U))
               - np.sum(np.log(np.diag(U_oracle)))) < 1e-10
    # solves through the stored-order boundary wrappers
    z = e['eng'].fwd(U, e['y_dev'])
    alpha = e['eng'].bwd(U, z)
    alpha_oracle = np.linalg.solve(e['Kg'], e['Y'])
    np.testing.assert_allclose(
        dist.from_stored(e['pl'], np.asarray(alpha)), alpha_oracle,
        atol=1e-9)
    # in-place distributed triangular inverse (donates U)
    V = e['eng'].inv(U)
    np.testing.assert_allclose(np.asarray(V)[e['inv']],
                               np.linalg.inv(U_oracle), atol=1e-10)


def test_ring_pair_grads_match_closed_form(engine):
    e = engine
    X, ls, s2, noise = e['X'], e['ls'], e['s2'], e['noise']
    K = e['eng'].gram(e['x_dev'], ls, s2, noise)
    U = e['eng'].chol(K)
    alpha = e['eng'].bwd(U, e['eng'].fwd(U, e['y_dev']))
    V = e['eng'].inv(U)
    a_o = np.linalg.solve(e['Kg'], e['Y'])
    Kinv = np.linalg.inv(e['Kg'])
    Bbar = 0.5 * (a_o @ a_o.T - Kinv)
    Ksig = e['Kg'] - float(noise) * np.eye(N)
    W = Bbar * Ksig
    D2 = (X[:, None, :] - X[None, :, :]) ** 2
    dls_o = np.einsum('ab,abm->m', W, D2) / np.asarray(ls) ** 3
    dls, ds2, dn = e['eng'].grads(V, alpha, e['x_dev'], ls, s2, noise)
    np.testing.assert_allclose(np.asarray(dls), dls_o, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(ds2), W.sum() / float(s2), rtol=1e-9)
    np.testing.assert_allclose(float(dn), np.trace(Bbar), rtol=1e-9)


def test_tail_panel_engine_matches_oracle():
    """q NOT dividing c: the partial tail super panel (round-4 tail-panel
    generalization — the S=1 prime-c compile fix) is bit/oracle-exact
    through chol, inverse, solves and the ring-pair grads."""
    rng = np.random.default_rng(9)
    M, Bt = 4, 16
    X = rng.uniform(-1, 1, (N, M))
    Y = rng.normal(size=(N, 1))
    ls = jnp.asarray(np.full(M, 0.8))
    s2, noise = jnp.asarray(1.1), jnp.asarray(0.05)
    mesh = dist.make_n_mesh()
    pl = dist.plan(N, S=mesh.devices.size, B=Bt)
    assert pl.c == 3
    eng = cd.DeferredEngine(pl, mesh, super_block=2 * mesh.devices.size * Bt,
                            chol_precision=None,
                            grad_precision=lax.Precision.HIGHEST)
    assert eng.q == 2 and cd.super_sizes(pl, eng.q) == [2, 1]
    xs = dist.to_stored(pl, X)
    x_dev = jax.device_put(jnp.asarray(xs), dist._row_sharding(mesh))
    y_dev = jnp.asarray(dist.to_stored(pl, Y))
    Kg = (np.asarray(rbf_gram(jnp.asarray(X), jnp.asarray(X), ls, s2))
          + float(noise) * np.eye(N))
    Kpad = np.eye(pl.Npad)
    Kpad[:N, :N] = Kg
    _, inv = cd.stored_global_perms(pl)
    K = eng.gram(x_dev, ls, s2, noise)
    U = eng.chol(K)
    U_oracle = np.linalg.cholesky(Kpad).T
    np.testing.assert_allclose(np.asarray(U)[inv], U_oracle, atol=1e-11)
    alpha = eng.bwd(U, eng.fwd(U, y_dev))
    a_o = np.linalg.solve(Kg, Y)
    np.testing.assert_allclose(dist.from_stored(pl, np.asarray(alpha)), a_o,
                               atol=1e-9)
    V = eng.inv(U)
    np.testing.assert_allclose(np.asarray(V)[inv], np.linalg.inv(U_oracle),
                               atol=1e-10)
    Kinv = np.linalg.inv(Kg)
    Bbar = 0.5 * (a_o @ a_o.T - Kinv)
    W = Bbar * (Kg - float(noise) * np.eye(N))
    D2 = (X[:, None, :] - X[None, :, :]) ** 2
    dls_o = np.einsum('ab,abm->m', W, D2) / np.asarray(ls) ** 3
    dls, ds2, dn = eng.grads(V, alpha, x_dev, ls, s2, noise)
    np.testing.assert_allclose(np.asarray(dls), dls_o, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(ds2), W.sum() / float(s2), rtol=1e-9)
    np.testing.assert_allclose(float(dn), np.trace(Bbar), rtol=1e-9)


def test_distributed_gp_cyclic2_valgrad_matches_cyclic():
    """DistributedGP(dense_kernels=True) on the 8-device mesh selects the
    deferred engine and its custom-VJP LML value+grad matches the round-1
    block-cyclic engine's to oracle precision."""
    rng = np.random.default_rng(11)
    M = 3
    X = rng.uniform(size=(N, M))
    Y = np.sin(3 * X[:, :1]) + 0.05 * rng.standard_normal((N, 1))
    mesh = dist.make_n_mesh()
    new = dist.DistributedGP(N, mesh, block=B, dense_kernels=True)
    assert new._engine == 'cyclic2'
    old = dist.DistributedGP(N, mesh, block=B)
    assert old._engine == 'cyclic'
    ls0 = jnp.asarray(np.full(M, 1.2))
    s2_0, nz0 = jnp.asarray(0.9), jnp.asarray(0.04)
    xn, yn = new.stage(X, Y)
    xo, yo = old.stage(X, Y)
    vn, gn = jax.value_and_grad(
        lambda p: new._lml(p[0], p[1], p[2], xn, yn))((ls0, s2_0, nz0))
    vo, go = jax.value_and_grad(
        lambda p: old._lml(p[0], p[1], p[2], xo, yo))((ls0, s2_0, nz0))
    np.testing.assert_allclose(float(vn), float(vo), rtol=1e-12)
    for a, b in zip(gn, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)


def test_cyclic2_posterior_predict_and_calibrate():
    """posterior_alpha / predict / a short host-paced calibrate all run on
    the deferred engine through DistributedGP's unchanged plumbing."""
    rng = np.random.default_rng(5)
    M = 3
    X = rng.uniform(size=(N, M))
    Y = np.sin(3 * X[:, :1]) + 0.05 * rng.standard_normal((N, 1))
    mesh = dist.make_n_mesh()
    dgp = dist.DistributedGP(N, mesh, block=B, dense_kernels=True)
    x_dev, y_dev = dgp.stage(X, Y)
    ls = jnp.asarray(np.full(M, 1.0))
    s2, nz = jnp.asarray(1.0), jnp.asarray(0.05)
    alpha, _ = dgp.posterior_alpha(ls, s2, nz, x_dev, y_dev)
    K = (np.asarray(rbf_gram(jnp.asarray(X), jnp.asarray(X), ls, s2))
         + float(nz) * np.eye(N))
    a_o = np.linalg.solve(K, Y)
    np.testing.assert_allclose(dist.from_stored(dgp.plan, np.asarray(alpha)),
                               a_o, atol=1e-10)
    Xs = rng.uniform(size=(7, M))
    mean, var = dgp.predict(ls, s2, nz, x_dev, y_dev, Xs)
    Ks = np.asarray(rbf_gram(jnp.asarray(X), jnp.asarray(Xs), ls, s2))
    np.testing.assert_allclose(np.asarray(mean), (Ks.T @ a_o)[:, 0],
                               atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(var),
        float(s2) - np.einsum('no,no->o', Ks, np.linalg.solve(K, Ks))
        + float(nz), atol=1e-9)
    (lsf, s2f, nzf), lml, iters = dgp.calibrate(
        X, Y, ls0=np.full(M, 1.0), s2_0=1.0, noise0=0.05, maxiter=3,
        max_linesearch_steps=2)
    v0 = float(dgp.lml(ls, s2, nz, x_dev, y_dev))
    assert np.isfinite(float(np.asarray(lml))) and float(np.asarray(lml)) >= v0


@pytest.mark.slow
def test_mesh_scale_deferred_end_to_end():
    """The VERDICT r3 #1 'done' criterion: the deferred cyclic engine at the
    N=2048/B=64 scale-realistic mesh shape — 32 block columns, 4 per device,
    NS=2 super panels of q=2 blocks (super_block snapped from the 3584
    default) — val+grad parity against the single-device oracle, a few
    calibrate iterations, and Sobol' parity through the posterior."""
    rng = np.random.default_rng(7)
    Nn, M, Bb = 2048, 6, 64
    X = rng.uniform(size=(Nn, M))
    Y = (np.sin(2.5 * X[:, :1]) + 0.4 * X[:, 1:2] ** 2
         + 0.02 * rng.standard_normal((Nn, 1)))
    mesh = dist.make_n_mesh()
    assert mesh.devices.size == 8
    dgp = dist.DistributedGP(Nn, mesh, block=Bb, dense_kernels=True)
    assert dgp._engine == 'cyclic2' and dgp.plan.NB == 32
    assert dgp._deferred.q >= 2                  # multi-block super panels
    x_dev, y_dev = dgp.stage(X, Y)

    ls0 = jnp.asarray(np.full(M, 1.0))
    s2_0, nz0 = jnp.asarray(1.0), jnp.asarray(0.05)
    v0, g0 = jax.value_and_grad(
        lambda p: dgp._lml(p[0], p[1], p[2], x_dev, y_dev))((ls0, s2_0, nz0))

    ref = dist.DistributedGP(Nn, dist.make_n_mesh(1), block=Bb)
    xr, yr = ref.stage(X, Y)
    vr, gr = jax.value_and_grad(
        lambda p: ref._lml(p[0], p[1], p[2], xr, yr))((ls0, s2_0, nz0))
    np.testing.assert_allclose(float(v0), float(vr), rtol=1e-10)
    for a, b in zip(g0, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)

    (ls, s2, nz), lml, iters = dgp.calibrate(
        X, Y, ls0=np.full(M, 1.0), s2_0=1.0, noise0=0.05, maxiter=2,
        max_linesearch_steps=1)
    assert np.isfinite(float(np.asarray(lml)))
    assert float(np.asarray(lml)) > -float(v0)

    lml_ref = ref.lml(jnp.asarray(ls), jnp.asarray(s2), jnp.asarray(nz),
                      xr, yr)
    np.testing.assert_allclose(float(np.asarray(lml)),
                               float(np.asarray(lml_ref)), rtol=1e-10)

    S_ = dgp.sobol_indices(ls, s2, nz, x_dev, y_dev, X,
                           kind=('first_order', 'total'))
    S_ref = ref.sobol_indices(ls, s2, nz, xr, yr, X,
                              kind=('first_order', 'total'))
    for k in S_:
        for m in S_[k]:
            assert abs(float(S_[k][m]) - float(S_ref[k][m])) < 1e-8, (k, m)
