"""Distributed GP linalg on the 8-virtual-device CPU mesh vs single-device
oracles: ring gram, blocked Cholesky, solves, LML value AND gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from romcomma_tpu.ops.gram import rbf_gram
from romcomma_tpu.parallel import distributed as dist


S = len(jax.devices())
B = 16          # small block so tests exercise multiple panels per device
N = 300         # deliberately NOT divisible by B*S -> padding path


@pytest.fixture(scope='module')
def problem():
    rng = np.random.default_rng(42)
    M = 5
    X = rng.normal(size=(N, M))
    Y = (np.sin(X[:, :1]) + 0.1 * rng.normal(size=(N, 1)))
    ls = jnp.asarray(rng.uniform(0.8, 2.0, M))
    s2, noise = jnp.asarray(1.7), jnp.asarray(0.05)
    mesh = dist.make_n_mesh()
    gp = dist.DistributedGP(N, mesh, block=B)
    x_dev, y_dev = gp.stage(X, Y)
    K_oracle = np.asarray(rbf_gram(jnp.asarray(X), jnp.asarray(X), ls, s2)
                          + noise * jnp.eye(N))
    return dict(X=X, Y=Y, ls=ls, s2=s2, noise=noise, gp=gp,
                x_dev=x_dev, y_dev=y_dev, K_oracle=K_oracle)


def test_plan_roundtrip():
    pl_ = dist.plan(N, S=S, B=B)
    a = np.arange(N * 3, dtype=float).reshape(N, 3)
    np.testing.assert_array_equal(dist.from_stored(pl_, dist.to_stored(pl_, a)), a)
    # every global block owned by device g % S
    for t, g in enumerate(pl_.g_of_t):
        assert t // pl_.c == g % S


def test_ring_gram_matches_oracle(problem):
    p = problem
    gp = p['gp']
    K = np.asarray(gp._gram(p['x_dev'], p['ls'], p['s2'], p['noise']))
    pl_ = gp.plan
    perm = np.asarray(pl_.perm)
    real = perm < N
    # real rows/cols must equal the permuted oracle
    want = p['K_oracle'][np.ix_(perm[real], perm[real])]
    got = K[np.ix_(real, real)]
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    # padding rows are identity
    pad = ~real
    np.testing.assert_allclose(K[np.ix_(pad, pad)], np.eye(pad.sum()), atol=0)
    assert np.all(K[np.ix_(pad, real)] == 0)


def test_distributed_cholesky_matches_oracle(problem):
    p = problem
    gp = p['gp']
    K = gp._gram(p['x_dev'], p['ls'], p['s2'], p['noise'])
    K_np = np.asarray(K)          # snapshot: _chol donates (consumes) K
    L = np.asarray(gp._chol(K))
    np.testing.assert_allclose(L @ L.T, K_np, rtol=1e-8, atol=1e-10)
    # lower-triangular in global elimination order
    pl_ = gp.plan
    g_row = np.repeat(np.asarray(pl_.g_of_t), pl_.B)
    order = np.argsort(g_row, kind='stable')
    Lg = L[np.ix_(order, order)]
    assert np.allclose(Lg, np.tril(Lg))


def test_solves_and_logdet(problem):
    p = problem
    gp = p['gp']
    K = gp._gram(p['x_dev'], p['ls'], p['s2'], p['noise'])
    K_np = np.asarray(K)          # snapshot: _chol donates (consumes) K
    L = gp._chol(K)
    z = gp._fwd(L, p['y_dev'])
    np.testing.assert_allclose(np.asarray(L) @ np.asarray(z), np.asarray(p['y_dev']),
                               rtol=1e-8, atol=1e-10)
    alpha = gp._bwd(L, z)
    np.testing.assert_allclose(K_np @ np.asarray(alpha),
                               np.asarray(p['y_dev']), rtol=1e-7, atol=1e-9)
    got_logdet = 2 * float(gp._logdiag(L))
    want_logdet = float(np.linalg.slogdet(p['K_oracle'])[1])
    np.testing.assert_allclose(got_logdet, want_logdet, rtol=1e-10)


def _oracle_lml(X, Y, ls, s2, noise):
    K = rbf_gram(jnp.asarray(X), jnp.asarray(X), ls, s2) + noise * jnp.eye(len(X))
    chol = jnp.linalg.cholesky(K)
    z = jax.scipy.linalg.solve_triangular(chol, jnp.asarray(Y), lower=True)
    return (-0.5 * jnp.sum(z * z) - jnp.sum(jnp.log(jnp.diagonal(chol)))
            - 0.5 * len(X) * jnp.log(2 * jnp.pi))


def test_lml_value_and_grad_match_oracle(problem):
    p = problem
    gp = p['gp']

    def f_dist(ls, s2, noise):
        return gp.lml(ls, s2, noise, p['x_dev'], p['y_dev'])

    def f_oracle(ls, s2, noise):
        return _oracle_lml(p['X'], p['Y'], ls, s2, noise)

    v_d = float(f_dist(p['ls'], p['s2'], p['noise']))
    v_o = float(f_oracle(p['ls'], p['s2'], p['noise']))
    np.testing.assert_allclose(v_d, v_o, rtol=1e-9)

    g_d = jax.grad(f_dist, argnums=(0, 1, 2))(p['ls'], p['s2'], p['noise'])
    g_o = jax.grad(f_oracle, argnums=(0, 1, 2))(p['ls'], p['s2'], p['noise'])
    for gd, go in zip(g_d, g_o):
        np.testing.assert_allclose(np.asarray(gd), np.asarray(go),
                                   rtol=1e-6, atol=1e-9)


def test_predict_matches_oracle(problem):
    p = problem
    gp = p['gp']
    Xs = np.random.default_rng(7).normal(size=(9, p['X'].shape[1]))
    mean, var = gp.predict(p['ls'], p['s2'], p['noise'], p['x_dev'], p['y_dev'], Xs)
    Ks = np.asarray(rbf_gram(jnp.asarray(p['X']), jnp.asarray(Xs), p['ls'], p['s2']))
    Kinv = np.linalg.inv(p['K_oracle'])
    mean_o = Ks.T @ Kinv @ p['Y']
    var_o = float(p['s2']) - np.einsum('no,nm,mo->o', Ks, Kinv, Ks) + float(p['noise'])
    np.testing.assert_allclose(np.asarray(mean), mean_o[:, 0], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(var), var_o, rtol=1e-6, atol=1e-9)


def test_calibrate_improves_lml(problem):
    p = problem
    gp = p['gp']
    ls0 = np.full(p['X'].shape[1], 2.0)
    (ls, s2, noise), lml, iters = gp.calibrate(p['X'], p['Y'], ls0, 1.0, 0.1,
                                               maxiter=25)
    lml0 = float(gp.lml(jnp.asarray(ls0), jnp.asarray(1.0), jnp.asarray(0.1),
                        p['x_dev'], p['y_dev']))
    assert float(lml) > lml0
    assert np.isfinite(float(lml))
    assert float(noise) > 0


def test_lml_grad_single_device_linv_path():
    """Single-device mesh exercises the Linv^T Linv K^{-1} build (the
    multi-device tests take the chunked two-sweep path)."""
    import jax
    rng = np.random.default_rng(7)
    n, M = 72, 4
    X = rng.normal(size=(n, M))
    Y = np.sin(X[:, :1]) + 0.1 * rng.normal(size=(n, 1))
    ls = jnp.asarray(rng.uniform(0.8, 2.0, M))
    s2, noise = jnp.asarray(1.3), jnp.asarray(0.05)
    mesh = dist.make_n_mesh(1)
    gp = dist.DistributedGP(n, mesh, block=16)
    assert gp.plan.S == 1
    x_dev, y_dev = gp.stage(X, Y)

    def f_dist(ls, s2, noise):
        return gp.lml(ls, s2, noise, x_dev, y_dev)

    def f_oracle(ls, s2, noise):
        return _oracle_lml(X, Y, ls, s2, noise)

    np.testing.assert_allclose(float(f_dist(ls, s2, noise)),
                               float(f_oracle(ls, s2, noise)), rtol=1e-9)
    g_d = jax.grad(f_dist, argnums=(0, 1, 2))(ls, s2, noise)
    g_o = jax.grad(f_oracle, argnums=(0, 1, 2))(ls, s2, noise)
    for gd, go in zip(g_d, g_o):
        np.testing.assert_allclose(np.asarray(gd), np.asarray(go),
                                   rtol=1e-6, atol=1e-9)


def test_calibrate_dense_direct_matches_blocked_engine():
    """On a 1-device mesh below DENSE_DIRECT_MAX_N, calibrate takes the dense
    fused-step fast path; it must land on the same optimum as the blocked
    engine (same objective, transforms and stopping rules)."""
    from romcomma_tpu.parallel import distributed as dist
    rng = np.random.default_rng(5)
    N, M = 90, 3
    X = rng.uniform(-1.0, 1.0, (N, M))
    Y = np.sin(np.pi * X[:, :1]) + 0.05 * rng.standard_normal((N, 1))
    ls0 = np.full(M, 1.5)
    gp_fast = dist.DistributedGP(N, dist.make_n_mesh(1), block=32)
    assert N <= gp_fast.DENSE_DIRECT_MAX_N
    (ls_f, s2_f, nz_f), lml_f, _ = gp_fast.calibrate(X, Y, ls0, 1.0, 0.1,
                                                     maxiter=400)
    gp_blk = dist.DistributedGP(N, dist.make_n_mesh(1), block=32)
    gp_blk.DENSE_DIRECT_MAX_N = 0            # force the blocked engine
    (ls_b, s2_b, nz_b), lml_b, _ = gp_blk.calibrate(X, Y, ls0, 1.0, 0.1,
                                                    maxiter=400)
    # Different L-BFGS drivers (scipy L-BFGS-B vs optax zoom) take different
    # trajectories; parity is defined on the CONVERGED optimum (SURVEY §7).
    np.testing.assert_allclose(float(lml_f), float(lml_b), rtol=2e-4)
    np.testing.assert_allclose(float(nz_f), float(nz_b), rtol=5e-2)


def test_distributed_gp_dtype_override():
    """DistributedGP(dtype=np.float64) must stage (and therefore compute) in
    f64 regardless of the working FLOAT() — the f64 escalation ladder relies
    on it (a FLOAT()-pinned stage silently re-ran the failing f32 descent)."""
    from romcomma_tpu.parallel import distributed as dist
    rng = np.random.default_rng(0)
    X = rng.standard_normal((40, 2)).astype(np.float32)
    Y = X[:, :1].astype(np.float32)
    gp64 = dist.DistributedGP(40, dist.make_n_mesh(1), block=8, dtype=np.float64)
    x_dev, y_dev = gp64.stage(X, Y)
    assert x_dev.dtype == jnp.float64 and y_dev.dtype == jnp.float64
    lml = gp64.lml(jnp.ones(2), jnp.asarray(1.0), jnp.asarray(0.1), x_dev, y_dev)
    assert np.isfinite(float(lml))


def test_streaming_grads_match_stored():
    """The strip-streaming gradient build (the N=50k single-chip HBM route)
    reproduces the stored-K^{-1} custom-VJP gradient."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(9)
    N, M = 150, 4
    x = rng.normal(size=(N, M))
    y = np.sin(x[:, :1]) + 0.05 * rng.standard_normal((N, 1))
    dgp = dist.DistributedGP(N, dist.make_n_mesh(1), block=32)
    x_dev, y_dev = dgp.stage(x, y)
    ls = jnp.asarray(np.full(M, 1.5), x_dev.dtype)
    s2 = jnp.asarray(1.2, x_dev.dtype)
    nz = jnp.asarray(0.05, x_dev.dtype)

    def value(p):
        return dgp._lml(p[0], p[1], p[2], x_dev, y_dev)

    v0, g_stored = jax.value_and_grad(value)((ls, s2, nz))

    # Force the streaming route and rebuild the custom-VJP LML.
    dgp.GRADS_MEMORY_BUDGET_BYTES = 0
    dgp._lml = dgp._build_lml()
    v1, g_stream = jax.value_and_grad(value)((ls, s2, nz))

    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-12)
    for a, b in zip(g_stream, g_stored):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)


def test_streaming_v2_vvt_grads_match_stored():
    """The streaming-v2 backward (dense upper engine: refactorize + explicit
    triangular inverse, K^{-1} strips as V V^T matmuls) reproduces the
    stored-K^{-1} gradient — the N=50k single-chip route."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(17)
    N, M = 150, 4
    x = rng.normal(size=(N, M))
    y = np.sin(x[:, :1]) + 0.05 * rng.standard_normal((N, 1))
    dgp = dist.DistributedGP(N, dist.make_n_mesh(1), block=32,
                             dense_kernels=True)
    assert dgp._engine == 'upper'
    x_dev, y_dev = dgp.stage(x, y)
    ls = jnp.asarray(np.full(M, 1.5), x_dev.dtype)
    s2 = jnp.asarray(1.2, x_dev.dtype)
    nz = jnp.asarray(0.05, x_dev.dtype)

    def value(p):
        return dgp._lml(p[0], p[1], p[2], x_dev, y_dev)

    v0, g_stored = jax.value_and_grad(value)((ls, s2, nz))
    dgp.GRADS_MEMORY_BUDGET_BYTES = 0          # force streaming; engine is
    dgp._lml = dgp._build_lml()                # 'upper' => v2 (vvt) route
    v1, g_vvt = jax.value_and_grad(value)((ls, s2, nz))

    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-12)
    for a, b in zip(g_vvt, g_stored):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)


def test_multichip_end_to_end_stage_calibrate_sobol():
    """The full multi-chip plan — stage -> calibrate -> sobol_indices
    (no-error AND error kinds) — executes end-to-end on the 8-device mesh:
    the validated route for N beyond one chip's HBM (BASELINE scale-up row).
    Tiny shapes; the assertions are structural + oracle-free sanity."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(12)
    Nn, M = 192, 4
    X = rng.normal(size=(Nn, M))
    Y = np.sin(X[:, :1]) + 0.3 * X[:, 1:2] ** 2 + 0.05 * rng.standard_normal((Nn, 1))
    mesh = dist.make_n_mesh()                      # all 8 virtual devices
    assert mesh.devices.size == 8
    dgp = dist.DistributedGP(Nn, mesh, block=16)
    x_dev, y_dev = dgp.stage(X, Y)
    (ls, s2, nz), lml, iters = dgp.calibrate(X, Y, ls0=np.full(M, 2.0),
                                             s2_0=1.0, noise0=0.05, maxiter=40)
    assert np.isfinite(float(np.asarray(lml)))
    out = dgp.sobol_indices(ls, s2, nz, x_dev, y_dev, X,
                            kind=('first_order', 'total'), error=True)
    S, T = out['S'], out['T']
    assert S['first_order'][0] > 0.2 and S['first_order'][1] > 0.1
    assert S['first_order'][3] < 0.05
    assert all(np.isfinite(v) for k in T for v in T[k].values())


def test_dense_kernels_engine_matches_block_cyclic():
    """The S==1 dense-kernel engine (ops/blocked.py cholesky/TRSM swapped in)
    reproduces the block-cyclic engine's LML value and gradient."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(13)
    Nn, M = 180, 4
    x = rng.normal(size=(Nn, M))
    y = np.sin(x[:, :1]) + 0.05 * rng.standard_normal((Nn, 1))
    ls = jnp.asarray(np.full(M, 1.4))
    s2, nz = jnp.asarray(1.1), jnp.asarray(0.05)

    outs = []
    for dense in (False, True):
        dgp = dist.DistributedGP(Nn, dist.make_n_mesh(1), block=32,
                                 dense_kernels=dense)
        x_dev, y_dev = dgp.stage(x, y)
        v, g = jax.value_and_grad(
            lambda p: dgp._lml(p[0], p[1], p[2], x_dev, y_dev))((ls, s2, nz))
        outs.append((float(v), jax.device_get(g)))
    np.testing.assert_allclose(outs[1][0], outs[0][0], rtol=1e-9)
    for a, b in zip(outs[1][1], outs[0][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


def test_two_level_inverse_knob_matches_default_engine(monkeypatch):
    """INV_TWO_LEVEL swaps the streaming gradient's V = U^{-1} kernel for
    the super-panel Schur variant; the LML value is untouched and the
    gradient agrees to kernel roundoff."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(17)
    Nn, M = 170, 4
    x = rng.normal(size=(Nn, M))
    y = np.sin(x[:, :1]) + 0.05 * rng.standard_normal((Nn, 1))
    ls = jnp.asarray(np.full(M, 1.4))
    s2, nz = jnp.asarray(1.1), jnp.asarray(0.05)

    outs = []
    for two_level in (False, True):
        monkeypatch.setattr(dist.DistributedGP, 'INV_TWO_LEVEL', two_level)
        monkeypatch.setattr(dist.DistributedGP, 'INV_SUPER_BLOCK', 96)
        dgp = dist.DistributedGP(Nn, dist.make_n_mesh(1), block=32,
                                 dense_kernels=True)
        x_dev, y_dev = dgp.stage(x, y)
        v, g = jax.value_and_grad(
            lambda p: dgp._lml(p[0], p[1], p[2], x_dev, y_dev))((ls, s2, nz))
        outs.append((float(v), jax.device_get(g)))
    np.testing.assert_allclose(outs[1][0], outs[0][0], rtol=1e-12)
    for a, b in zip(outs[1][1], outs[0][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


def test_pair_tile_backward_matches_strip(monkeypatch):
    """GRAD_PAIR_TILES (symmetric unordered-pair tiles, weight-2
    off-diagonal blocks, segment-narrowed contractions) reproduces the
    per-strip streaming backward's LML gradient — including the clamped
    overlapping last tile (N chosen so Npad % strip != 0) and padding."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(23)
    Nn, M = 230, 4                      # Npad=256, strip=96 -> clamped tile
    x = rng.normal(size=(Nn, M))
    y = np.sin(x[:, :1]) + 0.05 * rng.standard_normal((Nn, 1))
    ls = jnp.asarray(np.full(M, 1.3))
    s2, nz = jnp.asarray(1.2), jnp.asarray(0.04)

    outs = []
    for pair_tiles in (False, True):
        monkeypatch.setattr(dist.DistributedGP, 'GRAD_PAIR_TILES', pair_tiles)
        monkeypatch.setattr(dist.DistributedGP, 'GRAD_STRIP_COLS', 96)
        dgp = dist.DistributedGP(Nn, dist.make_n_mesh(1), block=32,
                                 dense_kernels=True)
        x_dev, y_dev = dgp.stage(x, y)
        v, g = jax.value_and_grad(
            lambda p: dgp._lml(p[0], p[1], p[2], x_dev, y_dev))((ls, s2, nz))
        outs.append((float(v), jax.device_get(g)))
    np.testing.assert_allclose(outs[1][0], outs[0][0], rtol=1e-12)
    for a, b in zip(outs[1][1], outs[0][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


def test_calibrate_multi_matches_per_output():
    """Joint vmapped L-output descent (calibrate_multi) reaches the same
    hyperparameters and LMLs as L independent descents — on the 8-device
    block-cyclic engine (vmap over the shard_map kernels)."""
    rng = np.random.default_rng(21)
    Nn, M, L = 192, 3, 3
    X = rng.uniform(size=(Nn, M))
    Y = np.stack([np.sin((l + 1.0) * X[:, 0]) + 0.1 * X[:, 1] ** (l + 1)
                  + 0.05 * rng.standard_normal(Nn) for l in range(L)], axis=1)
    mesh = dist.make_n_mesh()
    dgp = dist.DistributedGP(Nn, mesh, block=16)
    assert dgp.fits_multi(L)
    ls0 = np.full((L, M), 2.0)
    (ls_b, s2_b, nz_b), lml_b, _ = dgp.calibrate_multi(
        X, Y, ls0, np.ones(L), np.full(L, 0.05), maxiter=60)
    for l in range(L):
        (ls_l, s2_l, nz_l), lml_l, _ = dgp.calibrate(
            X, Y[:, l:l + 1], ls0[l], 1.0, 0.05, maxiter=60)
        assert abs(float(lml_b[l]) - float(lml_l)) < max(0.5, 0.02 * abs(float(lml_l)))
        # inert inputs have unidentifiable (divergent) lengthscales — the
        # identifiable quantity is the relevance 1/ls
        np.testing.assert_allclose(1.0 / np.asarray(ls_b)[l], 1.0 / np.asarray(ls_l),
                                   rtol=0.3, atol=0.15)
        np.testing.assert_allclose(float(s2_b[l]), float(s2_l), rtol=0.3, atol=0.3)
        np.testing.assert_allclose(float(nz_b[l]), float(nz_l), rtol=0.3, atol=0.02)


def test_calibrate_multi_dense_engine_matches_per_output():
    """calibrate_multi vmaps the custom-VJP LML over L outputs; with the
    dense upper engine (the production engine beyond the dense-direct N
    ceiling) the blocked kernels must batch correctly under vmap."""
    rng = np.random.default_rng(29)
    Nn, M, L = 160, 3, 2
    X = rng.uniform(size=(Nn, M))
    Y = np.stack([np.sin((l + 1.0) * X[:, 0]) + 0.05 * rng.standard_normal(Nn)
                  for l in range(L)], axis=1)
    dgp = dist.DistributedGP(Nn, dist.make_n_mesh(1), block=32,
                             dense_kernels=True)
    assert dgp._engine == 'upper'
    ls0 = np.full((L, M), 2.0)
    (ls_b, s2_b, nz_b), lml_b, _ = dgp.calibrate_multi(
        X, Y, ls0, np.ones(L), np.full(L, 0.05), maxiter=60)
    for l in range(L):
        (ls_l, s2_l, nz_l), lml_l, _ = dgp.calibrate(
            X, Y[:, l:l + 1], ls0[l], 1.0, 0.05, maxiter=60)
        assert abs(float(lml_b[l]) - float(lml_l)) < max(0.5, 0.02 * abs(float(lml_l)))
        np.testing.assert_allclose(1.0 / np.asarray(ls_b)[l], 1.0 / np.asarray(ls_l),
                                   rtol=0.3, atol=0.15)


def test_sobol_indices_multi_output():
    """Batched (L,M)/(L,) hyperparameters -> per-output index structures
    matching L separate single-output calls (variant GPs share only X)."""
    rng = np.random.default_rng(31)
    Nn, M, L = 160, 3, 2
    X = rng.standard_normal((Nn, M))
    Y = np.stack([np.sin(X[:, 0]), 0.5 * X[:, 1] ** 2], axis=1) \
        + 0.05 * rng.standard_normal((Nn, L))
    dgp = dist.DistributedGP(Nn, dist.make_n_mesh(1), block=32)
    x_dev, y_dev = dgp.stage(X, Y)
    ls = np.full((L, M), 2.0) * np.array([[1.0], [1.5]])
    s2, nz = np.array([1.0, 0.8]), np.array([0.05, 0.04])
    multi = dgp.sobol_indices(ls, s2, nz, x_dev, y_dev, X,
                              kind=('first_order', 'total'))
    assert isinstance(multi, list) and len(multi) == L
    for l in range(L):
        single = dgp.sobol_indices(ls[l], s2[l], nz[l], x_dev,
                                   y_dev[:, l:l + 1], X,
                                   kind=('first_order', 'total'))
        for k in single:
            for m in range(M):
                np.testing.assert_allclose(multi[l][k][m], single[k][m],
                                           rtol=1e-10, atol=1e-12)


def test_sobol_indices_multi_output_error():
    """Batched (L,M)/(L,) hyperparameters with error=True -> per-output
    {'S','T'} structures matching L separate single-output error calls: the
    ONE-stacked-sweep path (gsa/calibrators.marginalize_intervals_error_
    stacked + factorized_errors.error_scan_stacked, chunk steps vmapped
    over outputs).  n_chunk=0 keeps the chunk partition identical between
    routes so the vmapped math is the same ops.  Runs on the full virtual
    mesh, covering the sharded error_sweep at psi_rank=5; the second combo
    covers the lazy per-output psi-solver factory (error_solver='device')
    and the stacked fast_V twin pass (gsa_dtype=float32)."""
    rng = np.random.default_rng(47)
    Nn, M, L = 120, 3, 2
    X = rng.standard_normal((Nn, M))
    Y = np.stack([np.sin(X[:, 0]) + 0.2 * X[:, 1],
                  0.5 * X[:, 1] ** 2], axis=1) \
        + 0.05 * rng.standard_normal((Nn, L))
    dgp = dist.DistributedGP(Nn, dist.make_n_mesh(), block=32)
    x_dev, y_dev = dgp.stage(X, Y)
    ls = np.full((L, M), 2.0) * np.array([[1.0], [1.5]])
    s2, nz = np.array([1.0, 0.8]), np.array([0.05, 0.04])
    # The f64 combo is near-bit-identical (n_chunk=0 pins both routes to
    # one chunk; the vmapped f64 math is the same ops).  The fast_V combo's
    # f32 V planes lower to DIFFERENT f32 reduction orders under vmap
    # (batched einsum tiling), so its route-vs-route deltas sit at the f32
    # tier's own accuracy (~1e-5 typical, up to ~1e-4 absolute on
    # near-zero indices here) — the same magnitude the stacked no-error
    # path pins (BASELINE.md stacked-GSA row: max dS 3.0e-5 vs sequential).
    for solver, partial, gdt, tolS, tolT in (
            ('auto', True, None, dict(rtol=1e-10, atol=1e-12),
             dict(rtol=1e-8, atol=1e-10)),
            ('device', False, np.float32, dict(rtol=0, atol=2e-4),
             dict(rtol=0, atol=2e-4))):
        kw = dict(kind=('first_order', 'total'), error=True,
                  is_T_partial=partial, n_chunk=0, gsa_dtype=gdt,
                  error_solver=solver)
        multi = dgp.sobol_indices(ls, s2, nz, x_dev, y_dev, X, **kw)
        assert isinstance(multi, list) and len(multi) == L
        for l in range(L):
            single = dgp.sobol_indices(ls[l], s2[l], nz[l], x_dev,
                                       y_dev[:, l:l + 1], X, **kw)
            for k in ('first_order', 'total'):
                for m in range(M):
                    np.testing.assert_allclose(
                        multi[l]['S'][k][m], single['S'][k][m], **tolS)
                    np.testing.assert_allclose(
                        multi[l]['T'][k][m], single['T'][k][m], **tolT)


def test_mogp_surface_streaming_route(monkeypatch, tmp_path):
    """MOGP.calibrate through the PUBLIC surface with thresholds forced to
    the N=50k production configuration (dense upper engine + streaming-v2
    backward): converges, writes the tree, and the stored log_marginal is
    disk-self-consistent."""
    import jax.numpy as jnp
    from romcomma_tpu import user
    from romcomma_tpu.data.storage import Fold
    from romcomma_tpu.models.gpr import MOGP
    from romcomma_tpu.models import gp as gpmod
    monkeypatch.setattr(dist.DistributedGP, 'DENSE_DIRECT_MAX_N', 0)
    monkeypatch.setattr(dist.DistributedGP, 'GRADS_MEMORY_BUDGET_BYTES', 0)
    monkeypatch.setattr(dist.DistributedGP, 'MULTI_MEMORY_BUDGET_BYTES', 0)
    monkeypatch.setattr(dist, 'make_n_mesh', lambda n=1: dist.Mesh(
        np.array(jax.devices()[:1]), ('n',)))
    noise = user.sample.GaussianNoise.Variance(L=3, magnitude=0.05)
    repo = user.sample.Function(tmp_path, user.sample.DOE.latin_hypercube,
                                user.functions.ISHIGAMI, N=100, M=3,
                                noise_variance=noise).repo.into_K_folds(K=1)
    gp_m = MOGP('gpr_stream', Fold(repo, 0), is_read=False,
                is_covariant=False, is_isotropic=False)
    meta = gp_m.calibrate(large_n_threshold=1, maxiter=40)
    dgp_probe = dist.DistributedGP(100, dist.make_n_mesh(1),
                                   dense_kernels=True)
    assert dgp_probe._engine == 'upper'
    lml = float(np.asarray(gpmod.lml_variant(
        gp_m._variant_raw(), jnp.asarray(gp_m._X), jnp.asarray(gp_m._Y))).sum())
    stored = float(np.asarray(gp_m._likelihood.data.log_marginal.np,
                              dtype=float).sum())
    assert abs(lml - stored) < 1e-4 * max(1.0, abs(lml))
    assert (Fold(repo, 0).folder / 'gpr_stream/kernel/lengthscales.csv').exists()


def test_streaming_scale_calibrate_route(monkeypatch):
    """At streaming-gradient scale the calibration must drive scipy L-BFGS-B
    over the EAGER custom-VJP chain (one fused value+grad program holds two
    (Npad,Npad) buffers — the N=50k HBM OOM). Forced here by zeroing the
    budget; the result must match the fused-step route."""
    rng = np.random.default_rng(23)
    Nn, M = 300, 3
    X = rng.uniform(size=(Nn, M))
    Y = np.sin(3 * X[:, :1]) + 0.05 * rng.standard_normal((Nn, 1))
    ref = dist.DistributedGP(Nn, dist.make_n_mesh(1), block=32)
    (_, _, _), lml_a, _ = ref.calibrate(X, Y, np.full(M, 2.0), 1.0, 0.05,
                                        maxiter=50)
    monkeypatch.setattr(dist.DistributedGP, 'GRADS_MEMORY_BUDGET_BYTES', 0)
    monkeypatch.setattr(dist.DistributedGP, 'DENSE_DIRECT_MAX_N', 0)
    dgp = dist.DistributedGP(Nn, dist.make_n_mesh(1), block=32,
                             dense_kernels=True)
    (_, _, _), lml_b, _ = dgp.calibrate(X, Y, np.full(M, 2.0), 1.0, 0.05,
                                        maxiter=50)
    assert abs(float(lml_a) - float(lml_b)) < max(0.5, 0.01 * abs(float(lml_a)))


@pytest.mark.slow
def test_mesh_scale_block_cyclic_end_to_end():
    """Scale-realistic virtual-mesh run (VERDICT r2 #7): N=2048, B=64 over
    all 8 devices — 32 block-columns, 4 per device, so the block-cyclic
    layout, the ring gram, and the cyclic solve sweeps all carry non-trivial
    load — driving stage -> calibrate (few host-paced iters over the eager
    custom-VJP chain) -> sobol_indices, with LML and S pinned against the
    single-device oracle. (N=4096 was measured at 103 s per val+grad on the
    CPU mesh — a calibrate there is not CI-viable; 2048 is 31 s/eval.)"""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    Nn, M, B = 2048, 6, 64
    X = rng.uniform(size=(Nn, M))
    Y = (np.sin(2.5 * X[:, :1]) + 0.4 * X[:, 1:2] ** 2
         + 0.02 * rng.standard_normal((Nn, 1)))
    mesh = dist.make_n_mesh()
    assert mesh.devices.size == 8
    dgp = dist.DistributedGP(Nn, mesh, block=B)
    assert dgp._engine == 'cyclic' and dgp.plan.NB == 32
    x_dev, y_dev = dgp.stage(X, Y)

    ls0 = jnp.asarray(np.full(M, 1.0))
    s2_0, nz0 = jnp.asarray(1.0), jnp.asarray(0.05)
    v0, g0 = jax.value_and_grad(
        lambda p: dgp._lml(p[0], p[1], p[2], x_dev, y_dev))((ls0, s2_0, nz0))

    ref = dist.DistributedGP(Nn, dist.make_n_mesh(1), block=B)
    xr, yr = ref.stage(X, Y)
    vr, gr = jax.value_and_grad(
        lambda p: ref._lml(p[0], p[1], p[2], xr, yr))((ls0, s2_0, nz0))
    np.testing.assert_allclose(float(v0), float(vr), rtol=1e-10)
    for a, b in zip(g0, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-7, atol=1e-9)

    # A few host-paced L-BFGS iterations over the eager custom-VJP chain
    # (instance budget zeroed: the fused optax step would pay a second,
    # larger compile for no extra coverage — kernels are already compiled).
    dgp.GRADS_MEMORY_BUDGET_BYTES = 0
    (ls, s2, nz), lml, iters = dgp.calibrate(
        X, Y, ls0=np.full(M, 1.0), s2_0=1.0, noise0=0.05, maxiter=2,
        max_linesearch_steps=1)
    assert np.isfinite(float(np.asarray(lml)))
    assert float(np.asarray(lml)) > -float(v0)    # improved on the start

    # Multi-device LML at the calibrated hypers == single-device oracle.
    lml_ref = ref.lml(jnp.asarray(ls), jnp.asarray(s2), jnp.asarray(nz),
                      xr, yr)
    np.testing.assert_allclose(float(np.asarray(lml)),
                               float(np.asarray(lml_ref)), rtol=1e-10)

    # Both-kind Sobol' through the distributed posterior; S parity with the
    # single-device engine at the same hypers.
    S = dgp.sobol_indices(ls, s2, nz, x_dev, y_dev, X,
                          kind=('first_order', 'total'))
    S_ref = ref.sobol_indices(ls, s2, nz, xr, yr, X,
                              kind=('first_order', 'total'))
    for k in S:
        for m in S[k]:
            assert abs(float(S[k][m]) - float(S_ref[k][m])) < 1e-8, (k, m)
    assert S['first_order'][0] > 0.3          # sin(2.5 x0) dominates
    assert sum(S['first_order'].values()) < 1.05


def test_residual_ff_exp_tier_matches_exact(problem):
    """The float-float exp tier of the refinement-residual gram
    (DistributedGP.RESIDUAL_FF_EXP — the accelerator default, where the
    emulated-f64 transcendental dominates every refinement round): the
    residual r = y - K alpha computed with ff_exp grams must match the
    exact-f64 residual to the tier's ~3e-11 relative accuracy, far inside
    what the safeguarded refinement loop needs."""
    p = problem
    mesh = dist.make_n_mesh()
    exact = dist.DistributedGP(N, mesh, block=B)
    ff = dist.DistributedGP(N, mesh, block=B)
    ff.RESIDUAL_FF_EXP = True           # instance override: force the tier
    exact.RESIDUAL_FF_EXP = False
    x_dev, y_dev = exact.stage(p['X'], p['Y'])
    x64 = jnp.asarray(x_dev, jnp.float64)
    y64 = jnp.asarray(y_dev, jnp.float64)
    rng = np.random.default_rng(7)
    alpha = jnp.asarray(rng.standard_normal(y64.shape))
    h64 = (jnp.asarray(p['ls'], jnp.float64), jnp.asarray(p['s2'], jnp.float64),
           jnp.asarray(p['noise'], jnp.float64))
    r_exact = np.asarray(exact._residual_f64()(x64, y64, alpha, *h64))
    r_ff = np.asarray(ff._residual_f64()(x64, y64, alpha, *h64))
    # the K alpha product is O(N * |K| * |alpha|); tier error is relative to it
    scale = float(np.abs(r_exact).max() + np.abs(np.asarray(y64)).max())
    assert np.abs(r_ff - r_exact).max() / scale < 1e-9
    # and the ff-tier posterior still converges to an f64-grade solve
    a_ff, _ = ff.posterior_alpha(*h64, x_dev, y_dev, refine=2)
    K = p['K_oracle']
    a_oracle = np.linalg.solve(K, np.asarray(p['Y']))
    perm = np.asarray(ff.plan.perm)
    real = perm < N
    np.testing.assert_allclose(np.asarray(a_ff)[real, 0], a_oracle[perm[real], 0],
                               rtol=1e-6, atol=1e-9)


def test_posterior_refine_early_stop(problem):
    """REFINE_RTOL convergence stop: each refinement round rebuilds an
    O(N^2) f64 gram on the fly, so once the true residual is at the
    f64-grade floor further rounds are pure cost. A converged solve must
    stop invoking the residual (observed via a counting wrapper) and still
    match the f64 oracle; an effectively-disabled tolerance must return the
    plain working-dtype solve untouched."""
    p = problem
    # f32 working dtype: the refinement path only exists off-f64
    gp = dist.DistributedGP(N, dist.make_n_mesh(), block=B, dtype=np.float32)
    x_dev, y_dev = gp.stage(p['X'], p['Y'])
    hyp = gp._cast_hypers(x_dev, p['ls'], p['s2'], p['noise'])

    calls = []
    inner = gp._residual_f64()
    gp._residual_cached = lambda *a: (calls.append(1), inner(*a))[1]
    a1, _ = gp.posterior_alpha(*hyp, x_dev, y_dev, refine=5)
    n_with_default = len(calls)
    assert n_with_default <= 4          # converged long before 5 rounds

    # a huge tolerance accepts the unrefined solve after one residual check
    calls.clear()
    gp.REFINE_RTOL = np.inf
    a0, _ = gp.posterior_alpha(*hyp, x_dev, y_dev, refine=5)
    assert len(calls) == 1

    # oracle on the f32-rounded inputs the engine actually staged
    X32 = jnp.asarray(p['X'].astype(np.float32), jnp.float64)
    K32 = np.asarray(rbf_gram(X32, X32, jnp.asarray(p['ls'], jnp.float64),
                              jnp.asarray(p['s2'], jnp.float64))
                     + np.float64(p['noise']) * jnp.eye(N))
    a_oracle = np.linalg.solve(K32, np.asarray(p['Y'], np.float32)
                               .astype(np.float64))
    perm = np.asarray(gp.plan.perm)
    real = perm < N
    np.testing.assert_allclose(np.asarray(a1)[real, 0], a_oracle[perm[real], 0],
                               rtol=1e-6, atol=1e-8)


def test_residual_mv_reduce_matches_matmul(problem):
    """The narrow-RHS multiply+reduce form of the refinement residual's
    K-row contraction (RESIDUAL_MV_REDUCE_MAX_R — the accelerator default
    for R <= 4, where an emulated-f64 GEMV runs off the MXU ~10x slower
    than the reduction) computes the same residual as the BLAS matmul the
    CPU keeps, in exact f64 arithmetic."""
    p = problem
    mesh = dist.make_n_mesh()
    mm = dist.DistributedGP(N, mesh, block=B)
    mv = dist.DistributedGP(N, mesh, block=B)
    mm.RESIDUAL_MV_REDUCE_MAX_R = 0     # force the matmul form
    mv.RESIDUAL_MV_REDUCE_MAX_R = 4     # force the reduction form (on CPU)
    x_dev, y_dev = mm.stage(p['X'], p['Y'])
    x64 = jnp.asarray(x_dev, jnp.float64)
    y64 = jnp.asarray(y_dev, jnp.float64)
    rng = np.random.default_rng(11)
    alpha = jnp.asarray(rng.standard_normal(y64.shape))
    h64 = (jnp.asarray(p['ls'], jnp.float64),
           jnp.asarray(p['s2'], jnp.float64),
           jnp.asarray(p['noise'], jnp.float64))
    r_mm = np.asarray(mm._residual_f64()(x64, y64, alpha, *h64))
    r_mv = np.asarray(mv._residual_f64()(x64, y64, alpha, *h64))
    scale = float(np.abs(r_mm).max() + np.abs(np.asarray(y64)).max())
    assert np.abs(r_mv - r_mm).max() / scale < 1e-14
