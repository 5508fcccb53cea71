"""MXU-blocked Cholesky/TRSM vs jnp.linalg oracles — values and gradients,
including non-multiple-of-block sizes (padding path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from romcomma_tpu.ops import blocked


def _spd(N, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(N, N))
    return jnp.asarray(x @ x.T + N * np.eye(N), dtype=dtype)


@pytest.mark.parametrize('N,B', [(64, 16), (100, 32), (96, 32)])
def test_cholesky_blocked_matches_oracle(N, B):
    a = _spd(N)
    got = blocked.cholesky_blocked(a, B)
    want = jnp.linalg.cholesky(a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize('trans', [False, True])
@pytest.mark.parametrize('N,R,B', [(64, 7, 16), (90, 33, 32)])
def test_trsm_blocked_matches_oracle(N, R, B, trans):
    a = _spd(N, seed=1)
    L = jnp.linalg.cholesky(a)
    y = jnp.asarray(np.random.default_rng(2).normal(size=(N, R)))
    got = blocked.trsm_blocked(L, y, trans=trans, block=B)
    want = jax.scipy.linalg.solve_triangular(L.T if trans else L, y,
                                             lower=not trans)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-9)


def test_cholesky_blocked_gradient_matches_oracle():
    a = _spd(48, seed=3)

    def f_blocked(a):
        L = blocked.cholesky_blocked(0.5 * (a + a.T), 16)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(jnp.sin(L))

    def f_oracle(a):
        L = jnp.linalg.cholesky(0.5 * (a + a.T))
        return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(jnp.sin(L))

    g1 = jax.grad(f_blocked)(a)
    g2 = jax.grad(f_oracle)(a)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8, atol=1e-8)


def test_lml_gradient_through_blocked_cholesky():
    """End-to-end: GP LML gradient using blocked kernels == jnp oracle."""
    rng = np.random.default_rng(4)
    N, M = 70, 3
    x = jnp.asarray(rng.normal(size=(N, M)))
    y = jnp.asarray(rng.normal(size=(N, 1)))
    from romcomma_tpu.ops.gram import rbf_gram

    def lml(ls, chol_fn, solve_fn):
        K = rbf_gram(x, x, ls, jnp.asarray(1.3)) + 0.05 * jnp.eye(N)
        L = chol_fn(K)
        z = solve_fn(L, y)
        return -0.5 * jnp.sum(z * z) - jnp.sum(jnp.log(jnp.diagonal(L)))

    ls0 = jnp.asarray([0.9, 1.2, 1.5])
    f1 = lambda ls: lml(ls, lambda K: blocked.cholesky_blocked(K, 32),
                        lambda L, y: blocked.trsm_blocked(L, y, block=32))
    f2 = lambda ls: lml(ls, jnp.linalg.cholesky,
                        lambda L, y: jax.scipy.linalg.solve_triangular(L, y, lower=True))
    np.testing.assert_allclose(float(f1(ls0)), float(f2(ls0)), rtol=1e-10)
    g1 = jax.grad(f1)(ls0)
    g2 = jax.grad(f2)(ls0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8)


@pytest.mark.parametrize('N,B', [(64, 16), (100, 32)])
def test_mvn_lml_blocked_value_and_grad(N, B):
    """mvn_lml_blocked (custom-VJP closed-form gradient) matches the
    autodiff-through-builtin-Cholesky oracle, value and dK gradient."""
    from romcomma_tpu.ops.linalg import mvn_logpdf, cholesky
    K = _spd(N, seed=5)
    y = jnp.asarray(np.random.default_rng(6).normal(size=(N, 1)))

    def oracle(K):
        return jnp.sum(mvn_logpdf(y, jnp.zeros_like(y), cholesky(K)))

    def oracle_y(K, y):
        return jnp.sum(mvn_logpdf(y, jnp.zeros_like(y), cholesky(K)))

    got_v, got_g = jax.value_and_grad(lambda K: blocked.mvn_lml_blocked(K, y, B))(K)
    want_v, want_g = jax.value_and_grad(oracle)(K)
    np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-12)
    # The oracle's autodiff gradient is asymmetric (lower-triangle
    # convention); compare symmetrized cotangents, which is what a
    # symmetric-in-K objective consumes.
    sym = lambda g: np.asarray(g + g.T) / 2
    np.testing.assert_allclose(sym(got_g), sym(want_g), rtol=1e-8, atol=1e-10)
    # and the y-cotangent: dLML/dy = -K^{-1} y
    got_gy = jax.grad(lambda y: blocked.mvn_lml_blocked(K, y, B))(y)
    want_gy = jax.grad(lambda y: oracle_y(K, y))(y)
    np.testing.assert_allclose(np.asarray(got_gy), np.asarray(want_gy),
                               rtol=1e-8, atol=1e-10)


def test_mvn_lml_blocked_through_gram():
    """End-to-end hyperparameter gradient through rbf_gram + mvn_lml_blocked
    equals the fused builtin objective's gradient (the dense-direct
    calibration hot path)."""
    from romcomma_tpu.ops.gram import rbf_gram
    from romcomma_tpu.ops.linalg import add_diag, mvn_logpdf, cholesky
    rng = np.random.default_rng(7)
    N, M = 80, 4
    x = jnp.asarray(rng.normal(size=(N, M)))
    y = jnp.asarray(rng.normal(size=(N, 1)))
    params = (jnp.asarray(np.full(M, 1.5)), jnp.asarray(0.8), jnp.asarray(0.05))

    def blocked_obj(p):
        ls, s2, noise = p
        K = add_diag(rbf_gram(x, x, ls, s2), noise)
        return -blocked.mvn_lml_blocked(K, y, 32)

    def builtin_obj(p):
        ls, s2, noise = p
        K = add_diag(rbf_gram(x, x, ls, s2), noise)
        return -jnp.sum(mvn_logpdf(y, jnp.zeros_like(y), cholesky(K)))

    gv, gg = jax.value_and_grad(blocked_obj)(params)
    wv, wg = jax.value_and_grad(builtin_obj)(params)
    np.testing.assert_allclose(float(gv), float(wv), rtol=1e-12)
    for a, b in zip(jax.tree_util.tree_leaves(gg), jax.tree_util.tree_leaves(wg)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize('N,B', [(64, 16), (100, 32), (96, 32), (200, 64)])
def test_cholesky_blocked_upper_matches_oracle(N, B):
    """U = L^T to oracle precision, exactly upper-triangular (the padded
    intermediate's garbage strict-lower region must be zeroed)."""
    a = _spd(N, seed=3)
    U = np.asarray(blocked.cholesky_blocked_upper(a, B))
    want = np.asarray(jnp.linalg.cholesky(a)).T
    np.testing.assert_allclose(U, want, rtol=1e-9, atol=1e-9)
    assert np.abs(np.triu(U) - U).max() == 0.0


@pytest.mark.parametrize('N,R,B', [(64, 7, 16), (90, 33, 32), (128, 1, 32)])
def test_upper_solves_match_oracle(N, R, B):
    """solve_upper_t (U^T z = y) then solve_upper (U a = z) reproduce the
    full K a = y solve — the row-major engine's fwd/bwd contract."""
    rng = np.random.default_rng(4)
    a = _spd(N, seed=4)
    y = jnp.asarray(rng.normal(size=(N, R)))
    U = blocked.cholesky_blocked_upper(a, B)
    z = blocked.solve_upper_t(U, y, B)
    np.testing.assert_allclose(np.asarray(U).T @ np.asarray(z), np.asarray(y),
                               rtol=1e-9, atol=1e-9)
    alpha = blocked.solve_upper(U, z, B)
    np.testing.assert_allclose(np.asarray(a) @ np.asarray(alpha), np.asarray(y),
                               rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize('N,B', [(64, 16), (100, 32), (96, 32), (200, 64)])
def test_invert_upper_blocked_matches_oracle(N, B):
    """V = U^{-1} (upper) to oracle precision, exactly upper-triangular, and
    V V^T = K^{-1} — the streaming-v2 gradient's strip operand contract."""
    a = _spd(N, seed=5)
    U = blocked.cholesky_blocked_upper(a, B)
    V = np.asarray(blocked.invert_upper_blocked(U, B))
    want = np.asarray(jnp.linalg.inv(np.asarray(U)))
    np.testing.assert_allclose(V, want, rtol=1e-8, atol=1e-9)
    assert np.abs(np.triu(V) - V).max() == 0.0
    np.testing.assert_allclose(V @ V.T, np.linalg.inv(np.asarray(a)),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize('N,B,SB', [(64, 16, 32), (200, 32, 96), (256, 32, 300),
                                    (200, 64, 64)])
def test_two_level_kernels_match_oracle(N, B, SB):
    """Two-level Cholesky and two-level inverse (super-panel Schur form)
    against the dense oracles — SB spanning: dividing Npad, snapped down
    (non-dividing), clamped above Npad, and degenerate SB == B
    (right-looking). Also exercises the trailing-update precision knob
    (HIGH == HIGHEST on CPU, so results must be identical)."""
    from jax import lax
    a = _spd(N, seed=7)
    want_U = np.asarray(jnp.linalg.cholesky(a).T)
    for prec in (None, lax.Precision.HIGH):
        U = np.asarray(blocked.cholesky_blocked_upper_2level(
            a, block=B, super_block=SB, precision=prec))
        np.testing.assert_allclose(U, np.triu(want_U), rtol=1e-9, atol=1e-9)
    V = np.asarray(blocked.invert_upper_blocked_2level(
        jnp.asarray(U), block=B, super_block=SB))
    np.testing.assert_allclose(V, np.triu(np.linalg.inv(U)),
                               rtol=1e-8, atol=1e-9)
    assert np.abs(np.triu(V) - V).max() == 0.0
    np.testing.assert_allclose(V @ V.T, np.linalg.inv(np.asarray(a)),
                               rtol=1e-6, atol=1e-8)


def test_multi_tile_and_segmented_paths(monkeypatch):
    """Force small column tiles (C = B) so the tile loops run MANY tiles
    and the triangular inverse's lax.switch width segments take every
    branch — at default tiling the CPU-sized tests always get n_tiles = 1
    (C == Npad), leaving the N=50k code path unexercised."""
    monkeypatch.setattr(blocked, '_col_tile', lambda NB, B, target=4096: B)
    N, B = 256, 32                       # n_tiles = 8, 4 width segments
    a = _spd(N, seed=7)
    U = blocked.cholesky_blocked_upper(a, B)
    want_U = np.asarray(jnp.linalg.cholesky(a)).T
    np.testing.assert_allclose(np.asarray(U), want_U, rtol=1e-9, atol=1e-9)
    V = np.asarray(blocked.invert_upper_blocked(U, B))
    np.testing.assert_allclose(V, np.linalg.inv(np.asarray(U)),
                               rtol=1e-8, atol=1e-9)
    assert np.abs(np.triu(V) - V).max() == 0.0
    # and a padded shape (clamped last block) through the same forced tiling
    N2 = 250
    a2 = _spd(N2, seed=8)
    U2 = blocked.cholesky_blocked_upper(a2, B)
    V2 = np.asarray(blocked.invert_upper_blocked(U2, B))
    np.testing.assert_allclose(V2, np.linalg.inv(np.asarray(U2)),
                               rtol=1e-8, atol=1e-9)


def test_col_tile_exact_divisor():
    """_col_tile returns a multiple of B that divides Npad exactly (no
    clamped/overlapping last tile is ever generated)."""
    for NB, B in ((98, 512), (40, 512), (97, 512), (13, 256), (1, 128)):
        C = blocked._col_tile(NB, B)
        assert C % B == 0 and (NB * B) % C == 0
        assert C <= max(B, 4096)
