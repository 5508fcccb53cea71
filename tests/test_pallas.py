"""Pallas gram kernel vs the jnp oracle (values and gradients), run in
interpreter mode so the suite works on the CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from romcomma_tpu.ops import gram, pallas_kernels


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas_kernels, '_INTERPRET', True)
    yield


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       dtype=jnp.float32)


def test_unit_gram_matches_oracle():
    u, v = _rand((37, 5), 1), _rand((61, 5), 2)
    got = pallas_kernels.unit_gram(u, v)
    want = jnp.exp(-0.5 * gram._sqdist(u, v))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_rbf_gram_pallas_matches_oracle():
    x1, x2 = _rand((50, 7), 3), _rand((30, 7), 4)
    ls = jnp.asarray(np.random.default_rng(5).uniform(0.5, 2.0, 7), jnp.float32)
    s2 = jnp.float32(1.7)
    got = pallas_kernels.rbf_gram_pallas(x1, x2, ls, s2)
    u, v = x1 / ls, x2 / ls
    want = s2 * jnp.exp(-0.5 * gram._sqdist(u, v))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_rbf_gram_pallas_gradients_match_oracle():
    x1, x2 = _rand((20, 4), 6), _rand((25, 4), 7)
    ls = jnp.asarray([0.8, 1.1, 1.4, 0.6], jnp.float32)
    s2 = jnp.float32(2.3)

    def loss_pallas(x1, x2, ls, s2):
        k = pallas_kernels.rbf_gram_pallas(x1, x2, ls, s2)
        return jnp.sum(jnp.sin(k))

    def loss_oracle(x1, x2, ls, s2):
        k = s2 * jnp.exp(-0.5 * gram._sqdist(x1 / ls, x2 / ls))
        return jnp.sum(jnp.sin(k))

    got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x1, x2, ls, s2)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(x1, x2, ls, s2)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=5e-5, atol=5e-5)


def test_variant_gram_vmap():
    x = _rand((18, 3), 8)
    ls = jnp.asarray(np.random.default_rng(9).uniform(0.5, 2.0, (2, 3)), jnp.float32)
    s2 = jnp.asarray([1.0, 2.0], jnp.float32)
    got = pallas_kernels.rbf_gram_variant_pallas(x, x, ls, s2)
    want = jnp.stack([s2[l] * jnp.exp(-0.5 * gram._sqdist(x / ls[l], x / ls[l]))
                      for l in range(2)])
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)
    # symmetric PSD-ish sanity
    np.testing.assert_allclose(got, jnp.swapaxes(got, 1, 2), rtol=1e-6, atol=1e-6)


def test_covariant_gram_matches_oracle():
    x = _rand((12, 3), 10)
    ls = jnp.asarray(np.random.default_rng(11).uniform(0.5, 2.0, (2, 3)), jnp.float32)
    F = jnp.asarray([[2.0, 0.4], [0.4, 1.0]], jnp.float32)
    got = pallas_kernels.rbf_gram_covariant_pallas(x, x, ls, F)
    L, N, M = 2, 12, 3
    u = (np.asarray(x)[None, :, :] / np.asarray(ls)[:, None, :]).reshape(L * N, M)
    want = (np.asarray(F)[:, None, :, None]
            * np.exp(-0.5 * np.asarray(gram._sqdist(jnp.asarray(u), jnp.asarray(u)))).reshape(L, N, L, N))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_dispatch_routes_to_pallas_when_forced():
    # With _INTERPRET=True, available() is True, so f32 inputs route to Pallas.
    x = _rand((9, 2), 12)
    ls = jnp.ones((2,), jnp.float32)
    out = gram.rbf_gram(x, x, ls, jnp.float32(1.0))
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.diagonal(out), 1.0, rtol=1e-6)
    # f64 inputs stay on the jnp path (no error, f64 result).
    x64 = x.astype(jnp.float64)
    out64 = gram.rbf_gram(x64, x64, jnp.ones(2), 1.0)
    assert out64.dtype == jnp.float64


def test_covariant_unit_gram_pallas_route_matches_oracle():
    """rbf_gram_covariant_unit routes through the fused Pallas kernel on
    accelerator backends (the jnp thin-matmul build materializes an
    (8,LN,LN) HLO temp on TPU — a compile-time OOM at LN~32k)."""
    x = _rand((23, 6), 11)
    ls = jnp.asarray(np.random.default_rng(12).uniform(0.5, 2.0, (3, 6)),
                     jnp.float32)
    L, N = 3, 23
    u = (x[None, :, :] / ls[:, None, :]).reshape(L * N, 6)
    want = jnp.exp(-0.5 * gram._sqdist(u, u)).reshape(L, N, L, N)
    got = gram.rbf_gram_covariant_unit(x, ls)   # _INTERPRET forces the route
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)


def test_covariant_upper_lml_pallas_unit_build_matches_builtin():
    """covariant_upper_lml's padded unit-gram build takes the Pallas route
    under interpret mode and the custom-VJP LML still matches the builtin
    covariant objective (value and F/noise gradients)."""
    from romcomma_tpu.models import gp
    from romcomma_tpu.models import params as P

    rng = np.random.default_rng(13)
    L, N, M = 2, 45, 4
    X = rng.standard_normal((N, M))
    Y = np.stack([np.sin((l + 1.0) * X[:, 0]) for l in range(L)], axis=1)
    raw = P.covariant_init(np.eye(L), np.full((L, M), 1.5), 0.05 * np.eye(L))
    mask = P.covariant_mask()
    x = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(Y, jnp.float32)
    obj_up, _ = gp._covariant_objective_upper(raw, mask, x, y, block=128)
    obj_bi, _ = gp._covariant_objective(
        jax.tree_util.tree_map(lambda t: t.astype(jnp.float32), raw),
        mask, x, y, ls_frozen=True)
    raw32 = jax.tree_util.tree_map(lambda t: t.astype(jnp.float32), raw)
    v_up, g_up = jax.value_and_grad(obj_up)(raw32)
    v_bi, g_bi = jax.value_and_grad(obj_bi)(raw32)
    np.testing.assert_allclose(float(v_up), float(v_bi), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_up),
                    jax.tree_util.tree_leaves(g_bi)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
