"""Fold-parallel calibration: the batched/sharded paths match the per-fold
loop exactly (same math, same stopping), on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from romcomma_tpu.models import gp
from romcomma_tpu.models.params import variant_init, variant_mask
from romcomma_tpu.parallel import mesh as pmesh


def _folds(K=4, N=40, M=3, L=2, seed=0):
    rng = np.random.default_rng(seed)
    xs = rng.uniform(-1, 1, (K, N, M))
    ys = np.stack([np.sin(2 * xs[..., 0]) + 0.1 * rng.normal(size=(K, N)),
                   xs[..., 1] ** 2 + 0.1 * rng.normal(size=(K, N))], axis=-1)[..., :L]
    raws = [variant_init(np.full(L, 1.0), np.full((L, M), 1.0), np.full(L, 0.1))
            for _ in range(K)]
    raws = jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *raws)
    return raws, jnp.asarray(xs), jnp.asarray(ys)


def test_batched_folds_match_sequential():
    raws, xs, ys = _folds()
    mask = variant_mask()
    batched = gp.calibrate_variant_folds(raws, mask, xs, ys, maxiter=40)
    for k in range(xs.shape[0]):
        raw_k = jax.tree_util.tree_map(lambda leaf: leaf[k], raws)
        single = gp.calibrate_variant(raw_k, mask, xs[k], ys[k], maxiter=40)
        # vmap changes fusion/scheduling, so the descent trajectories agree
        # only to optimization-endpoint precision, not bit-for-bit.
        np.testing.assert_allclose(np.asarray(batched[1][k]), np.asarray(single[1]),
                                   rtol=1e-5, atol=1e-5)       # lml
        for bleaf, sleaf in zip(batched[0], single[0]):
            np.testing.assert_allclose(np.asarray(bleaf[k]), np.asarray(sleaf),
                                       rtol=1e-3, atol=1e-3)   # params


def test_fold_sharded_matches_batched():
    K = len(jax.devices())
    raws, xs, ys = _folds(K=K)
    mask = variant_mask()
    mesh = pmesh.make_fold_mesh()
    step = pmesh.calibrate_folds_sharded(mesh, maxiter=40)
    sharded = step(raws, mask, xs, ys)
    batched = gp.calibrate_variant_folds(raws, mask, xs, ys, maxiter=40)
    np.testing.assert_allclose(np.asarray(sharded[1]), np.asarray(batched[1]),
                               rtol=1e-5, atol=1e-5)
    # results really are sharded over the fold axis
    assert 'k' in str(sharded[1].sharding.spec)
