"""Device-mesh helpers: sharded multi-chip execution via jax.sharding + pjit.

The reference has no distribution facility at all (SURVEY.md §2.4) — its only
device concept is a tf.device string. Here the scaling axes native to this
framework are:

  - ``l``: the output axis — L independent GPs are embarrassingly parallel
    (the reference loops them in Python, gpr/models.py:340-342); sharding the
    vmapped batch over ``l`` is the tensor-parallel analog.
  - ``n``: the training-row axis — gram tiles need an all-gather of X row
    blocks over ICI; the Cholesky runs on the gathered operand (a ring/
    distributed panel factorization is the planned upgrade).

``make_mesh`` builds a 2-D ('l','n') mesh; ``training_step_sharded`` jits one
full LML value-and-grad step with these shardings so XLA inserts the
collectives.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from romcomma_tpu.models import gp
from romcomma_tpu.models.params import VariantParams


def make_mesh(n_devices: Optional[int] = None, l_size: Optional[int] = None) -> Mesh:
    """A ('l','n') mesh over the first n_devices devices. ``l_size`` divides
    n_devices; defaults to the largest power-of-two factor <= sqrt(n)."""
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    if l_size is None:
        l_size = 1
        while l_size * 2 <= math.isqrt(n) and n % (l_size * 2) == 0:
            l_size *= 2
    if n % l_size != 0:
        raise ValueError(f'l_size={l_size} does not divide n_devices={n}.')
    mesh_devices = np.asarray(devices).reshape(l_size, n // l_size)
    return Mesh(mesh_devices, axis_names=('l', 'n'))


def variant_shardings(mesh: Mesh):
    """(params, x, y) shardings for the variant training step: parameters
    sharded over outputs ('l'), data rows over ('n')."""
    p = VariantParams(raw_variance=NamedSharding(mesh, P('l')),
                      raw_lengthscales=NamedSharding(mesh, P('l', None)),
                      raw_noise=NamedSharding(mesh, P('l')))
    x = NamedSharding(mesh, P('n', None))
    y = NamedSharding(mesh, P('n', 'l'))
    return p, x, y


def training_step_sharded(mesh: Mesh):
    """One jitted full training step (value and grad of the summed variant
    LML) with l/n shardings — XLA inserts the ICI collectives (all-gather of
    X row blocks for the gram; psum of the LML reduction)."""
    p_shard, x_shard, y_shard = variant_shardings(mesh)

    def step(raw: VariantParams, x: jnp.ndarray, y: jnp.ndarray):
        loss, grads = jax.value_and_grad(
            lambda p: -jnp.sum(gp.lml_variant(p, x, y)))(raw)
        return loss, grads

    return jax.jit(step, in_shardings=(p_shard, x_shard, y_shard))


def make_fold_mesh(n_devices: Optional[int] = None) -> Mesh:
    """A 1-D ('k',) mesh for fold-parallel execution — the data-parallel
    analog of this framework (SURVEY §2.4: per-fold embarrassing parallelism,
    unexploited by the reference's Python loop, user/run.py:60-61)."""
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devices), axis_names=('k',))


def calibrate_folds_sharded(mesh: Mesh, maxiter: int = 5000):
    """Jitted fold-sharded variant calibration over a ('k',) mesh: K folds'
    independent L-BFGS descents run concurrently, one (or more) folds per
    device, zero collectives (embarrassingly parallel by construction).

    Returns fn(raws, mask, xs (K,N,M), ys (K,N,L)) -> (raw_opt, lml (K,L),
    iters (K,L)) with everything sharded over the fold axis.
    """
    from romcomma_tpu.models import gp
    from jax.sharding import NamedSharding

    fold = NamedSharding(mesh, P('k'))
    p_shard = VariantParams(raw_variance=fold, raw_lengthscales=fold, raw_noise=fold)
    rep = NamedSharding(mesh, P())
    m_shard = VariantParams(rep, rep, rep)

    def run(raws, mask, xs, ys):
        return gp.calibrate_variant_folds(raws, mask, xs, ys, maxiter=maxiter)

    return jax.jit(run, in_shardings=(p_shard, m_shard, fold, fold))


def shard_data(mesh: Mesh, raw: VariantParams, x: jnp.ndarray, y: jnp.ndarray):
    """Place (params, x, y) onto the mesh with the variant shardings."""
    p_shard, x_shard, y_shard = variant_shardings(mesh)
    raw = jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, s), raw,
        VariantParams(p_shard.raw_variance, p_shard.raw_lengthscales, p_shard.raw_noise))
    return raw, jax.device_put(x, x_shard), jax.device_put(y, y_shard)
