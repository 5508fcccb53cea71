"""Head-to-head: the multi-device deferred engine ('cyclic2',
parallel/cyclic_deferred.py) forced onto ONE device vs the production
single-chip upper engine and the round-1 block-cyclic kernel — the
VERDICT r3 #1 'collapsed gap' measurement. On S=1 the cyclic2 collectives
are identities, so the number isolates the kernel structure (deferred
big-matmul schedule + ring pair-tile backward) from communication; a real
v5e-8 adds ICI costs on top (see BASELINE.md scaling note).

Usage: python benchmarks/cyclic2_engine.py [N] [M] [reps] [engines]
  engines: comma list of upper,cyclic2,cyclic (default all three)
Prints one JSON line: {engine: {valgrad_s, value}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('ROMCOMMA_X64', '0')

import numpy as np


def main(N: int = 20000, M: int = 30, reps: int = 3,
         engines: str = 'upper,cyclic2,cyclic'):
    import jax
    import jax.numpy as jnp
    from romcomma_tpu.parallel import distributed as dist

    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M))
    Y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))
    out = {'N': N, 'M': M, 'backend': jax.default_backend()}
    for name in engines.split(','):
        dgp = dist.DistributedGP(N, dist.make_n_mesh(1), engine=name)
        assert dgp._engine == name, (dgp._engine, name)
        x_dev, y_dev = dgp.stage(X, Y)
        dt = x_dev.dtype
        ls = jnp.asarray(np.full(M, 2.0), dt)
        s2, nz = jnp.asarray(1.0, dt), jnp.asarray(0.05, dt)

        def valgrad():
            return jax.value_and_grad(
                lambda p: dgp._lml(p[0], p[1], p[2], x_dev, y_dev)
            )((ls, s2, nz))

        t0 = time.perf_counter()
        v, g = valgrad()
        jax.block_until_ready((v, g))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            v, g = valgrad()
            jax.block_until_ready((v, g))
            times.append(time.perf_counter() - t0)
        out[name] = {'valgrad_s': round(min(times), 3),
                     'first_s': round(compile_s, 1),
                     'value': float(v),
                     'grad_l2': float(np.sqrt(sum(
                         float(jnp.sum(jnp.asarray(x) ** 2)) for x in
                         jax.tree_util.tree_leaves(g))))}
        del dgp, x_dev, y_dev
    print(json.dumps(out))


if __name__ == '__main__':
    args = sys.argv[1:]
    main(int(args[0]) if args else 20000,
         int(args[1]) if len(args) > 1 else 30,
         int(args[2]) if len(args) > 2 else 3,
         args[3] if len(args) > 3 else 'upper,cyclic2,cyclic')
