"""Covariant MOGP LML val+grad per evaluation at large LN — the covariant
calibration hot step (VERDICT r2 #5: measure the covariant ceiling and close
it with the blocked engine).

Compares the two objectives behind ``calibrate_covariant_host`` at tunable
(L, N):

  'builtin' — the XLA-builtin (LN,LN) Cholesky under autodiff, one fused
              jitted value+grad program (the pre-round-3 route; its three
              (LN,LN) buffers bound the ceiling near LN~22k f32).
  'upper'   — the blocked upper-engine custom-VJP chain
              (models/gp.covariant_upper_lml), eager-paced exactly like
              production: peak = unit gram + one (Npad,Npad) carry.

Usage:  python benchmarks/covariant_valgrad.py [L] [N] [reps] [engines]
        engines: 'builtin', 'upper' or 'all' (default 'upper').
Prints one JSON line per engine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('ROMCOMMA_X64', '0')

import numpy as np


def main(L: int = 2, N: int = 8192, reps: int = 3, engines: str = 'upper',
         M: int = 10):
    import jax
    import jax.numpy as jnp
    from romcomma_tpu.models import gp
    from romcomma_tpu.models import params as P

    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M))
    Y = np.stack([np.sin((l + 1.0) * X[:, 0]) + 0.5 * X[:, 1] ** 2
                  + 0.1 * rng.standard_normal(N) for l in range(L)], axis=1)
    ls = np.full((L, M), 2.0)
    raw = P.covariant_init(np.eye(L), ls, 0.05 * np.eye(L))
    mask = P.covariant_mask()
    names = ('builtin', 'upper') if engines == 'all' else (engines,)
    x, y = jnp.asarray(X), jnp.asarray(Y)
    wd = jax.tree_util.tree_leaves(raw)[0].dtype
    x, y = x.astype(wd), y.astype(wd)
    out_all = {}
    for name in names:
        if name == 'builtin':
            objective, _ = gp._covariant_objective(raw, mask, x, y,
                                                   ls_frozen=True)
            vg = jax.jit(jax.value_and_grad(objective))
        else:
            objective, _ = gp._covariant_objective_upper(raw, mask, x, y)
            vg = jax.value_and_grad(objective)      # eager custom-VJP pacing
        t0 = time.time()
        v, g = jax.block_until_ready(vg(raw))
        compile_s = time.time() - t0
        times = []
        for _ in range(reps):
            t0 = time.time()
            v, g = jax.block_until_ready(vg(raw))
            times.append(time.time() - t0)
        out = {'engine': name, 'L': L, 'N': N, 'LN': L * N, 'M': M,
               'backend': jax.default_backend(),
               'grad_l2': [float(jnp.linalg.norm(t))
                           for t in jax.tree_util.tree_leaves(g)],
               'compile_plus_first_s': round(compile_s, 1),
               's_per_eval': round(min(times), 3), 'value': float(v)}
        print(json.dumps(out), flush=True)
        out_all[name] = out
    return out_all


if __name__ == '__main__':
    a = sys.argv[1:]
    main(*(int(v) for v in a[:3]), *a[3:4], *(int(v) for v in a[4:5]))
