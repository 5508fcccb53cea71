"""Wall-clock of the factorized all-interval GSA pass on the current
backend, comparing interval precisions: pure f64, mixed (f64 exponents +
f32 two-float-split exp), and plain f32 (gsa_dtype) — with |dS| vs the f64
reference. Skips training: hyperparameters are fixed at plausible values.

Usage:  python benchmarks/gsa_intervals.py [N] [M] [modes]
        modes: comma list of f64,mixed,ff,f32,default (default 'f64,mixed');
        'ff' is the float-float (~3e-11) tier (gsa.base.ff_exp_nonpos);
        'default' exercises the backend policy (accelerators: f32 planes
        + f64 quadform accumulation)
Prints one JSON line per mode.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('ROMCOMMA_X64', '0')

import numpy as np


def main(N: int = 20000, M: int = 30, modes: str = 'f64,mixed'):
    import jax
    from romcomma_tpu.parallel import distributed as dist

    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M))
    Y = (np.sin(X[:, :1]) + 0.5 * X[:, 1:2] ** 2
         + 0.1 * rng.standard_normal((N, 1)))
    dgp = dist.DistributedGP(N, dist.make_n_mesh(1),
                             dense_kernels=jax.default_backend() != 'cpu')
    x_dev, y_dev = dgp.stage(X, Y)
    ls = np.full(M, 2.0)
    s2, nz = 1.0, 0.05

    rows = []
    for mode in modes.split(','):
        # gsa_dtype=float64 is REQUIRED to force f64 planes: with
        # gsa_dtype=None the accelerator policy in sobol_indices engages
        # the f32-planes + f64-accumulation tier regardless of
        # intervals_mixed (an earlier revision of this table relied on
        # gsa_dtype=None defaulting to f64 — on accelerators it no longer
        # does, and the three "f64/mixed/default" modes silently ran the
        # SAME tier, agreeing to 0.0 exactly).
        kw = ({'gsa_dtype': np.float64, 'intervals_mixed': False}
              if mode == 'f64' else
              {'gsa_dtype': np.float64, 'intervals_mixed': True}
              if mode == 'mixed' else
              {'gsa_dtype': np.float64, 'intervals_mixed': 'ff'}
              if mode == 'ff' else
              {'gsa_dtype': np.float64, 'intervals_mixed': 'df'}
              if mode == 'df' else
              {} if mode == 'default' else   # backend policy (accelerators:
                                             # f32 planes + f64 accumulation)
              {'gsa_dtype': np.float32, 'intervals_mixed': False})
        t0 = time.time()
        S = dgp.sobol_indices(ls, s2, nz, x_dev, y_dev, X,
                              kind=('first_order', 'total'), **kw)
        wall = time.time() - t0
        flat = np.array([v for k in S for v in S[k].values()])
        rows.append((mode, wall, dict(dgp.last_gsa_timings or {}), S, flat))
    # diff after ALL modes ran, so the f64 reference is found regardless of
    # its position in the mode list; without an f64 run, diff against the
    # first (most precise requested) mode instead
    ref_mode, ref = next(((m, flat) for m, _, _, _, flat in rows
                          if m == 'f64'), (rows[0][0], rows[0][4]))
    for mode, wall, phases, S, flat in rows:
        out = {'mode': mode, 'N': N, 'M': M,
               'backend': jax.default_backend(),
               'gsa_s': round(wall, 1),
               'phases': phases,
               'S1_first3': [round(float(S['first_order'][m]), 6)
                             for m in range(3)],
               f'max_abs_dS_vs_{ref_mode}': float(np.abs(flat - ref).max())}
        print(json.dumps(out), flush=True)


if __name__ == '__main__':
    a = sys.argv[1:]
    main(*(int(x) for x in a[:2]), *a[2:3])
