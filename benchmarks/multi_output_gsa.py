"""Multi-output large-N GSA: ONE stacked interval pass for all L outputs vs
the round-2 sequential per-output loop (VERDICT r2 #4's measurement:
L=3+ at N=8192 showing <<L x the single-output time, oracle parity per
output).

The stacked route (parallel/distributed.py _sobol_indices_multi) vmaps the
factorized O(N^2 M) chunk step over outputs so every q chunk streams once
for ALL outputs — the reference re-runs its eager per-latent loop L times
(gpr/models.py:340-342).

Usage:  python benchmarks/multi_output_gsa.py [N] [M] [L] [mode]
        mode: 'all' (default) = stacked + sequential head-to-head;
              'stacked' = stacked only;
              'error_all' / 'error' = the same protocols with error=True
              (W/T standard errors through the STACKED factorized error
              sweep — gsa/factorized_errors.error_scan_stacked — vs the
              sequential per-output error loop).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('ROMCOMMA_X64', '0')

import numpy as np


def main(N: int = 8192, M: int = 30, L: int = 3, mode: str = 'all') -> dict:
    import jax
    from romcomma_tpu.parallel import distributed as dist

    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M))
    # Per-output functions with distinct leading-dim structure so each
    # output's indices differ (a structural per-output oracle).
    Y = np.stack([np.sin(X[:, 0]) + 0.5 * X[:, 1] ** 2,
                  X[:, 0] * X[:, 1] + np.sin(X[:, 2]),
                  np.cos(X[:, 1]) + 0.3 * X[:, 3] ** 2][:L], axis=-1)
    Y = Y[:, :L] + 0.1 * rng.standard_normal((N, L))

    dgp = dist.DistributedGP(N, dist.make_n_mesh())
    x_dev, y_dev = dgp.stage(X, Y)
    jax.block_until_ready((x_dev, y_dev))

    ls = np.stack([np.full(M, 2.0 + 0.2 * l) for l in range(L)])
    s2 = np.ones(L)
    noise = np.full(L, 0.05)
    kinds = ('first_order', 'total')

    # Warm protocol: the new no-error default tier makes the WARM interval
    # pass a few seconds at this N, so one-time XLA compiles (tens of
    # seconds through the tunnel) would dominate a single-pass comparison
    # and invert the verdict. Each route runs twice; the second (warm) pass
    # is the reported number, the first is recorded as *_cold_s.
    error = mode.startswith('error')
    kw = dict(kind=kinds, error=True) if error else dict(kind=kinds)
    S_of = (lambda r: r['S']) if error else (lambda r: r)

    t0 = time.time()
    stacked = dgp.sobol_indices(ls, s2, noise, x_dev, y_dev, X, **kw)
    t_stacked_cold = time.time() - t0
    t0 = time.time()
    stacked = dgp.sobol_indices(ls, s2, noise, x_dev, y_dev, X, **kw)
    t_stacked = time.time() - t0
    stacked_timings = dict(dgp.last_gsa_timings)

    out = {'bench': 'multi_output_gsa', 'N': N, 'M': M, 'L': L,
           'error': error, 'backend': jax.default_backend(),
           't_stacked_s': round(t_stacked, 1),
           't_stacked_cold_s': round(t_stacked_cold, 1),
           'stacked_timings': stacked_timings,
           'S1_per_output': [[round(S_of(stacked[l])['first_order'][m], 4)
                              for m in range(3)] for l in range(L)]}
    if mode in ('all', 'error_all'):
        def run_seq():
            return [dgp.sobol_indices(ls[l], s2[l], noise[l], x_dev,
                                      y_dev[:, l:l + 1], X, **kw)
                    for l in range(L)]
        t0 = time.time()
        seq = run_seq()
        t_seq_cold = time.time() - t0
        t0 = time.time()
        seq = run_seq()
        t_seq = time.time() - t0
        d = max(abs(S_of(stacked[l])[k][m] - S_of(seq[l])[k][m])
                for l in range(L) for k in kinds for m in range(M))
        out.update({'t_sequential_s': round(t_seq, 1),
                    't_sequential_cold_s': round(t_seq_cold, 1),
                    'speedup': round(t_seq / t_stacked, 2),
                    'max_dS_vs_sequential': float(f'{d:.3e}')})
        if error:
            dT = max(abs(stacked[l]['T'][k][m] - seq[l]['T'][k][m])
                     for l in range(L) for k in kinds for m in range(M))
            out['max_dT_vs_sequential'] = float(f'{dT:.3e}')
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    a = sys.argv[1:]
    main(*(int(x) for x in a[:3]), *a[3:4])
