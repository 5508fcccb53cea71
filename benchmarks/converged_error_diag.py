"""Error-GSA (W/T) at the CONVERGED optimum: does the device psi solver +
'ff'-tier sweep survive the round-4 conditioning cliff? Trains N to the
reference stopping rule, then computes both-kind S AND T twice — device psi
solver (production) vs error_solver='host' (exact f64 K_cho oracle route,
feasible at N<=8192 on the 1-core host) — and prints the deltas.

Usage: python benchmarks/converged_error_diag.py [N] [M]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('ROMCOMMA_X64', '0')

import numpy as np


def main(N: int = 8192, M: int = 30) -> dict:
    import jax
    from romcomma_tpu.parallel import distributed as dist

    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M))
    Y = (np.sin(X[:, :1]) + 0.5 * X[:, 1:2] ** 2
         + 0.1 * rng.standard_normal((N, 1)))

    dgp = dist.DistributedGP(N, dist.make_n_mesh(), dense_kernels=True)
    x_dev, y_dev = dgp.stage(X, Y)
    (ls, s2, noise), lml, iters = dgp.calibrate(
        X, Y, ls0=np.full(M, 2.0), s2_0=1.0, noise0=0.05, maxiter=5000)
    print(f'converged: iters={int(np.asarray(iters))} '
          f'noise={float(np.asarray(noise)):.6f} '
          f'cond~{N * float(np.asarray(s2)) / float(np.asarray(noise)):.2e}',
          file=sys.stderr, flush=True)

    t0 = time.time()
    dev = dgp.sobol_indices(ls, s2, noise, x_dev, y_dev, X,
                            kind=('first_order', 'total'), error=True,
                            is_T_partial=False, error_solver='device')
    t_dev = time.time() - t0
    t0 = time.time()
    host = dgp.sobol_indices(ls, s2, noise, x_dev, y_dev, X,
                             kind=('first_order', 'total'), error=True,
                             is_T_partial=False, error_solver='host')
    t_host = time.time() - t0
    dS = max(abs(dev['S'][k][m] - host['S'][k][m])
             for k in dev['S'] for m in dev['S'][k])
    dT = max(abs(dev['T'][k][m] - host['T'][k][m])
             for k in dev['T'] for m in dev['T'][k])
    out = {'N': N, 'M': M, 'iters': int(np.asarray(iters)),
           'noise': float(np.asarray(noise)),
           'cond_est': N * float(np.asarray(s2)) / float(np.asarray(noise)),
           'device_s': round(t_dev, 1), 'host_s': round(t_host, 1),
           'dS_device_vs_host': dS, 'dT_device_vs_host': dT,
           'S1_first3': [round(dev['S']['first_order'][m], 5)
                         for m in range(3)],
           'T1_first3': [round(dev['T']['first_order'][m], 6)
                         for m in range(3)]}
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
