"""Posterior predict (mean + variance) wall-clock at scale — the one
headline phase never measured at N=50000 (VERDICT r4 #8). Uses the
production engine route (DistributedGP.predict: staged gram factor, Ks
strip, fwd solve) at fixed plausible hyperparameters; reports cold
(compile + factor) and warm (re-predict at new test points, factor
resident) wall-clocks.

Usage: python benchmarks/predict_scale.py [N] [M] [n_test]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('ROMCOMMA_X64', '0')

import numpy as np


def main(N: int = 50000, M: int = 30, n_test: int = 1024) -> dict:
    # n_test=4096 at N=50000 OOM'd the 16 GB chip in the wide triangular
    # solve (factor 10.5 GB + several (Npad, o) solve buffers); 1024 fits.
    import jax
    from romcomma_tpu.parallel import distributed as dist

    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M))
    Y = (np.sin(X[:, :1]) + 0.5 * X[:, 1:2] ** 2
         + 0.1 * rng.standard_normal((N, 1)))
    Xs = rng.standard_normal((n_test, M))
    dgp = dist.DistributedGP(N, dist.make_n_mesh(), dense_kernels=True)
    x_dev, y_dev = dgp.stage(X, Y)
    ls, s2, nz = np.full(M, 2.0), 1.0, 0.05

    t0 = time.time()
    mean, var = dgp.predict(ls, s2, nz, x_dev, y_dev, Xs)
    jax.block_until_ready((mean, var))
    cold = time.time() - t0

    t0 = time.time()
    mean2, var2 = dgp.predict(ls, s2, nz, x_dev, y_dev,
                              rng.standard_normal((n_test, M)))
    jax.block_until_ready((mean2, var2))
    warm = time.time() - t0

    out = {'N': N, 'M': M, 'n_test': n_test, 'engine': dgp._engine,
           'cold_s': round(cold, 2), 'warm_s': round(warm, 2),
           'mean_rms': round(float(np.sqrt(np.mean(np.square(
               np.asarray(mean))))), 4)}
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
