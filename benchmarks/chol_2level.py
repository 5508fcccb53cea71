"""Blocked upper-Cholesky head-to-head: right-looking vs the two-level
left-looking variant (ops/blocked.cholesky_blocked_upper_2level — the TPU
look-ahead answer, VERDICT r2 #2: most trailing-update flops move into
(SB,SB)@(SB,Npad) matmuls at full MXU rate).

HBM discipline as engine_phases.py: one factor chain live at a time, fresh
gram donated into each factorization.

Usage:  python benchmarks/chol_2level.py [N] [M] [reps] [SB1,SB2,...]
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


def main(N: int = 20000, M: int = 30, reps: int = 2, supers: str = '2048,4096'):
    import functools
    import jax
    import jax.numpy as jnp
    from romcomma_tpu.parallel import distributed as dist
    from romcomma_tpu.ops import blocked

    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M))
    Y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))
    dgp = dist.DistributedGP(N, dist.make_n_mesh(1), dense_kernels=True)
    x_dev, y_dev = dgp.stage(X, Y)
    dt = x_dev.dtype
    ls = jnp.asarray(np.full(M, 2.0), dt)
    s2, nz = jnp.asarray(1.0, dt), jnp.asarray(0.05, dt)
    B = int(dist.DistributedGP.DENSE_BLOCK)
    out = {'N': N, 'M': M, 'block': B, 'backend': jax.default_backend()}

    def timed(chol):
        fn = lambda: chol(dgp._gram(x_dev, ls, s2, nz))
        U = jax.block_until_ready(fn())
        probe = float(jnp.asarray(U)[100, 100])   # hold a scalar, then drop
        best = float('inf')
        for _ in range(reps):
            del U
            t0 = time.time()
            U = jax.block_until_ready(fn())
            best = min(best, time.time() - t0)
        del U
        return best, probe

    t, p0 = timed(dgp._chol)          # right-looking production kernel
    out['right_looking_s'] = round(t, 2)
    for SB in (int(s) for s in supers.split(',')):
        chol = jax.jit(functools.partial(blocked.cholesky_blocked_upper_2level,
                                         block=B, super_block=SB),
                       donate_argnums=(0,))
        t, p = timed(chol)
        out[f'two_level_sb{SB}_s'] = round(t, 2)
        out[f'two_level_sb{SB}_match'] = bool(abs(p - p0) <= 1e-3 * abs(p0))
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    a = sys.argv[1:]
    main(*(int(v) for v in a[:3]), *a[3:4])
