"""Triangular-inverse head-to-head: the production segment-narrowed
row-sweep (ops/blocked.invert_upper_blocked) vs the two-level super-panel
Schur variant (invert_upper_blocked_2level) across SB and matmul precision.

The factor is built once by the production Cholesky; each inverse candidate
gets a fresh copy donated in (one factor + one inverse resident at a time —
at N=50k that is 2 x 10 GB, the single-chip budget, so no cross-candidate
accuracy diff is computed there; pass N<=20000 for the diff probe).

Usage:  python benchmarks/inv_2level.py [N] [M] [reps] [spec1,spec2,...]
  spec := SB:prec   with prec in {highest, high}
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


def main(N: int = 20000, M: int = 30, reps: int = 2,
         specs: str = '3584:high,7168:high'):
    import functools
    import jax
    import jax.numpy as jnp
    from jax import lax
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
    probe_diff = N <= 20000
    r0, R = 1024, 256

    def fresh_U():
        # The factor is DONATED into each inverse (the engine's real usage —
        # in-place inversion keeps peak HBM at one (Npad,Npad) buffer, the
        # whole point at N=50k), so each run rebuilds it.
        return jax.block_until_ready(dgp._chol(dgp._gram(x_dev, ls, s2, nz)))

    def timed(inv, key, ref_strip=None):
        V = jax.block_until_ready(inv(fresh_U()))
        strip = np.asarray(V[r0:r0 + R]) if probe_diff else None
        if ref_strip is not None and strip is not None:
            out[f'{key}_strip_abs_diff'] = float(np.abs(strip - ref_strip).max())
        best = float('inf')
        for _ in range(reps):
            del V
            U = fresh_U()
            t0 = time.time()
            V = jax.block_until_ready(inv(U))
            best = min(best, time.time() - t0)
        del V
        out[f'{key}_s'] = round(best, 3)
        return strip

    ref = timed(dgp._inv, 'production')
    PREC = {'highest': lax.Precision.HIGHEST, 'high': lax.Precision.HIGH}
    for spec in specs.split(','):
        sb_s, prec = spec.split(':')
        inv = jax.jit(functools.partial(blocked.invert_upper_blocked_2level,
                                        block=B, super_block=int(sb_s),
                                        precision=PREC[prec]),
                      donate_argnums=(0,))
        timed(inv, f'sb{sb_s}_{prec}', ref_strip=ref)
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    a = sys.argv[1:]
    main(*(int(v) for v in a[:3]), *a[3:4])
