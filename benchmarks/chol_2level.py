"""Blocked upper-Cholesky tuning sweep: production kernel vs two-level
left-looking variants (ops/blocked.cholesky_blocked_upper_2level — the TPU
look-ahead answer, VERDICT r2 #2: most trailing-update flops move into
(SB,SB)@(SB,Npad) matmuls at full MXU rate) across inner block width B,
super-panel SB and trailing-update matmul precision.

Each config gets a factor-quality probe: one 256-row strip of U^T U is
recomputed in f64 on device and compared against the exact f64 gram rows
(same masking as the engine's _residual_f64), so a bf16x3 (HIGH) trailing
update's factor error is measured directly, not inferred from one entry.

HBM discipline as engine_phases.py: one factor chain live at a time, fresh
gram donated into each factorization.

Usage:  python benchmarks/chol_2level.py [N] [M] [reps] [spec1,spec2,...]
  spec := SB | B:SB | B:SB:prec   with prec in {highest, high}
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
         specs: str = '2048,4096'):
    import functools
    import jax
    import jax.numpy as jnp
    from jax import lax
    from romcomma_tpu.parallel import distributed as dist
    from romcomma_tpu.ops import blocked
    from romcomma_tpu.ops.gram import rbf_gram

    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M))
    Y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))
    dgp = dist.DistributedGP(N, dist.make_n_mesh(1), dense_kernels=True)
    x_dev, y_dev = dgp.stage(X, Y)
    dt = x_dev.dtype
    ls = jnp.asarray(np.full(M, 2.0), dt)
    s2, nz = jnp.asarray(1.0, dt), jnp.asarray(0.05, dt)
    B0 = int(dist.DistributedGP.DENSE_BLOCK)
    out = {'N': N, 'M': M, 'backend': jax.default_backend()}
    pl_ = dgp.plan
    Npad = pl_.Npad
    real = jnp.asarray(pl_.dtype_rows_mask)
    r0, R = 1024, 256                          # probed strip rows (stored)

    @jax.jit
    def strip_err(U):
        """max |(U^T U) - K|_f64 over rows r0:r0+R (engine masking).
        Chunked so the f64 image of U is never materialized (20 GB at
        N=50k); each 256-row slab is upcast, contracted, and dropped."""
        f64 = jnp.float64
        C = 256                                  # Npad is a multiple of 256

        def body(i, acc):
            rows = jnp.asarray(
                lax.dynamic_slice(U, (i * C, 0), (C, Npad)), f64)
            return acc + jnp.matmul(rows[:, r0:r0 + R].T, rows,
                                    precision=lax.Precision.HIGHEST)

        strip = lax.fori_loop(0, Npad // C, body,
                              jnp.zeros((R, Npad), f64))     # (R, Npad)
        x64 = jnp.asarray(x_dev, f64)
        Krow = rbf_gram(x64[r0:r0 + R], x64, jnp.asarray(ls, f64),
                        jnp.asarray(s2, f64))
        rr = real[r0:r0 + R]
        Krow = (Krow * rr[:, None] * real[None, :]
                + (jnp.arange(Npad)[None, :]
                   == (r0 + jnp.arange(R))[:, None])
                * jnp.where(rr, jnp.asarray(nz, f64), 1.0)[:, None])
        return jnp.max(jnp.abs(strip - Krow))

    def timed(chol, key):
        fn = lambda: chol(dgp._gram(x_dev, ls, s2, nz))
        U = jax.block_until_ready(fn())
        out[f'{key}_strip_abs_err'] = float(strip_err(U))
        best = float('inf')
        for _ in range(reps):
            del U
            t0 = time.time()
            U = jax.block_until_ready(fn())
            best = min(best, time.time() - t0)
        del U
        out[f'{key}_s'] = round(best, 3)

    timed(dgp._chol, 'production')            # two-level SB=3584, HIGHEST
    PREC = {'highest': lax.Precision.HIGHEST, 'high': lax.Precision.HIGH}
    for spec in specs.split(','):
        parts = spec.split(':')
        if len(parts) == 1:
            B, SB, prec = B0, int(parts[0]), 'highest'
        else:
            B, SB = int(parts[0]), int(parts[1])
            prec = parts[2] if len(parts) > 2 else 'highest'
        chol = jax.jit(functools.partial(blocked.cholesky_blocked_upper_2level,
                                         block=B, super_block=SB,
                                         precision=PREC[prec]),
                       donate_argnums=(0,))
        timed(chol, f'b{B}_sb{SB}_{prec}')
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    a = sys.argv[1:]
    main(*(int(v) for v in a[:3]), *a[3:4])
