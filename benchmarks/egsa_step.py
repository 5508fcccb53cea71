"""In-situ cost attribution of the factorized W/T error sweep
(gsa/factorized_errors.error_scan) at production shapes, WARM.

benchmarks/egsa_ops.py times the sweep's primitive ops in isolation; this
benchmark times the PRODUCTION program itself — same traced constructors,
same chunking, same host-paced loop — and attributes the body by toggling
the ``need`` kinds, each of which compiles a strictly smaller program:

  carry   need={}                         accumulate-only + ONE prefix-last
                                          emission (no per-dim emissions)
  single  need={'single'}                 + M per-dim single emissions
  suffix  need={'suffix'}                 single-sweep reverse: carries + M
                                          suffix emissions + M single... no —
                                          suffix alone emits ONLY suffix
  prod    need={'single','suffix'}        the production first_order+total
                                          configuration (single-sweep mode)

Differences between modes isolate the per-dim emission cost from the carry
cost in situ (fusion included), which the op-level microbench cannot see.
The psi solve is stubbed with an identity solver so the engine is measured
alone (no K factor, no refinement).  Each mode runs twice; the second
(warm) run is the number — cal.last_error_sweep_timings splits it into
prep/loop/solve.

Usage:  python benchmarks/egsa_step.py [N] [M] [n_chunk] [reps]
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


def main(N: int = 8192, M: int = 30, n_chunk: int = 0, reps: int = 2):
    import jax
    import jax.numpy as jnp
    from romcomma_tpu.gsa import factorized_errors
    from romcomma_tpu.gsa.calibrators import ClosedSobolWithError

    print(f'backend={jax.default_backend()}', flush=True)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M))
    alpha = rng.standard_normal((1, 1, N)) * 0.1
    f64 = jnp.float64
    meta = dict(is_T_partial=True, intervals_mixed='ff',
                psi_solver=lambda f: f)          # identity: engine only
    if n_chunk:
        meta['n_chunk'] = n_chunk
    cal = ClosedSobolWithError.from_arrays(
        F=jnp.asarray([[1.0]], f64), K_cho=jnp.zeros((1, 1, 1), f64),
        K_inv_Y=jnp.asarray(alpha, f64),
        Lambda=jnp.asarray(np.full(M, 2.0), f64)[None, :],
        X=jnp.asarray(X, f64), is_F_diagonal=True, L=1, M=M, N=N,
        defer_V=True, **meta)
    # defer_V leaves the V family unset; the sweep itself never reads it.

    modes = {'carry': {}, 'single': {'single': True},
             'suffix': {'suffix': True},
             'prod': {'single': True, 'suffix': True}}
    for name, need in modes.items():
        best, detail = float('inf'), {}
        for _ in range(1 + reps):                # first run pays the compile
            t0 = time.time()
            out = factorized_errors.error_scan(cal, need, host_paced=True)
            jax.block_until_ready(out['psi'])
            dt = time.time() - t0
            if dt < best:
                best, detail = dt, dict(cal.last_error_sweep_timings)
        print(json.dumps({'mode': name, 'warm_s': round(best, 3),
                          'detail': detail, 'N': N, 'M': M}), flush=True)


if __name__ == '__main__':
    main(*(int(a) for a in sys.argv[1:5]))
