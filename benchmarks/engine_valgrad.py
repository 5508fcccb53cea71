"""DistributedGP LML val+grad per evaluation — the large-N calibration
engine's hot step — comparing the block-cyclic shard_map kernels against the
S==1 dense MXU-blocked kernels (ops/blocked.py), at tunable N.

The dense upper engine is the production single-device route at every
large N (it beat the fused dense-direct program at N=8192/14000/20000 in
the round-3 head-to-head); at N=50000 it is also the only single-chip
option (the dense-direct objective needs 3 (N,N) buffers).

Usage:  python benchmarks/engine_valgrad.py [N] [M] [reps] [engines]
        engines: 'dense', 'cyclic', 'direct', 'stream' or 'all'
                 (default 'dense').
        'direct' is the RETIRED N<=21k production route — ONE fused
        builtin-kernel val+grad program (rbf_gram + XLA cholesky under
        autodiff), what DistributedGP.calibrate dispatches below
        DENSE_DIRECT_MAX_N for block-cyclic-engine callers.
        'stream' is the dense upper engine with the streaming-v2 custom-VJP
        backward FORCED on (the N=50k route) regardless of the memory
        budget — the head-to-head VERDICT r2 #2 asks for at N=20k.
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


def main(N: int = 20000, M: int = 30, reps: int = 3, engines: str = 'dense',
         grad_precision: str = ''):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from romcomma_tpu.parallel import distributed as dist

    if grad_precision:
        dist.DistributedGP.GRAD_PRECISION = {
            'high': lax.Precision.HIGH,
            'highest': lax.Precision.HIGHEST}[grad_precision]
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M))
    Y = (np.sin(X[:, :1]) + 0.5 * X[:, 1:2] ** 2
         + 0.1 * rng.standard_normal((N, 1)))
    names = (('dense', 'cyclic', 'direct', 'stream') if engines == 'all'
             else ('dense', 'cyclic') if engines == 'both' else (engines,))
    out_all = {}
    for name in names:
        if name == 'direct':
            # The fused builtin-kernel program of DistributedGP.calibrate's
            # N <= DENSE_DIRECT_MAX_N fast path (distributed.py), timed as
            # raw val+grad in CONSTRAINED space (same compute; the raw-space
            # transform is a few scalars).
            from romcomma_tpu.ops.gram import rbf_gram
            from romcomma_tpu.ops.linalg import add_diag, mvn_logpdf
            from romcomma_tpu.ops.linalg import cholesky as dense_cholesky
            from romcomma_tpu.base.definitions import FLOAT
            dt = FLOAT()
            xd = jnp.asarray(np.asarray(X, dtype=dt))
            yd = jnp.asarray(np.asarray(Y, dtype=dt))

            def objective(p):
                K = rbf_gram(xd, xd, p[0], p[1])
                ch = dense_cholesky(add_diag(K, p[2]))
                return -jnp.sum(mvn_logpdf(yd, jnp.zeros_like(yd), ch))

            vg = jax.jit(jax.value_and_grad(objective))
            ls = jnp.asarray(np.full(M, 2.0), dt)
            s2 = jnp.asarray(1.0, dt)
            nz = jnp.asarray(0.05, dt)
            t0 = time.time()
            v, g = jax.block_until_ready(vg((ls, s2, nz)))
            compile_s = time.time() - t0
            times = []
            for _ in range(reps):
                t0 = time.time()
                v, g = jax.block_until_ready(vg((ls, s2, nz)))
                times.append(time.time() - t0)
            out = {'engine': name, 'N': N, 'M': M,
                   'grad_l2': [float(jnp.linalg.norm(t)) for t in g],
                   'backend': jax.default_backend(),
                   'compile_plus_first_s': round(compile_s, 1),
                   's_per_eval': round(min(times), 3), 'value': float(v)}
            print(json.dumps(out), flush=True)
            out_all[name] = out
            continue
        budget = dist.DistributedGP.GRADS_MEMORY_BUDGET_BYTES
        if name == 'stream':
            dist.DistributedGP.GRADS_MEMORY_BUDGET_BYTES = 0
        try:
            dgp = dist.DistributedGP(N, dist.make_n_mesh(1),
                                     dense_kernels=(name in ('dense', 'stream')))
        finally:
            dist.DistributedGP.GRADS_MEMORY_BUDGET_BYTES = budget
        x_dev, y_dev = dgp.stage(X, Y)
        ls = jnp.asarray(np.full(M, 2.0), x_dev.dtype)
        s2 = jnp.asarray(1.0, x_dev.dtype)
        nz = jnp.asarray(0.05, x_dev.dtype)
        # NOT wrapped in an outer jit: at streaming scale production drives
        # scipy L-BFGS-B over this same EAGER chain (minimize_scipy
        # fuse=False) — each custom-VJP piece is its own bounded dispatch
        # and donation caps peak HBM at one (Npad,Npad) buffer; one fused
        # program holds gram + factor carry together and OOMs at N=50k.
        vg = jax.value_and_grad(
            lambda p: dgp._lml(p[0], p[1], p[2], x_dev, y_dev))
        t0 = time.time()
        v, g = jax.block_until_ready(vg((ls, s2, nz)))
        compile_s = time.time() - t0
        times = []
        for _ in range(reps):
            t0 = time.time()
            v, g = jax.block_until_ready(vg((ls, s2, nz)))
            times.append(time.time() - t0)
        out = {'engine': name, 'N': N, 'M': M,
               'grad_precision': str(dist.DistributedGP.GRAD_PRECISION),
               'grad_l2': [float(jnp.linalg.norm(t)) for t in g],
               'backend': jax.default_backend(),
               'compile_plus_first_s': round(compile_s, 1),
               's_per_eval': round(min(times), 3), 'value': float(v),
               'streaming_grads': bool(
                   3 * dgp.plan.Npad ** 2 * 4 > budget or name == 'stream')}
        print(json.dumps(out), flush=True)
        out_all[name] = out
    return out_all


if __name__ == '__main__':
    a = sys.argv[1:]
    main(*(int(x) for x in a[:3]), *a[3:5])
