"""Phase timings of the dense upper engine's N=50k val+grad: gram, Cholesky,
triangular inverse, V V^T strip matmuls, and the streamed gradient body —
identifies the speed-of-light gap per phase (ops/blocked.py kernels).

HBM discipline: at N=50k one (Npad,Npad) f32 buffer is ~10 GB on a 16 GB
chip, so the probe NEVER holds two — each timed chain is fresh-built with
donated buffers and the previous result is dropped before re-running.

Usage:  python benchmarks/engine_phases.py [N] [M] [reps]
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


def _t(fn, *a, reps=2):
    """min-of-reps wall time; drops the previous output BEFORE re-running so
    only one chain's buffers are ever live."""
    import jax
    out = jax.block_until_ready(fn(*a))
    best = float('inf')
    for _ in range(reps):
        del out
        t0 = time.time()
        out = jax.block_until_ready(fn(*a))
        best = min(best, time.time() - t0)
    return best, out


def main(N: int = 50000, M: int = 30, reps: int = 2, dense_block: int = 0):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from romcomma_tpu.parallel import distributed as dist
    from romcomma_tpu.ops.gram import rbf_gram

    if dense_block:
        dist.DistributedGP.DENSE_BLOCK = int(dense_block)

    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M))
    Y = (np.sin(X[:, :1]) + 0.5 * X[:, 1:2] ** 2
         + 0.1 * rng.standard_normal((N, 1)))
    dgp = dist.DistributedGP(N, dist.make_n_mesh(1), dense_kernels=True)
    x_dev, y_dev = dgp.stage(X, Y)
    dt = x_dev.dtype
    ls = jnp.asarray(np.full(M, 2.0), dt)
    s2 = jnp.asarray(1.0, dt)
    nz = jnp.asarray(0.05, dt)
    Npad = dgp.plan.Npad
    out = {'N': N, 'M': M, 'Npad': int(Npad),
           'block': int(dist.DistributedGP.DENSE_BLOCK),
           'backend': jax.default_backend()}

    t_gram, K = _t(lambda: dgp._gram(x_dev, ls, s2, nz), reps=reps)
    out['gram_s'] = round(t_gram, 2)
    del K

    def chol_fresh():
        return dgp._chol(dgp._gram(x_dev, ls, s2, nz))
    t_gc, U = _t(chol_fresh, reps=reps)
    out['gram_plus_chol_s'] = round(t_gc, 2)
    out['chol_s'] = round(t_gc - t_gram, 2)

    # solves on the live factor (small vectors — no extra big buffer)
    solve = jax.jit(lambda U, y: dgp._bwd(U, dgp._fwd(U, y)))
    t_solve, _ = _t(solve, U, y_dev, reps=reps)
    out['solve_s'] = round(t_solve, 3)
    del U

    def inv_fresh():
        return dgp._inv(dgp._chol(dgp._gram(x_dev, ls, s2, nz)))
    t_gci, V = _t(inv_fresh, reps=reps)
    out['inv_s'] = round(t_gci - t_gc, 2)

    strip, n_strips = dgp.grad_strip()
    vvt = jax.jit(lambda V: jnp.matmul(
        V, lax.dynamic_slice(V, (0, 0), (strip, Npad)).T,
        precision=dgp._grad_precision))
    t_vvt, kc = _t(vvt, V, reps=reps)
    del kc
    out['vvt_strip_s'] = round(t_vvt, 2)
    out['vvt_all_strips_s'] = round(t_vvt * n_strips, 2)
    out['n_strips'] = n_strips

    grow = jax.jit(lambda: rbf_gram(x_dev[:strip], x_dev, ls, s2))
    t_gr, gr = _t(grow, reps=reps)
    del gr
    out['gram_rows_all_strips_s'] = round(t_gr * n_strips, 2)

    gs = dgp._grads_streaming_fn(kinv_source='vvt')
    alpha = jnp.zeros((Npad, 1), dt)
    t_grads, g = _t(lambda: gs(V, alpha, x_dev, ls, s2, nz), reps=reps)
    del g
    out['grads_stream_s'] = round(t_grads, 2)

    out['sum_fwd_bwd_s'] = round(t_gci + t_solve + t_grads, 2)
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    main(*(int(a) for a in sys.argv[1:]))
