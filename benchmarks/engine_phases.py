"""Phase timings of the dense upper engine's N=50k val+grad: gram, Cholesky,
triangular inverse, one V V^T strip matmul, and the streamed gradient body —
identifies the speed-of-light gap per phase (ops/blocked.py kernels).

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
    import jax
    out = jax.block_until_ready(fn(*a))
    best = float('inf')
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*a))
        best = min(best, time.time() - t0)
    return best, out


def main(N: int = 50000, M: int = 30, reps: int = 2):
    import jax
    import jax.numpy as jnp
    from jax import lax
    import functools
    from romcomma_tpu.parallel import distributed as dist
    from romcomma_tpu.ops import blocked
    from romcomma_tpu.ops.gram import rbf_gram

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
           'backend': jax.default_backend()}

    t_gram, K = _t(lambda: dgp._gram(x_dev, ls, s2, nz), reps=reps)
    out['gram_s'] = round(t_gram, 2)

    # chol donates; keep a copy protocol: time includes making the donated
    # copy cheap by re-running gram each rep instead.
    def chol_fresh():
        return dgp._chol(dgp._gram(x_dev, ls, s2, nz))
    t_gc, U = _t(chol_fresh, reps=reps)
    out['gram_plus_chol_s'] = round(t_gc, 2)
    out['chol_s'] = round(t_gc - t_gram, 2)

    def inv_fresh():
        return dgp._inv(dgp._chol(dgp._gram(x_dev, ls, s2, nz)))
    t_gci, V = _t(inv_fresh, reps=reps)
    out['inv_s'] = round(t_gci - t_gc, 2)

    strip = int(min(Npad, max(dgp.plan.B, dgp.GRAD_STRIP_COLS)))
    vvt = jax.jit(lambda V: jnp.matmul(
        V, lax.dynamic_slice(V, (0, 0), (strip, Npad)).T,
        precision=lax.Precision.HIGHEST))
    t_vvt, _ = _t(vvt, V, reps=reps)
    n_strips = -(-Npad // strip)
    out['vvt_strip_s'] = round(t_vvt, 2)
    out['vvt_all_strips_s'] = round(t_vvt * n_strips, 2)
    out['n_strips'] = n_strips

    gram_rows = jax.jit(lambda: rbf_gram(
        x_dev[:strip], x_dev, ls, s2))
    t_gr, _ = _t(gram_rows, reps=reps)
    out['gram_rows_all_strips_s'] = round(t_gr * n_strips, 2)

    gs = dgp._grads_streaming_fn(kinv_source='vvt')
    alpha = jnp.zeros((Npad, 1), dt)
    t_grads, _ = _t(lambda: gs(V, alpha, x_dev, ls, s2, nz), reps=reps)
    out['grads_stream_s'] = round(t_grads, 2)

    fwd_solve = jax.jit(lambda U, y: dgp._bwd(U, dgp._fwd(U, y)))
    t_solve, _ = _t(fwd_solve, U, y_dev, reps=reps)
    out['solve_s'] = round(t_solve, 2)

    total = t_gc + (t_gci - t_gc) + t_solve + t_grads
    out['sum_fwd_bwd_s'] = round(total, 2)
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    main(*(int(a) for a in sys.argv[1:]))
