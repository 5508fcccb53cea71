"""North-star benchmark: N=20000, M=30 ARD-RBF GP trained + first-order AND
total Sobol' indices, end-to-end on the available TPU (BASELINE.md targets;
the reference tops out near N=9840 on one device, benchmark_script.py:36-38).

Runs the large-N production path: DistributedGP host-paced L-BFGS training
(bounded device dispatches for tunnelled runtimes) and the factorized
O(N^2 M) all-kind Sobol' pass sharing one posterior solve.

Usage:  python benchmarks/north_star.py [N] [M] [maxiter] [dense_kernels]
``dense_kernels`` defaults to the PRODUCTION selection (the MXU-blocked
upper engine on any single-device mesh — what MOGP._calibrate_variant_large
constructs); pass 0 to force the block-cyclic engine + fused dense-direct
branch (the pre-round-3 route).
Prints one JSON line with phase timings and the leading indices.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('ROMCOMMA_X64', '0')      # f32 TPU fast path

import numpy as np


def main(N: int = 20000, M: int = 30, maxiter: int = 10,
         dense_kernels: 'int | None' = None) -> dict:
    import jax
    from romcomma_tpu.parallel import distributed as dist

    if dense_kernels is None:       # production selection (models/gpr.py)
        dense_kernels = int(dist.make_n_mesh().devices.size == 1)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M))
    # sin(x0) + x1^2/2: analytic first-order indices concentrate on dims 0,1
    # (S1 ~ [0.48, 0.43, 0...]), everything else is noise-floor — a structural
    # oracle for the computed indices.
    Y = (np.sin(X[:, :1]) + 0.5 * X[:, 1:2] ** 2
         + 0.1 * rng.standard_normal((N, 1)))

    t0 = time.time()
    dgp = dist.DistributedGP(N, dist.make_n_mesh(),
                             dense_kernels=bool(dense_kernels))
    x_dev, y_dev = dgp.stage(X, Y)
    jax.block_until_ready((x_dev, y_dev))
    t_stage = time.time() - t0

    t0 = time.time()
    (ls, s2, noise), lml, iters = dgp.calibrate(
        X, Y, ls0=np.full(M, 2.0), s2_0=1.0, noise0=0.05, maxiter=maxiter)
    t_train = time.time() - t0

    t0 = time.time()
    S = dgp.sobol_indices(ls, s2, noise, x_dev, y_dev, X,
                          kind=('first_order', 'total'))
    t_gsa = time.time() - t0
    # Steady-state GSA: the first pass pays one-time per-process costs
    # (executable deserialization through the remote compile helper,
    # refinement warm-up); production serving re-runs analytics on live
    # models, so the warm wall-clock is the headline unit of work.
    t0 = time.time()
    S2 = dgp.sobol_indices(ls, s2, noise, x_dev, y_dev, X,
                           kind=('first_order', 'total'))
    t_gsa_warm = time.time() - t0
    warm_phases = dict(getattr(dgp, 'last_gsa_timings', None) or {})

    # Warm val+grad s/eval at the trained hyperparameters (programs compiled
    # during training): the engine's steady-state unit of work.
    import jax.numpy as jnp

    def valgrad():
        return jax.value_and_grad(
            lambda p: dgp._lml(p[0], p[1], p[2], x_dev, y_dev)
        )((jnp.asarray(ls), jnp.asarray(s2), jnp.asarray(noise)))

    vg_times = []
    for _ in range(2):
        t0 = time.time()
        jax.block_until_ready(valgrad())
        vg_times.append(time.time() - t0)

    out = {'N': N, 'M': M, 'dense_kernels': bool(dense_kernels),
           'valgrad_s': round(min(vg_times), 3),
           'iters': int(np.asarray(iters)),
           'gsa_phases_warm': warm_phases,
           'lml': float(np.asarray(lml)),
           'stage_s': round(t_stage, 1), 'train_s': round(t_train, 1),
           'gsa_both_kinds_s': round(t_gsa, 1),
           'gsa_both_kinds_warm_s': round(t_gsa_warm, 1),
           'end_to_end_s': round(t_stage + t_train + t_gsa, 1),
           'S1_first3': [round(S['first_order'][m], 4) for m in range(3)],
           'ST_first3': [round(S['total'][m], 4) for m in range(3)]}
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
