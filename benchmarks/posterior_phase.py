"""Phase timings of DistributedGP.posterior_alpha — the GSA posterior solve.

At N=20k the no-error GSA phase is posterior-dominated (north_star 2026-08-19:
GSA 13.9 s = posterior ~12.7 + intervals 1.2), so this probe breaks the
posterior into gram / factorization / substitution / per-round f64-refinement
residuals to find the hot spot. The residual rebuilds the gram row strips in
float64 on the fly (distributed._residual_f64) — on TPU that is emulated-f64
exp + sqdist per strip, the suspected dominant cost.

Usage: python benchmarks/posterior_phase.py [N] [M] [refine] [ff]
``ff``: 1/0 force the RESIDUAL_FF_EXP float-float gram-exp tier on/off
(default -1 = the production 'auto' policy). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('ROMCOMMA_X64', '0')

import numpy as np


def main(N: int = 20000, M: int = 30, refine: int = 2, ff: int = -1) -> dict:
    import jax
    import jax.numpy as jnp
    from romcomma_tpu.parallel import distributed as dist

    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M))
    Y = (np.sin(X[:, :1]) + 0.5 * X[:, 1:2] ** 2
         + 0.1 * rng.standard_normal((N, 1)))

    dgp = dist.DistributedGP(N, dist.make_n_mesh(), dense_kernels=True)
    if ff >= 0:
        dgp.RESIDUAL_FF_EXP = bool(ff)
    x_dev, y_dev = dgp.stage(X, Y)
    jax.block_until_ready((x_dev, y_dev))
    ls = np.full(M, 2.0)
    s2, noise = 1.0, 0.05

    def t(fn, *args, **kw):
        t0 = time.time()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        return out, time.time() - t0

    timings = {}
    lsC, s2C, nzC = dgp._cast_hypers(x_dev, ls, s2, noise)
    K, timings['gram_s'] = t(dgp._gram, x_dev, lsC, s2C, nzC)
    L, timings['chol_s'] = t(dgp._chol, K)
    z, timings['fwd_s'] = t(dgp._fwd, L, y_dev)
    alpha, timings['bwd_s'] = t(dgp._bwd, L, z)

    residual = dgp._residual_f64()
    f64 = jnp.float64
    x64 = jnp.asarray(x_dev, f64)
    y64 = jnp.asarray(y_dev, f64)
    h64 = (jnp.asarray(lsC, f64), jnp.asarray(s2C, f64), jnp.asarray(nzC, f64))
    a64 = jnp.asarray(alpha, f64)
    r, timings['residual_cold_s'] = t(residual, x64, y64, a64, *h64)
    norms = [float(jnp.linalg.norm(r))]
    res_warm = []
    solve_s = []
    for _ in range(refine):
        t0 = time.time()
        d = dgp._bwd(L, dgp._fwd(L, jnp.asarray(r, x_dev.dtype)))
        jax.block_until_ready(d)
        solve_s.append(round(time.time() - t0, 3))
        a64 = a64 + jnp.asarray(d, f64)
        r, dt = t(residual, x64, y64, a64, *h64)
        res_warm.append(round(dt, 3))
        norms.append(float(jnp.linalg.norm(r)))

    # end-to-end comparison: the production call (includes its own gram/chol)
    t0 = time.time()
    out = dgp.posterior_alpha(lsC, s2C, nzC, x_dev, y_dev, refine=refine)
    jax.block_until_ready(out)
    timings['posterior_alpha_warm_s'] = round(time.time() - t0, 2)

    result = {'N': N, 'M': M, 'refine': refine, 'backend': jax.default_backend(),
              **{k: round(v, 3) if isinstance(v, float) else v
                 for k, v in timings.items()},
              'residual_warm_s': res_warm, 'refine_solve_s': solve_s,
              'residual_norms': [f'{n:.3e}' for n in norms]}
    print(json.dumps(result), flush=True)
    return result


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
