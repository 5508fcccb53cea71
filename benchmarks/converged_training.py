"""Convergence-semantics training at scale (VERDICT r3 #3): run the
north-star workload to the REFERENCE's stopping rule (scipy L-BFGS-B,
maxiter=5000, gtol=1e-16, ftol 2.22e-9 — /root/reference/romcomma/gpr/
models.py:330) instead of the 10-iteration diagnostic budget, and turn the
'matched tolerance' claim into measurements:

  - iterations to convergence + converged LML + wall-clock,
  - the f32-engine converged LML re-evaluated on the true-f64 engine at the
    same hyperparameters (|dLML| — factorization-precision error),
  - first-order + total Sobol' indices at the converged optimum computed by
    the production tier AND by the all-f64 interval pass (|dS|, |dST|).

Usage: python benchmarks/converged_training.py [N] [M] [maxiter]
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


def main(N: int = 20000, M: int = 30, maxiter: int = 5000) -> dict:
    import jax
    import jax.numpy as jnp
    from romcomma_tpu.parallel import distributed as dist

    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M))
    Y = (np.sin(X[:, :1]) + 0.5 * X[:, 1:2] ** 2
         + 0.1 * rng.standard_normal((N, 1)))

    dgp = dist.DistributedGP(N, dist.make_n_mesh(), dense_kernels=True)
    x_dev, y_dev = dgp.stage(X, Y)

    t0 = time.time()
    (ls, s2, noise), lml, iters = dgp.calibrate(
        X, Y, ls0=np.full(M, 2.0), s2_0=1.0, noise0=0.05, maxiter=maxiter)
    t_train = time.time() - t0

    # f64 re-evaluation of the converged LML on the HOST CPU (plain numpy:
    # exact f64, no emulated-f64 TPU program; ~5 min at N=20k on this
    # single-core host — infeasible past ~25k, where the row is skipped).
    t0 = time.time()
    if N > 25000:
        lml64, t_f64 = float('nan'), 0.0
    else:
        ls64 = np.asarray(ls, np.float64)
        s264, nz64 = float(np.asarray(s2)), float(np.asarray(noise))
        Xs = X / ls64[None, :]
        sq = (np.sum(Xs * Xs, axis=1)[:, None]
              + np.sum(Xs * Xs, axis=1)[None, :] - 2.0 * (Xs @ Xs.T))
        K = s264 * np.exp(-0.5 * np.maximum(sq, 0.0)) + nz64 * np.eye(N)
        del Xs, sq
        cho = np.linalg.cholesky(K)
        del K
        import scipy.linalg
        zv = scipy.linalg.solve_triangular(cho, Y.astype(np.float64),
                                           lower=True)
        lml64 = float(-0.5 * np.sum(zv * zv) - np.sum(np.log(np.diag(cho)))
                      - 0.5 * N * np.log(2.0 * np.pi))
        del cho, zv
        t_f64 = time.time() - t0

    t0 = time.time()
    S = dgp.sobol_indices(ls, s2, noise, x_dev, y_dev, X,
                          kind=('first_order', 'total'))
    t_gsa = time.time() - t0
    t0 = time.time()
    S64 = dgp.sobol_indices(ls, s2, noise, x_dev, y_dev, X,
                            kind=('first_order', 'total'),
                            gsa_dtype=np.float64)
    t_gsa64 = time.time() - t0
    dS = max(abs(float(S[k][m]) - float(S64[k][m]))
             for k in S for m in S[k])

    out = {'N': N, 'M': M, 'stopping': 'reference (maxiter=%d, gtol=1e-16, '
           'scipy ftol 2.22e-9)' % maxiter,
           'iterations': int(np.asarray(iters)),
           'converged': int(np.asarray(iters)) < maxiter,
           'train_s': round(t_train, 1),
           'lml_f32_engine': float(np.asarray(lml)),
           'lml_f64_engine_same_hypers': (None if np.isnan(lml64) else lml64),
           'dlml_rel': (None if np.isnan(lml64) else
                        abs(float(np.asarray(lml)) - lml64)
                        / max(1.0, abs(lml64))),
           'f64_eval_s': round(t_f64, 1),
           'gsa_s': round(t_gsa, 1), 'gsa_f64_s': round(t_gsa64, 1),
           'dS_max_vs_f64': dS,
           'S1_first3': [round(S['first_order'][m], 5) for m in range(3)],
           'ST_first3': [round(S['total'][m], 5) for m in range(3)],
           'lengthscales_first3': [round(float(v), 4)
                                   for v in np.asarray(ls)[:3]],
           's2': float(np.asarray(s2)), 'noise': float(np.asarray(noise))}
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
