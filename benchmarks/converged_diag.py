"""Diagnose the converged-optimum GSA breakdown (round-4 finding): at the
reference-stopping optimum of the north-star data the noise converges to
~0.01 and cond(K) ~ N s2/noise ~ 2e6 — probe, at the SAME trained
hyperparameters, (a) the engine posterior alpha vs an exact host-f64
cho_solve, and (b) the production-tier Sobol' S vs a host-f64 ClosedSobol
fed the exact alpha. Separates 'posterior solve broke' from 'interval tier
broke'.

Usage: python benchmarks/converged_diag.py [N] [M]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('ROMCOMMA_X64', '0')

import numpy as np


def main(N: int = 20000, M: int = 30) -> dict:
    import jax
    import jax.numpy as jnp
    import scipy.linalg
    from romcomma_tpu.parallel import distributed as dist

    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M))
    Y = (np.sin(X[:, :1]) + 0.5 * X[:, 1:2] ** 2
         + 0.1 * rng.standard_normal((N, 1)))

    dgp = dist.DistributedGP(N, dist.make_n_mesh(), dense_kernels=True)
    x_dev, y_dev = dgp.stage(X, Y)
    ckpt = f'/tmp/converged_diag_hypers_{N}_{M}.npz'
    if os.path.exists(ckpt):
        # resume: training already converged in an earlier (crashed) run
        d = np.load(ckpt)
        ls, s2, noise = d['ls'], float(d['s2']), float(d['noise'])
        lml, iters = float(d['lml']), int(d['iters'])
    else:
        (ls, s2, noise), lml, iters = dgp.calibrate(
            X, Y, ls0=np.full(M, 2.0), s2_0=1.0, noise0=0.05, maxiter=5000)
        np.savez(ckpt, ls=np.asarray(ls, np.float64),
                 s2=float(np.asarray(s2)), noise=float(np.asarray(noise)),
                 lml=float(np.asarray(lml)), iters=int(np.asarray(iters)))
    ls64 = np.asarray(ls, np.float64)
    s264, nz64 = float(np.asarray(s2)), float(np.asarray(noise))
    print(f'converged: iters={int(np.asarray(iters))} lml={float(np.asarray(lml)):.2f} '
          f's2={s264:.4f} noise={nz64:.6f} cond~{N * s264 / nz64:.2e}',
          file=sys.stderr, flush=True)

    # exact host-f64 posterior
    t0 = time.time()
    Xs = X / ls64[None, :]
    nrm = np.sum(Xs * Xs, axis=1)
    K = s264 * np.exp(-0.5 * np.maximum(
        nrm[:, None] + nrm[None, :] - 2.0 * (Xs @ Xs.T), 0.0))
    del Xs
    K[np.arange(N), np.arange(N)] += nz64         # in place: one 20 GB buffer
    cho = scipy.linalg.cho_factor(K, lower=True, overwrite_a=True)
    alpha_host = scipy.linalg.cho_solve(cho, Y.astype(np.float64))
    del cho, K
    t_host = time.time() - t0

    # engine posterior (refined). The factor is an (Npad, Npad) buffer —
    # it MUST be freed before sobol_indices runs its own posterior solve,
    # or two resident factors breach HBM at N=50k (measured OOM).
    alpha_eng, _factor = dgp.posterior_alpha(jnp.asarray(ls), jnp.asarray(s2),
                                             jnp.asarray(noise), x_dev, y_dev)
    a_eng = dist.from_stored(dgp.plan, np.asarray(alpha_eng))
    del alpha_eng, _factor
    alpha_rel = float(np.linalg.norm(a_eng - alpha_host)
                      / np.linalg.norm(alpha_host))

    # production-tier S vs host-f64 ClosedSobol at the EXACT alpha
    S_prod = dgp.sobol_indices(ls, s2, noise, x_dev, y_dev, X,
                               kind='first_order')
    from romcomma_tpu.gsa.calibrators import ClosedSobol
    from romcomma_tpu.base.definitions import host_cpu_device
    cpu = host_cpu_device(True)
    cal = ClosedSobol.from_arrays(
        F=jax.device_put(np.asarray([[s264]]), cpu),
        K_cho=jax.device_put(np.zeros((1, 1, 1)), cpu),
        K_inv_Y=jax.device_put(alpha_host.T[None], cpu),      # (1, 1, N)
        Lambda=jax.device_put(ls64[None, :], cpu),
        X=jax.device_put(X, cpu), is_F_diagonal=True, L=1, M=M, N=N)
    slices = tuple([(m, m + 1) for m in range(M)] + [(0, M)])
    V = np.asarray(cal.marginalize_intervals(slices)['V'])[0, 0]
    S_oracle = {m: float(V[m] / V[-1]) for m in range(M)}
    dS_alpha_fixed = max(abs(S_prod[m] - S_oracle[m]) for m in range(M))

    np.savez('/tmp/converged_diag.npz', ls=ls64, s2=s264, noise=nz64,
             alpha_eng=a_eng, alpha_host=alpha_host)
    out = {'N': N, 'M': M, 'iters': int(np.asarray(iters)),
           'noise': nz64, 'cond_est': N * s264 / nz64,
           'alpha_rel_err': alpha_rel, 'host_f64_posterior_s': round(t_host, 1),
           'S_prod_first3': [round(S_prod[m], 4) for m in range(3)],
           'S_oracle_first3': [round(S_oracle[m], 4) for m in range(3)],
           'dS_prod_vs_oracle': dS_alpha_fixed}
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
