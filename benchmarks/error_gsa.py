"""Standard-error (W/T) GSA at scale on the default backend (TPU when
present), validated against the host-CPU f64 result.

The round-1 build routed every error-kind GSA to the host CPU because the
bundle-formulated program hard-failed the XLA TPU compiler at N>=4096.  The
chunked-scan engine (gsa/factorized_errors.py) is the TPU-native
replacement; this benchmark is its acceptance gate (VERDICT round-1 item 1):
error-kind GSA at N>=8192 must execute on the TPU backend and match the CPU
f64 result to 1e-6.

Usage:  python benchmarks/error_gsa.py [N] [M] [n_chunk]
Prints one JSON line: backend, wall times, max |TPU - CPU| rel error.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('ROMCOMMA_X64', '0')      # f32 training default on TPU;
                                                # GSA itself is always f64.

import numpy as np


def build_posterior(N: int, M: int):
    """Synthetic trained-GP posterior (the north-star generative model),
    factorized in f64 on the host."""
    import jax
    import jax.numpy as jnp
    cpu = jax.devices('cpu')[0]
    rng = np.random.default_rng(0)
    X = rng.standard_normal((N, M))
    Y = (np.sin(X[:, :1]) + 0.5 * X[:, 1:2] ** 2
         + 0.1 * rng.standard_normal((N, 1)))
    ls = np.full((1, M), 2.0)
    s2, noise = np.array([1.0]), np.array([0.05])
    with jax.default_device(cpu):
        from romcomma_tpu.ops.gram import rbf_gram
        from romcomma_tpu.ops.linalg import cholesky, tri_solve, add_diag
        x64 = jnp.asarray(X, jnp.float64)
        K = rbf_gram(x64, x64, jnp.asarray(ls[0], jnp.float64),
                     jnp.asarray(s2[0], jnp.float64))
        K_cho = cholesky(add_diag(K, jnp.asarray(noise[0], jnp.float64)))
        K_inv_Y = tri_solve(K_cho, jnp.asarray(Y, jnp.float64))
        K_inv_Y = tri_solve(K_cho, K_inv_Y, trans=True).T[None, ...]  # (1,1,N)
    return (np.asarray(K_cho), np.asarray(K_inv_Y), ls, s2[None, :],
            np.asarray(X, np.float64))


def run_on(device, arrays, slices, N, M, n_chunk, host_paced):
    import jax
    import jax.numpy as jnp
    from romcomma_tpu.gsa.calibrators import ClosedSobolWithError
    put = {k: jax.device_put(v, device) for k, v in arrays.items()}
    with jax.default_device(device):
        t0 = time.time()
        cal = ClosedSobolWithError.from_arrays(
            F=jnp.asarray(put['F']), K_cho=jnp.asarray(put['K_cho']),
            K_inv_Y=jnp.asarray(put['K_inv_Y']), Lambda=jnp.asarray(put['Lambda']),
            X=jnp.asarray(put['X']), is_F_diagonal=True, L=1, M=M, N=N,
            is_T_partial=True, n_chunk=n_chunk)
        jax.block_until_ready(cal.V[0])
        t_setup = time.time() - t0
        t0 = time.time()
        out = cal.marginalize_intervals(slices, host_paced=host_paced)
        out = jax.device_get({k: v for k, v in out.items()})
        t_intervals = time.time() - t0
    return out, t_setup, t_intervals


def main(N: int = 8192, M: int = 30, n_chunk: int = 0) -> dict:
    import jax
    print(f'backend={jax.default_backend()} devices={jax.devices()}', flush=True)
    t0 = time.time()
    K_cho, K_inv_Y, ls, F, X = build_posterior(N, M)
    print(f'posterior built in {time.time() - t0:.1f}s', flush=True)
    arrays = {'F': F, 'K_cho': K_cho, 'K_inv_Y': K_inv_Y, 'Lambda': ls, 'X': X}
    slices = tuple([(m, m + 1) for m in range(M)]        # first-order
                   + [(0, m + 1) for m in range(1, M)]   # closed
                   + [(m, M) for m in range(1, M)])      # total
    n_chunk = n_chunk or None
    backend = jax.default_backend()
    cpu = jax.devices('cpu')[0]

    cpu_out, cpu_setup, cpu_time = run_on(cpu, arrays, slices, N, M,
                                          n_chunk, host_paced=False)
    result = {'N': N, 'M': M, 'backend': backend, 'slices': len(slices),
              'cpu_setup_s': round(cpu_setup, 1),
              'cpu_WT_s': round(cpu_time, 1)}
    print(f'cpu done: setup {cpu_setup:.1f}s intervals {cpu_time:.1f}s', flush=True)
    if backend != 'cpu':
        acc = jax.devices()[0]
        acc_out, acc_setup, acc_time = run_on(acc, arrays, slices, N, M,
                                              n_chunk, host_paced=True)
        print(f'acc done: setup {acc_setup:.1f}s intervals {acc_time:.1f}s', flush=True)
        rel = {}
        for key in ('V', 'S', 'W', 'T'):
            a, b = np.asarray(acc_out[key]), np.asarray(cpu_out[key])
            scale = np.max(np.abs(b))
            rel[key] = float(np.max(np.abs(a - b)) / scale)
        result |= {'acc_setup_s': round(acc_setup, 1),
                   'acc_WT_s': round(acc_time, 1),
                   'max_rel_vs_cpu_f64': {k: float(f'{v:.3g}')
                                          for k, v in rel.items()}}
    # Structural oracle: W is symmetric positive-ish and T finite.
    W = np.asarray(cpu_out['W'])
    result['T_finite'] = bool(np.all(np.isfinite(np.asarray(cpu_out['T']))))
    result['W_sym'] = float(np.max(np.abs(W - np.swapaxes(W, 0, 1))))
    print(json.dumps(result), flush=True)
    return result


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
