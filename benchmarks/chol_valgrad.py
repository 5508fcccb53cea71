"""Dense single-device LML val+grad: XLA builtin Cholesky (autodiff) vs the
MXU-blocked kernels with the closed-form custom VJP (ops/blocked.py).

This times the exact objective of DistributedGP.calibrate's dense-direct
route — the hot spot of large-N calibration (round-1 measured 2.06 s/eval at
N=20000/M=30 f32 through the builtin path; the builtin TPU cholesky reaches
only ~2 TFLOP/s).

Usage:  python benchmarks/chol_valgrad.py [N] [M] [block] [reps]
Prints one JSON line with per-eval seconds for both paths and the speedup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('ROMCOMMA_X64', '0')

import numpy as np


def main(N: int = 8192, M: int = 30, block: int = 512, reps: int = 3) -> dict:
    import jax
    import jax.numpy as jnp
    from romcomma_tpu.ops.gram import rbf_gram
    from romcomma_tpu.ops.linalg import add_diag, mvn_logpdf, cholesky
    from romcomma_tpu.ops import blocked

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N, M)), jnp.float32)
    Y = jnp.asarray(np.sin(np.asarray(X[:, :1])) + 0.5 * np.asarray(X[:, 1:2]) ** 2
                    + 0.1 * rng.standard_normal((N, 1)), jnp.float32)
    params = (jnp.full((M,), 2.0, jnp.float32), jnp.asarray(1.0, jnp.float32),
              jnp.asarray(0.05, jnp.float32))

    def builtin_obj(p):
        ls, s2, noise = p
        K = add_diag(rbf_gram(X, X, ls, s2), noise)
        return -jnp.sum(mvn_logpdf(Y, jnp.zeros_like(Y), cholesky(K)))

    def blocked_obj(p):
        ls, s2, noise = p
        K = add_diag(rbf_gram(X, X, ls, s2), noise)
        return -blocked.mvn_lml_blocked(K, Y, block)

    out = {'N': N, 'M': M, 'block': block, 'backend': jax.default_backend()}
    for name, obj in (('builtin', builtin_obj), ('blocked', blocked_obj)):
        vg = jax.jit(jax.value_and_grad(obj))
        t0 = time.time()
        v, g = jax.block_until_ready(vg(params))
        out[f'{name}_compile_plus_first_s'] = round(time.time() - t0, 2)
        times = []
        for _ in range(reps):
            t0 = time.time()
            v, g = jax.block_until_ready(vg(params))
            times.append(time.time() - t0)
        out[f'{name}_s_per_eval'] = round(min(times), 3)
        out[f'{name}_value'] = float(v)
    out['speedup'] = round(out['builtin_s_per_eval'] / out['blocked_s_per_eval'], 2)
    out['value_rel_diff'] = float(f"{abs(out['builtin_value'] - out['blocked_value']) / abs(out['builtin_value']):.2e}")
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
