"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: wall-clock of the installation-test workload (the
reference's canonical end-to-end benchmark — OAKLEY2004, M=7, N=300, K=2
folds, L=3 outputs, variant GPR isotropic->anisotropic with full L-BFGS
budget, all three GSA kinds with standard errors, results Collection).

Baseline: the only timing the reference ships — 12 s end-to-end on a JADE II
node (JADE_INSTRUCTIONS.md:113-114; the log shows execution pinned to /CPU,
and the reference is CPU-bound through scipy's L-BFGS-B regardless of the
GPU flag). vs_baseline = baseline_seconds / our_seconds (higher is better).

A second, scale-oriented measurement (N=4096, M=30 ARD-RBF GP single-fold
LML optimization) is printed to stderr for tracking; the JSON line stays in
the required 4-key schema.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

BASELINE_SECONDS = 12.0  # reference JADE_INSTRUCTIONS.md:102-114


def bench_installation_test() -> float:
    import installation_test
    root = Path(tempfile.mkdtemp(prefix='romcomma_bench_'))
    try:
        t0 = time.time()
        installation_test.run(root)
        return time.time() - t0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_scale(N: int = 4096, M: int = 30, L: int = 1, maxiter: int = 50) -> dict:
    """Raw on-device LML optimization timing at scale (fixed iteration budget
    so the number is comparable across rounds)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from romcomma_tpu.models import gp
    from romcomma_tpu.models.params import variant_init, variant_mask

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, M)))
    y = jnp.asarray(rng.standard_normal((N, L)))
    raw = variant_init(np.full(L, 2.0), np.full((L, M), 5.0), np.full(L, 0.05))
    mask = variant_mask()
    t0 = time.time()
    out = gp.calibrate_variant(raw, mask, x, y, maxiter=maxiter)
    jax.block_until_ready(out)
    compile_and_run = time.time() - t0
    t0 = time.time()
    out = gp.calibrate_variant(raw, mask, x, y, maxiter=maxiter)
    jax.block_until_ready(out)
    steady = time.time() - t0
    iters = int(np.asarray(out[2]).sum())
    return {'N': N, 'M': M, 'first_s': round(compile_and_run, 2),
            'steady_s': round(steady, 2), 'iters': iters,
            's_per_lbfgs_iter': round(steady / max(iters, 1), 4)}


def main():
    import numpy as np
    import random
    np.random.seed(0)
    random.seed(0)
    scale = bench_scale()
    print(f'scale bench: {scale}', file=sys.stderr, flush=True)
    seconds = bench_installation_test()
    print(json.dumps({'metric': 'installation_test end-to-end wall-clock',
                      'value': round(seconds, 2), 'unit': 's',
                      'vs_baseline': round(BASELINE_SECONDS / seconds, 3)}),
          flush=True)


if __name__ == '__main__':
    main()
