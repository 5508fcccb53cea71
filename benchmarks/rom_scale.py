"""ROM at scale on the TPU through the PRODUCTION path (VERDICT r4 #4):
the alternating rotation loop (reference rom/old.py:59-74 design) at
N=8192 / M=10 with a PLANTED non-axis-aligned 2-D active subspace, the
reference 'sobol' rotation objective (differentiable rotated leading
index), converged GP calibration each iteration, and the persistent
compile cache ON — the configuration that forces the rotated-Sobol
serializer segfault to be handled in production code
(base/definitions.no_compile_cache around the Cayley descent).

Reports wall-clock per phase, iterations, the leading closed index
trajectory, and the PRINCIPAL ANGLE between the planted active plane and
the span of the learned rotation's leading rows.

Usage: python benchmarks/rom_scale.py [N] [M] [iterations] [method]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('ROMCOMMA_X64', '0')

import numpy as np


def main(N: int = 8192, M: int = 10, iterations: int = 3,
         method: str = 'sobol') -> dict:
    import pandas as pd
    from scipy.stats import norm

    from romcomma_tpu.data.storage import Fold, Repository
    from romcomma_tpu.rom import ROM

    root = Path(os.environ.get('ROM_SCALE_DIR', '/tmp/rom_scale'))
    shutil.rmtree(root, ignore_errors=True)
    root.mkdir(parents=True)

    rng = np.random.default_rng(0)
    # planted orthonormal active plane (v1, v2) in NORMALIZED coordinates
    Q, _ = np.linalg.qr(rng.standard_normal((M, M)))
    v1, v2 = Q[:, 0], Q[:, 1]
    X = rng.uniform(size=(N, M))
    z = norm.ppf(np.clip(X, 1e-12, 1 - 1e-12))     # the fold's normalization
    y = (np.sin(2.0 * (z @ v1)) + 0.5 * (z @ v2) ** 2
         + 0.05 * rng.standard_normal(N))
    cols = pd.MultiIndex.from_tuples([('X', f'X.{i}') for i in range(M)]
                                     + [('Y', 'Y.0')])
    df = pd.DataFrame(np.column_stack([X, y]), columns=cols, dtype=float)
    repo = Repository.from_df(root / 'repo', df).into_K_folds(-1)
    fold = Fold(repo, 0)

    t0 = time.time()
    rom = ROM('rom', fold, m=2, iterations=iterations,
              rotation_method=method, maxiter=5000,
              theta_maxiter=100, theta_starts=3, sample_size=1024)
    meta = rom.calibrate()
    wall = time.time() - t0

    rot = np.loadtxt(fold.folder / 'rom' / 'rotation.csv', delimiter=',')
    # principal angles between the planted plane and the learned leading
    # 2-D rotated subspace (rows of the cumulative rotation)
    A = np.stack([v1, v2], axis=1)                  # (M, 2) planted
    Bs = rot[:2].T                                  # (M, 2) learned
    qa, _ = np.linalg.qr(A)
    qb, _ = np.linalg.qr(Bs)
    sv = np.linalg.svd(qa.T @ qb, compute_uv=False)
    angles_deg = np.degrees(np.arccos(np.clip(sv, -1, 1)))
    out = {'N': N, 'M': M, 'method': method, 'wall_s': round(wall, 1),
           'iterations_run': len(meta['history']) - 1,
           'S_m_history': [round(h['S_m'], 4) for h in meta['history']],
           'principal_angles_deg': [round(float(a), 2) for a in angles_deg],
           'cache_dir_active': bool(
               os.environ.get('ROMCOMMA_JAX_CACHE',
                              os.path.expanduser('~/.cache/romcomma_jax')))}
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    a = sys.argv[1:]
    main(*([int(x) for x in a[:3]] + a[3:4]))
