"""End-to-end installation smoke test.

Mirrors the reference's ``installation_test.py`` configuration: OAKLEY2004
(L=3 outputs), M=7 inputs, N=300 samples, K=2 folds, noise 0.04, variant GPR
isotropic -> anisotropic, all three GSA kinds with standard errors, full
results Collection.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from pathlib import Path
from typing import List, Tuple

from romcomma_tpu import user


@contextlib.contextmanager
def _phase(label: str):
    """stderr phase timing, opt-in via ROMCOMMA_BENCH_PHASES=1 (bench.py's
    steady-state headline is a handful of these phases — the breakdown tells
    a profiling session which one is paying the tunnel's dispatch latency)."""
    if os.environ.get('ROMCOMMA_BENCH_PHASES', '') != '1':
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        print(f'  phase {label}: {time.perf_counter() - t0:.2f}s',
              file=sys.stderr, flush=True)

K: int = 2
Ms: Tuple[int, ...] = (7,)
Ns: Tuple[int, ...] = (300,)
DOE = user.sample.DOE.latin_hypercube
FUNCTION_VECTOR = user.functions.OAKLEY2004
NOISE_MAGNITUDES: Tuple[float, ...] = (0.04,)
IS_NOISE_COVARIANT: bool = False
IS_NOISE_VARIANCE_DETERMINED: bool = True
ROTATIONS = {'': None}
IS_GPR_READ = False
IS_GPR_COVARIANT = False
IS_GPR_ISOTROPIC = None
GSA_KINDS: List[user.run.GSA.Kind] = user.run.GSA.ALL_KINDS
IS_GSA_ERROR_CALCULATED: bool = True
IS_GSA_ERROR_PARTIAL: bool = False


def run(root: str | Path) -> Path:
    with user.contexts.Environment('Test'):
        KIND_NAMES = [kind.name.lower() for kind in GSA_KINDS]
        for noise_magnitude in NOISE_MAGNITUDES:
            for M in Ms:
                for N in Ns:
                    noise_variance = user.sample.GaussianNoise.Variance(
                        len(FUNCTION_VECTOR), noise_magnitude, IS_NOISE_COVARIANT,
                        IS_NOISE_VARIANCE_DETERMINED)
                    for rotation_name, rotation in ROTATIONS.items():
                        with user.contexts.Timer(f'M={M}, N={N}, noise={noise_magnitude}',
                                                 is_inline=False):
                            with _phase('sample+fold'):
                                repo = user.sample.Function(
                                    root, DOE, FUNCTION_VECTOR, N, M, noise_variance, None,
                                    True).repo.into_K_folds(K).rotate_folds(rotation)
                            with _phase('gpr'):
                                models = user.run.gpr(name='gpr', repo=repo, is_read=IS_GPR_READ,
                                                      is_covariant=IS_GPR_COVARIANT,
                                                      is_isotropic=IS_GPR_ISOTROPIC,
                                                      ignore_exceptions=False)
                            with _phase('collect-models'):
                                user.results.Collect(
                                    {'test': {'header': [0, 1]},
                                     'test_summary': {'header': [0, 1], 'index_col': 0}},
                                    {repo.folder / model: {'model': model} for model in models},
                                    False).from_folders(repo.folder / 'gpr', True)
                                user.results.Collect(
                                    {'variance': {}, 'log_marginal': {}},
                                    {f'{repo.folder / model}/likelihood': {'model': model}
                                     for model in models},
                                    False).from_folders((repo.folder / 'gpr') / 'likelihood', True)
                                user.results.Collect(
                                    {'variance': {}, 'lengthscales': {}},
                                    {f'{repo.folder / model}/kernel': {'model': model}
                                     for model in models},
                                    False).from_folders((repo.folder / 'gpr') / 'kernel', True)
                            with _phase('gsa'):
                                user.run.gsa('gpr', repo, is_covariant=IS_GPR_COVARIANT,
                                             is_isotropic=False, kinds=GSA_KINDS,
                                             is_error_calculated=IS_GSA_ERROR_CALCULATED,
                                             ignore_exceptions=False,
                                             is_T_partial=IS_GSA_ERROR_PARTIAL)
                            with _phase('collect-gsa'):
                                user.results.Collect(
                                    {'S': {}, 'V': {}} | ({'T': {}, 'W': {}}
                                                          if IS_GSA_ERROR_CALCULATED else {}),
                                    {f'{repo.folder / model}/gsa/{kind_name}':
                                     {'model': model, 'kind': kind_name}
                                     for kind_name in KIND_NAMES for model in models},
                                    True).from_folders((repo.folder / 'gsa'), True)
    return root


if __name__ == '__main__':
    root = Path('installation_test')
    print(f'Root path is {run(root)}')
