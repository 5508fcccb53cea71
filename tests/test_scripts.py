"""Smoke tests of the root CLI scripts on tiny problems (CPU)."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _tiny_csv(path: Path, N=24, M=3, L=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0, 1, (N, M))
    Y = np.stack([np.sin(3 * X[:, 0]) + 0.1 * rng.normal(size=N),
                  X[:, 1] ** 2 + 0.1 * rng.normal(size=N)], axis=-1)[:, :L]
    cols = pd.MultiIndex.from_tuples([('X', f'X.{i}') for i in range(M)]
                                     + [('Y', f'Y.{i}') for i in range(L)])
    df = pd.DataFrame(np.concatenate([X, Y], axis=1), columns=cols)
    df.to_csv(path)
    return path


def test_csv_script_end_to_end(tmp_path):
    import csv_script
    csv = _tiny_csv(tmp_path / 'data.csv')
    out = csv_script.run(tmp_path / 'out', csv, gpr=True, gsa=True,
                         ignore_exceptions=False, k=1,
                         likelihood_variance=0.01, rbf_lengthscale=1.0)
    repo_dir = Path(out)
    assert (repo_dir / 'data.csv').exists()
    # collected GPR + GSA aggregates exist
    assert any(repo_dir.rglob('test_summary.csv'))
    assert any(repo_dir.rglob('S.csv'))


def test_installation_test_config_matches_reference():
    import installation_test as it
    assert it.K == 2 and it.Ms == (7,) and it.Ns == (300,)
    assert it.NOISE_MAGNITUDES == (0.04,)
    assert it.IS_GSA_ERROR_CALCULATED is True


def test_benchmark_script_grid_matches_reference():
    import benchmark_script as bs
    assert bs.Ms == (7, 9, 11, 13, 15, 17, 19)
    assert len(bs.Ns) == 47 and bs.Ns[0] == 60 and bs.Ns[-1] == 9840
    assert len(bs.NOISE_MAGNITUDES) == 20
