"""ROM tests: the rotation loop concentrates variance onto leading inputs."""

import numpy as np

from romcomma_tpu.data.storage import Fold
from romcomma_tpu.rom import ROM
from romcomma_tpu.user import sample, functions


def _linear_repo(tmp_root, N=120, M=3):
    """A function whose active direction is NOT axis aligned:
    f(x) = (x0 + x1 + x2) dominant — ROM should rotate onto it."""
    import pandas as pd
    rng = np.random.default_rng(1)
    X = rng.uniform(size=(N, M))
    w = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
    y = (X - 0.5) @ w * 3.0 + 0.05 * rng.standard_normal(N)
    columns = pd.MultiIndex.from_tuples([('X', f'X.{i}') for i in range(M)] + [('Y', 'Y.0')])
    df = pd.DataFrame(np.column_stack([X, y]), columns=columns, dtype=float)
    from romcomma_tpu.data.storage import Repository
    return Repository.from_df(tmp_root / 'repo', df).into_K_folds(-1)


def test_rom_concentrates_leading_index(tmp_root):
    repo = _linear_repo(tmp_root)
    fold = Fold(repo, 0)
    rom = ROM('rom', fold, m=1, iterations=2, sample_size=256, maxiter=100)
    meta = rom.calibrate()
    history = meta['history']
    # After rotation the leading input should explain most of the variance.
    assert history[-1]['S_m'] > 0.9, history
    # Artifacts persisted
    assert (fold.folder / 'rom' / 'meta.json').exists()
    assert (fold.folder / 'rom' / 'rotation.csv').exists()
    rot = np.loadtxt(fold.folder / 'rom' / 'rotation.csv', delimiter=',')
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-8)
    # reduce() writes a truncated dataset
    out = rom.reduce(1)
    assert out.exists()


def test_rom_already_aligned_stays_high(tmp_root):
    """sin output of ishigami is already axis-aligned on x0."""
    noise = sample.GaussianNoise.Variance(3, 0.05, False, True)
    repo = sample.Function(tmp_root, sample.DOE.latin_hypercube, functions.ISHIGAMI,
                           120, 3, noise, overwrite_existing=True).repo.into_K_folds(-1)
    fold = Fold(repo, 0)
    rom = ROM('rom', fold, m=2, iterations=1, sample_size=256, maxiter=100)
    meta = rom.calibrate()
    assert meta['history'][-1]['S_m'] > 0.5
