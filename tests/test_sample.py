"""user.sample semantics: DOE designs, the GaussianNoise.Variance quirk
(SURVEY.md §7 'semantic traps'), and noise sampling."""

import numpy as np
import pytest

from romcomma_tpu.user import sample


def test_gaussian_noise_variance_is_determined_quirk():
    """Reference quirk preserved (sample.py:132-150): is_determined=True
    gives a RANDOM trace-normalized SPD matrix; False gives the FIXED
    formula (-1)^(i-j)/(1+|i-j|) — inverted vs the reference docstring."""
    L, mag = 3, 0.5
    fixed = sample.GaussianNoise.Variance(L, mag, is_covariant=True,
                                          is_determined=False).matrix
    expected = np.array([[(-1) ** (i - j) / (1.0 + abs(i - j))
                          for i in range(L)] for j in range(L)]) * mag ** 2
    np.testing.assert_allclose(fixed, expected)
    rnd = sample.GaussianNoise.Variance(L, mag, is_covariant=True,
                                        is_determined=True).matrix
    # random SPD, trace-normalized to L before scaling by magnitude^2
    np.testing.assert_allclose(np.trace(rnd), L * mag ** 2)
    assert np.all(np.linalg.eigvalsh(rnd) >= -1e-12)
    # non-covariant: off-diagonals zeroed
    diag = sample.GaussianNoise.Variance(L, mag, is_covariant=False,
                                         is_determined=False).matrix
    assert np.all(diag[~np.eye(L, dtype=bool)] == 0.0)


def test_variance_format_tags():
    v = sample.GaussianNoise.Variance(2, 0.04, False, True)
    assert f'{v}' == 'd.v.4.00'
    v = sample.GaussianNoise.Variance(2, 0.04, True, False)
    assert f'{v}' == 'u.c.4.00'


def test_doe_designs():
    X = sample.DOE.latin_hypercube(50, 4)
    assert X.shape == (50, 4) and np.all((X >= 0) & (X <= 1))
    stats = sample.DOE.space_filling_test(X, 16)
    assert all(np.all(np.asarray(v) >= 0) for v in stats.values())


def test_full_factorial_grid():
    """Working re-design of the reference's full_factorial (its version,
    sample.py:69-81, raises AxisError for every input — dead + broken code;
    ours builds the centered N//M-levels-per-axis cartesian grid)."""
    # M=1: exactly N cell-centered points in [0,1)
    X = sample.DOE.full_factorial(8, 1)
    np.testing.assert_allclose(X, ((np.arange(8) + 0.5) / 8)[:, None])
    # M=3, N=27 -> 9 levels per axis -> 9**3 grid points
    X = sample.DOE.full_factorial(27, 3)
    assert X.shape == (9 ** 3, 3)
    assert np.all((X > 0) & (X < 1))
    # every point unique, every axis takes exactly 9 distinct values
    assert len(np.unique(X.round(12), axis=0)) == 9 ** 3
    for ax in range(3):
        assert len(np.unique(X[:, ax])) == 9
    # M=2, N=10 -> 5 levels/axis, marginal counts balanced
    X = sample.DOE.full_factorial(10, 2)
    assert X.shape == (25, 2)
    with pytest.raises(ValueError):
        sample.DOE.full_factorial(2, 3)


def test_un_rotate_folds(tmp_path):
    """un_rotate_folds clones fold K as an un-rotated fold K+1: the clone's
    cumulative rotation collapses to identity, its test.csv is re-written in
    raw units, and undo_from.csv lands at the repository root (behavioral
    parity with reference sample.py:203-211)."""
    from romcomma_tpu.user import functions
    np.random.seed(0)
    variance = sample.GaussianNoise.Variance(len(functions.ISHIGAMI), 0.05,
                                             is_determined=False)
    fn = sample.Function(tmp_path, sample.DOE.latin_hypercube,
                         functions.ISHIGAMI, 16, 3, variance, None, True,
                         seed=7)
    repo = fn.repo.into_K_folds(2).rotate_folds(sample.permute_axes([1, 2, 0]))
    K = repo.K
    fn.un_rotate_folds()
    from romcomma_tpu.data.storage import Fold
    clone = Fold(repo, K + 1)
    np.testing.assert_allclose(clone.X_rotation, np.eye(3), atol=1e-12)
    # clone test.csv holds de-normalized values of the rotated fold's test data
    source = Fold(repo, K)
    assert (repo.folder / 'undo_from.csv').exists()
    expected = source.normalization.undo_from(source.test_data.df).values
    import pandas as pd
    written = pd.read_csv(repo.folder / 'undo_from.csv', header=[0, 1],
                          index_col=0).values
    np.testing.assert_allclose(written, np.asarray(expected, dtype=float),
                               rtol=1e-10)


def test_permute_axes_rotation():
    # R = eye[new_order, :] exactly as the reference builds it (sample.py:38-46)
    R = sample.permute_axes([2, 0, 1])
    np.testing.assert_allclose(R, np.eye(3)[[2, 0, 1], :])
    x = np.arange(3.0)[None, :]
    np.testing.assert_allclose(x @ R, [[1.0, 2.0, 0.0]])
    assert abs(abs(np.linalg.det(R)) - 1.0) < 1e-12
    assert sample.permute_axes(None) is None
