"""Storage-layer tests: Repository/Fold/Normalization formats and semantics."""

import json

import numpy as np
import pandas as pd
import pytest

from romcomma_tpu.data.storage import Fold, Normalization, Repository


def _make_df(N=24, M=3, L=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(size=(N, M))
    Y = rng.normal(size=(N, L))
    columns = ([('X', f'X.{i}') for i in range(M)] + [('Y', f'Y.{i}') for i in range(L)])
    return pd.DataFrame(np.concatenate([X, Y], axis=1),
                        columns=pd.MultiIndex.from_tuples(columns), dtype=float)


def test_repository_roundtrip(tmp_root):
    df = _make_df()
    repo = Repository.from_df(tmp_root / 'repo', df)
    assert repo.N == 24 and repo.M == 3 and repo.L == 2
    again = Repository(tmp_root / 'repo')
    np.testing.assert_allclose(again.X.values, df['X'].values)
    np.testing.assert_allclose(again.Y.values, df['Y'].values)
    meta = json.loads((tmp_root / 'repo' / 'meta.json').read_text())
    assert meta['data'] == {'X_heading': 'X', 'Y_heading': 'Y', 'N': 24, 'M': 3, 'L': 2}
    assert {'csv_kwargs', 'K', 'shuffle before folding'} <= set(meta)


def test_into_K_folds_improper_fold(tmp_root):
    repo = Repository.from_df(tmp_root / 'repo', _make_df()).into_K_folds(2)
    assert repo.K == 2
    assert list(repo.folds) == [0, 1, 2]          # improper fold indexed K
    improper = Fold(repo, 2)
    assert improper.data.df.shape[0] == 24        # trains on all data
    assert improper.test_data.df.shape[0] == 24   # and tests on all data
    f0, f1 = Fold(repo, 0), Fold(repo, 1)
    assert f0.data.df.shape[0] + f0.test_data.df.shape[0] == 24
    assert f0.test_data.df.shape[0] + f1.test_data.df.shape[0] == 24


def test_into_negative_K_folds_suppresses_improper(tmp_root):
    repo = Repository.from_df(tmp_root / 'repo', _make_df()).into_K_folds(-2)
    assert repo.K == 2
    assert list(repo.folds) == [0, 1]
    assert not repo.fold_folder(2).exists()


def test_normalization_gaussianizes_and_inverts(tmp_root):
    repo = Repository.from_df(tmp_root / 'repo', _make_df(N=200)).into_K_folds(-1)
    fold = Fold(repo, 0)
    # X normalized columns should be roughly N(0,1); Y standardized.
    X = fold.X.values
    assert np.all(np.abs(np.mean(X, axis=0)) < 0.3)
    Y = fold.Y.values
    np.testing.assert_allclose(np.mean(Y, axis=0), 0, atol=1e-12)
    np.testing.assert_allclose(np.std(Y, axis=0, ddof=1), 1, rtol=1e-12)
    # normalization.csv rows
    norm = pd.read_csv(fold.folder / 'normalization.csv', header=[0, 1], index_col=0)
    assert list(norm.index) == ['mean', 'std', 'rng', 'min', 'max']
    # undo_from recovers the original data (train == all data here), except X
    # values clipped at the uniform margin (outside mean +- std*sqrt(3)) —
    # the same non-invertibility the reference has.
    recovered = fold.normalization.undo_from(fold.data.df)
    orig = Repository(tmp_root / 'repo').data.df
    stats = norm
    X_min = stats.iloc[stats.index.get_loc('min'), :3].values
    X_max = stats.iloc[stats.index.get_loc('max'), :3].values
    interior = (orig.values[:, :3] > X_min) & (orig.values[:, :3] < X_max)
    np.testing.assert_allclose(recovered.values[:, :3][interior],
                               orig.values[:, :3][interior], atol=1e-7)
    np.testing.assert_allclose(recovered.values[:, 3:], orig.values[:, 3:], atol=1e-7)


def test_fold_rotation_is_cumulative(tmp_root):
    repo = Repository.from_df(tmp_root / 'repo', _make_df()).into_K_folds(-1)
    fold = Fold(repo, 0)
    X0 = fold.X.values.copy()
    theta = np.deg2rad(30)
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
    fold.X_rotation = R
    fold2 = Fold(repo, 0)
    np.testing.assert_allclose(fold2.X_rotation, R, atol=1e-12)
    fold2.X_rotation = R
    fold3 = Fold(repo, 0)
    np.testing.assert_allclose(fold3.X_rotation, R @ R, atol=1e-12)
    np.testing.assert_allclose(fold3.X.values, X0 @ (R @ R).T, atol=1e-10)


def test_rotate_folds_invalid_matrix_falls_back_to_random_rotation(tmp_root):
    repo = Repository.from_df(tmp_root / 'repo', _make_df()).into_K_folds(-1)
    repo.rotate_folds(np.ones((3, 3)))  # not orthogonal
    rot = Fold(repo, 0).X_rotation
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-10)
    assert not np.allclose(rot, np.eye(3))


def test_Y_split(tmp_root):
    repo = Repository.from_df(tmp_root / 'repo', _make_df())
    repo.Y_split()
    splits = dict(repo.Y_splits)
    assert set(splits) == {0, 1}
    sub = Repository(splits[0])
    assert sub.L == 1 and sub.M == 3


def test_Y_split_raises_on_fold(tmp_root):
    repo = Repository.from_df(tmp_root / 'repo', _make_df()).into_K_folds(-1)
    with pytest.raises(TypeError):
        Fold(repo, 0).Y_split()


def test_into_K_folds_bad_K_raises(tmp_root):
    repo = Repository.from_df(tmp_root / 'repo', _make_df())
    with pytest.raises(IndexError):
        repo.into_K_folds(0)
    with pytest.raises(IndexError):
        repo.into_K_folds(25)
