"""The deterministic data-layer workload shared by the reference golden-tree
generator (make_reference_golden.py) and the byte-parity test
(tests/test_golden_tree.py).

Both the reference's romcomma.data.storage and this repo's
romcomma_tpu.data.storage expose the same creation API (from_df,
into_K_folds, rotate_folds, Y_split), so one driver runs either module and
the resulting CSV + meta.json trees must be byte-identical."""

from __future__ import annotations

import random
from pathlib import Path

import numpy as np
import pandas as pd

N, M, L = 23, 4, 2          # odd N exercises the partial round-robin block
DATA_SEED = 7
FOLD_SEED = 1234
ROTATION_SEED = 11


def input_df() -> pd.DataFrame:
    """A fixed (N, M+L) two-row-header frame."""
    rng = np.random.RandomState(DATA_SEED)
    X = rng.uniform(-1.0, 3.0, size=(N, M))
    Y = np.stack([np.sin(X).sum(axis=1), (X ** 2).sum(axis=1)], axis=1)
    Y += 0.01 * rng.standard_normal((N, L))
    columns = pd.MultiIndex.from_tuples([('X', f'X.{m}') for m in range(M)] +
                                        [('Y', f'Y.{l}') for l in range(L)])
    return pd.DataFrame(np.concatenate([X, Y], axis=1), columns=columns)


def rotation() -> np.ndarray:
    """A fixed orthogonal (M, M) rotation."""
    rng = np.random.RandomState(ROTATION_SEED)
    q, r = np.linalg.qr(rng.standard_normal((M, M)))
    return q * np.sign(np.diag(r))


def run(storage_module, root: Path) -> None:
    """Drive one data-layer implementation through the full workload."""
    Repository = storage_module.Repository
    df = input_df()

    random.seed(FOLD_SEED)
    repo = Repository.from_df(root / 'shuffled', df)
    repo.into_K_folds(K=3, shuffle_before_folding=True)   # K>0: improper fold too
    repo.rotate_folds(rotation())
    repo.Y_split()

    random.seed(FOLD_SEED)
    plain = Repository.from_df(root / 'plain', df)
    plain.into_K_folds(K=-2)                               # negative K: no improper fold

    random.seed(FOLD_SEED)
    single = Repository.from_df(root / 'single', df)
    single.into_K_folds(K=1)                               # K=1: fold trains on its test set
