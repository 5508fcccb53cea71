"""Golden-file test: the on-disk tree produced by the full workflow matches
the reference's persistence format (SURVEY.md §2.3) file for file."""

import json
from pathlib import Path

import numpy as np
import pytest

from romcomma_tpu import user
from romcomma_tpu.data.storage import Fold


@pytest.fixture(scope='module')
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp('golden')
    noise_variance = user.sample.GaussianNoise.Variance(2, 0.1, False, True)
    repo = user.sample.Function(root, user.sample.DOE.latin_hypercube,
                                user.functions.ISHIGAMI.subVector('ish2', ['standard', 'sin']),
                                40, 3, noise_variance, None, True).repo.into_K_folds(1)
    user.run.gpr('gpr', repo, is_read=False, is_covariant=False,
                 is_isotropic=False, ignore_exceptions=False, maxiter=30)
    user.run.gsa('gpr', repo, is_covariant=False, is_isotropic=False,
                 is_error_calculated=True, ignore_exceptions=False, maxiter=30)
    return Path(repo.folder)


def test_repository_files(tree):
    assert (tree / 'data.csv').exists()
    meta = json.loads((tree / 'meta.json').read_text())
    assert {'data', 'K', 'shuffle before folding'} <= set(meta)
    assert meta['data']['N'] == 40 and meta['data']['M'] == 3 and meta['data']['L'] == 2
    # ground-truth noise persisted by sample.Function (reference sample.py:254)
    assert (tree / 'likelihood.variance.csv').exists()


def test_fold_files(tree):
    for k in (0, 1):  # K=1 -> fold.0 plus the improper fold.1
        fold = tree / f'fold.{k}'
        for f in ('data.csv', 'test.csv', 'meta.json', 'normalization.csv',
                  '__X_rotation.csv'):
            assert (fold / f).exists() or f == '__X_rotation.csv', (k, f)
    # normalization stats rows (reference data/storage.py:547-558)
    import pandas as pd
    norm = pd.read_csv(tree / 'fold.0' / 'normalization.csv', header=[0, 1],
                       index_col=0)
    assert list(norm.index[:5]) == ['mean', 'std', 'rng', 'min', 'max']


def test_model_files(tree):
    model = tree / 'fold.0' / 'gpr.v.a'
    for f in ('kernel.csv', 'meta.json', 'test.csv', 'test_summary.csv',
              'kernel/variance.csv', 'kernel/lengthscales.csv',
              'likelihood/variance.csv', 'likelihood/log_marginal.csv'):
        assert (model / f).exists(), f
    # kernel type tag frame, named after the Data field exactly like the
    # reference (gpr/models.py:95-107 NamedTuple field 'kernel' -> kernel.csv)
    import pandas as pd
    tag = pd.read_csv(model / 'kernel.csv', index_col=0).iloc[0, 0]
    assert tag == 'kernels.RBF'
    meta = json.loads((model / 'meta.json').read_text())
    assert 'result' in meta and 'kernel' in meta


def test_gsa_files(tree):
    for kind in ('first_order', 'closed', 'total'):
        gsa = tree / 'fold.0' / 'gpr.v.a' / 'gsa' / kind
        for f in ('S.csv', 'V.csv', 'T.csv', 'W.csv', 'meta.json'):
            assert (gsa / f).exists(), (kind, f)
        import pandas as pd
        S = pd.read_csv(gsa / 'S.csv', index_col=[0, 1])
        # columns: m indices 0..M-1 plus the final M column
        assert list(S.columns) == ['0', '1', '2', '3']


def test_aggregate_files(tree):
    # Collect-ed aggregates with provenance (reference user/run.py:62-66,134-137)
    import pandas as pd
    agg = tree / 'gpr.v.a'
    assert (agg / 'test_summary.csv').exists()
    assert (agg / 'gsa' / 'first_order' / 'S.csv').exists()
    df = pd.read_csv(agg / 'gsa' / 'first_order' / 'S.csv', header=0)
    assert 'fold' in df.columns[0].lower() or 'fold' in df.columns.tolist()
