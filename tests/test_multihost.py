"""Multi-host fold distribution: launcher-driven partitioning produces the
same aggregate results as a single-process run (the CSV tree is the
coordination-free medium — SURVEY.md §2.4 'communication backend' row)."""

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from romcomma_tpu import user
from romcomma_tpu.data.storage import Repository
from romcomma_tpu.parallel import multihost


def _repo(root, N=60, K=2):
    noise = user.sample.GaussianNoise.Variance(2, 0.05, False, True)
    fn = user.functions.ISHIGAMI.subVector('i2', ['standard', 'sin'])
    return user.sample.Function(root, user.sample.DOE.latin_hypercube,
                                fn, N, 3, noise, None, True).repo.into_K_folds(K)


def _env(pid, nproc):
    os.environ['ROMCOMMA_PROCESS_ID'] = str(pid)
    os.environ['ROMCOMMA_NUM_PROCESSES'] = str(nproc)


@pytest.fixture(autouse=True)
def _clean_env():
    yield
    os.environ.pop('ROMCOMMA_PROCESS_ID', None)
    os.environ.pop('ROMCOMMA_NUM_PROCESSES', None)


def test_share_partition_disjoint_exhaustive():
    _env(0, 3)
    items = list(range(10))
    shares = [multihost.my_share(items, process_id=p, num_processes=3)
              for p in range(3)]
    assert sorted(sum(shares, [])) == items
    assert all(not set(a) & set(b) for i, a in enumerate(shares)
               for b in shares[i + 1:])


def test_multihost_matches_single_process(tmp_path):
    # Single-process ground truth.
    repo1 = _repo(tmp_path / 'single')
    user.run.gpr('gpr', repo1, is_read=False, is_covariant=False,
                 is_isotropic=False, ignore_exceptions=False)
    # Two launcher-driven "processes" (sequential here; on a cluster these
    # are separate tasks on a shared filesystem), then one collect.
    # Same DATASET (the DOE is random per call): copy the tree, drop models.
    import shutil
    src = Path(repo1.folder)
    dst = tmp_path / 'multi' / src.name
    shutil.copytree(src, dst,
                    ignore=shutil.ignore_patterns('gpr.*', 'gpr'))
    repo2 = Repository(dst)
    names = []
    seen = []
    for pid in range(2):
        _env(pid, 2)
        assert multihost.process_identity() == (pid, 2)
        folds = multihost.my_folds(repo2)
        seen += folds
        names = multihost.gpr('gpr', repo2, is_read=False, is_covariant=False,
                              is_isotropic=False, ignore_exceptions=False) or names
    assert sorted(seen) == list(repo2.folds)         # disjoint + exhaustive
    multihost.collect_gpr(['gpr.v.a'], repo2)
    for agg in ['gpr.v.a/test_summary.csv', 'gpr.v.a/likelihood/log_marginal.csv']:
        a = pd.read_csv(Path(repo1.folder) / agg)
        b = pd.read_csv(Path(repo2.folder) / agg)
        assert a.shape == b.shape
        num_a = a.select_dtypes('number').to_numpy()
        num_b = b.select_dtypes('number').to_numpy()
        np.testing.assert_allclose(num_a, num_b, rtol=1e-7, atol=1e-9)


def test_barrier_noop_in_launcher_mode():
    _env(1, 4)
    multihost.barrier()          # must not require connectivity
