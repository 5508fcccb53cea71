"""Second analytic GSA oracle: the Sobol' G* function (alpha=2).

For g*(x) = prod_i ((1+alpha)|2x_i - 1|^alpha + a_i) / (1 + a_i) on U[0,1]^M:
  V_i = alpha^2 / ((1 + 2 alpha) (1 + a_i)^2)
  V   = prod_i (1 + V_i) - 1,   S_i = V_i / V
(Sobol indices are invariant under the per-coordinate monotone U[0,1]->N(0,1)
normalization the pipeline applies.)
"""

import numpy as np
import pandas as pd
import pytest

from romcomma_tpu.user import functions, run, sample


A = np.array([0.0, 1.0, 9.0])
ALPHA = 2.0


def _analytic_first_order():
    Vi = ALPHA ** 2 / ((1 + 2 * ALPHA) * (1 + A) ** 2)
    V = np.prod(1 + Vi) - 1
    return Vi / V


@pytest.fixture(scope='module')
def repo(tmp_path_factory):
    np.random.seed(1)
    import random
    random.seed(1)
    root = tmp_path_factory.mktemp('gsa_g')
    vec = functions.Vector(name='gstar',
                           g=functions.Scalar(call=functions.sobol_g, loc=0,
                                              scale=1, m=3, a=A,
                                              alpha=np.full(3, ALPHA)))
    noise = sample.GaussianNoise.Variance(1, 0.02, False, True)
    repo = sample.Function(root, sample.DOE.latin_hypercube, vec, 400, 3, noise,
                           overwrite_existing=True).repo.into_K_folds(-1)
    run.gpr('gpr', repo, is_read=False, is_covariant=False, is_isotropic=False,
            ignore_exceptions=False)
    run.gsa('gpr', repo, is_covariant=False, is_isotropic=False,
            is_error_calculated=False, ignore_exceptions=False)
    return repo


def test_first_order_matches_analytic_sobol_g(repo):
    df = pd.read_csv(repo.fold_folder(0) / 'gpr.v.a' / 'gsa' / 'first_order' / 'S.csv')
    got = df.iloc[0, 2:5].to_numpy(dtype=float)       # S_0, S_1, S_2 columns
    want = _analytic_first_order()
    np.testing.assert_allclose(got, want, atol=0.08)
    # a = (0, 1, 9): importance must be strictly ordered
    assert got[0] > got[1] > got[2] >= 0
