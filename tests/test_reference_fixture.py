"""Pinned deterministic numeric regression fixture (VERDICT r3 missing #2).

Reproduces the reference's gpf test configuration (gpf/tests.py:41-82): the
10x5 dataset data = linspace(1, 50, 50).reshape(5, 10).T with X = data[:, :3],
Y = data[:, 3:], RBF kernel variance 0.5 per output, lengthscales 0.01 / 0.03,
Gaussian noise 1e-4 per output — and pins HARD-CODED expected f64 constants
for LML, predict, and Sobol' S/V.

Provenance of the constants:
  - LML / predict literals were derived INDEPENDENTLY with plain numpy f64
    (standard GP closed forms: lml = -0.5 y'K_n^{-1}y - log|chol| - N/2 log2pi,
    mean = K K_n^{-1} y, fvar = k* - ||chol^{-1}K*||^2). At these lengthscales
    every off-diagonal gram entry underflows to exactly 0.0 in f64, so the
    values are immune to reduction-order drift — tolerance 1e-10 is safe.
  - The Sobol' S/V literals pin the repo's own f64 output on 2026-08-20
    (jax CPU, x64): drift insurance the tolerance-vs-self suite cannot give.
A silent numerics change (XLA upgrade altering fusion/reduction order,
dtype-policy regression) fails this file before any behavioral test notices.
"""

import numpy as np
import pandas as pd
import pytest

from romcomma_tpu.models import gp
from romcomma_tpu.models.params import variant_init, variant_mask, variant_constrain


def _fixture_data():
    data = np.linspace(1, 50, 50).reshape(5, 10).T
    return data[:, :3], data[:, 3:]


def _fixture_raw():
    return variant_init(np.array([0.5, 0.5]),
                        np.array([[0.01] * 3, [0.03] * 3]),
                        np.array([1e-4, 1e-4]))


# ------------------------- hard-pinned f64 constants ------------------------ #

LML_PER_OUTPUT = np.array([-12688.188156627799, -20786.56848056301])
LML_TOTAL = -33474.75663719082

# mean = y * k/(k + noise) exactly (diagonal gram): pinned in full.
MEAN_FACTOR = 0.5 / 0.5001                 # = 5000/5001
F_VARIANCE = 9.998000399924489e-05         # 0.5 - 0.25/0.5001, all entries

# Converged endpoint of the ftol/gtol-terminated L-BFGS descent on the same
# fixture (the reference optimizes with lengthscales trainable). The optimum
# has a mild variance/noise trade-off flat direction, so the pin is loose.
LML_CONVERGED = np.array([-49.91733722724341, -52.38639412551019])

# Sobol' S and V (kind FIRST_ORDER, m columns 0..2) for the same model built
# through the MODEL layer (fold-normalized data), L=2 outputs -> (2,2,3).
SOBOL_S = np.array([
    [[0.00011586668601289] * 3, [0.00026915639341253] * 3],
    [[0.00026915639341253] * 3, [0.00104198552572745] * 3]])
SOBOL_V = np.array([
    [[8.280150534186196e-11] * 3, [9.993614286236005e-10] * 3],
    [[9.993614286236005e-10] * 3, [2.010100657216467e-08] * 3]])


def test_pinned_lml():
    X, Y = _fixture_data()
    lml = np.asarray(gp.lml_variant(_fixture_raw(), X, Y))
    np.testing.assert_allclose(lml, LML_PER_OUTPUT, rtol=1e-10)
    np.testing.assert_allclose(lml.sum(), LML_TOTAL, rtol=1e-10)


def test_pinned_predict():
    X, Y = _fixture_data()
    mean, fvar = map(np.asarray,
                     gp.predict_variant(_fixture_raw(), X, Y, X,
                                        y_instead_of_f=False))
    np.testing.assert_allclose(mean, Y * MEAN_FACTOR, rtol=1e-10)
    np.testing.assert_allclose(fvar, np.full((10, 2), F_VARIANCE), rtol=1e-10)
    # predict_y adds back exactly the noise variance
    _, yvar = map(np.asarray,
                  gp.predict_variant(_fixture_raw(), X, Y, X,
                                     y_instead_of_f=True))
    np.testing.assert_allclose(yvar - fvar, np.full((10, 2), 1e-4), rtol=1e-10)


def test_pinned_convergence_endpoint():
    X, Y = _fixture_data()
    _, lml, iters = gp.calibrate_variant(_fixture_raw(), variant_mask(), X, Y,
                                         maxiter=5000, gtol=1e-16)
    np.testing.assert_allclose(np.asarray(lml), LML_CONVERGED, rtol=1e-5)
    assert np.all(np.asarray(iters) < 200)


def test_pinned_sobol(tmp_path):
    """Model-layer + GSA drift canary: construct the fixture repository on
    disk (deterministic — no RNG anywhere), build the fixture MOGP, and pin
    the full-precision f64 first-order Sobol' S and V."""
    from romcomma_tpu.data.storage import Repository, Fold
    from romcomma_tpu.models.gpr import MOGP
    from romcomma_tpu.gsa.calibrators import marginalize_all_kinds
    from romcomma_tpu.gsa.models import GSA, Sobol

    data = np.linspace(1, 50, 50).reshape(5, 10).T
    cols = pd.MultiIndex.from_tuples([('X', f'x{i}') for i in range(3)]
                                     + [('Y', f'y{i}') for i in range(2)])
    repo = Repository.from_df(tmp_path / 'repo', pd.DataFrame(data, columns=cols))
    repo.into_K_folds(1)
    mogp = MOGP('fix.v.a', Fold(repo, 0), False, False, False,
                kernel_parameters={'variance': 0.5 * np.ones((1, 2)),
                                   'lengthscales': np.array([[0.01] * 3,
                                                             [0.03] * 3])},
                likelihood_variance=1e-4 * np.ones((1, 2)))
    sobol = Sobol(mogp, GSA.Kind.FIRST_ORDER, -1, False)
    by_kind, _ = marginalize_all_kinds(mogp,
                                       {sobol.kind.name: tuple(sobol._m_dataset)},
                                       False, **sobol.meta)
    np.testing.assert_allclose(np.asarray(by_kind['FIRST_ORDER']['S']),
                               SOBOL_S, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(by_kind['FIRST_ORDER']['V']),
                               SOBOL_V, rtol=1e-6)
