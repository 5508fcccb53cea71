"""The deterministic MODEL-layer workload shared by the reference golden-tree
generator (make_reference_golden.py) and the byte-parity test
(tests/test_golden_tree.py).

Where workload.py pins the DATA layer's bytes, this pins the model tree:
the GPR model folder (kernel tag frame, kernel/likelihood parameter CSVs,
meta.json — reference gpr/models.py:95-132, base/classes.py:34-123) and the
GSA output frames (S/T/V/W float formatting and column/index layout —
reference gsa/models.py:102-115). Both implementations are driven through
their OWN persistence writers with the same planted values; the resulting
trees must be byte-identical.

The driver takes an *adapter* because only construction entry points differ
(the reference needs gpflow stubbed out); parameter replacement and meta
writing share the same attribute paths in both packages."""

from __future__ import annotations

from pathlib import Path

import numpy as np

L, M = 2, 4                         # matches workload.py's data tree
PLANT_SEED = 42

#: fixed GPR meta (the reference's MOGP.META plus a fixed result string —
#: real calibrations embed optimizer text here; the byte format is the point)
GPR_META = {'maxiter': 30, 'gtol': 1e-16,
            'result': 'golden: planted parameters, no optimizer run',
            'kernel': {'variance': True, 'covariance': False,
                       'lengthscales': {'variant': True, 'covariant': False}},
            'likelihood': {'variance': True, 'covariance': True}}


def planted() -> dict:
    """Deterministic 'optimized' parameter values and GSA results."""
    rng = np.random.RandomState(PLANT_SEED)
    p = {'kernel_variance': rng.uniform(0.5, 2.0, (1, L)),
         'lengthscales': rng.uniform(0.3, 3.0, (L, M)),
         'likelihood_variance': rng.uniform(0.01, 0.1, (1, L)),
         'log_marginal': rng.uniform(-100.0, 100.0, (1, L))}
    a = rng.standard_normal((L, L))
    p['likelihood_variance_LL'] = a @ a.T / 10.0 + np.eye(L)
    p['kernel_variance_LL'] = np.diag(rng.uniform(1.0, 2.0, L))
    # GSA: a full sweep (m=-1, S/T/V carry the appended m=M column, W does
    # not) and a single-m sweep whose 3-column S/V pin the [-1]+m_list
    # column-label branch (reference gsa/models.py:58-59).
    p['gsa_full'] = {k: rng.uniform(-1.0, 1.0, (L, L, M + 1))
                     for k in ('S', 'T', 'V')}
    p['gsa_full']['W'] = rng.uniform(-1.0, 1.0, (L, L, M))
    p['gsa_m1'] = {'S': rng.uniform(-1.0, 1.0, (L, L, 3)),
                   'T': rng.uniform(-1.0, 1.0, (L, L, 1)),
                   'V': rng.uniform(-1.0, 1.0, (L, L, 3)),
                   'W': rng.uniform(-1.0, 1.0, (L, L, 1))}
    return p


def run(adapter, root: Path) -> None:
    """Write the model layer into the data tree under ``root/'shuffled'``.

    The adapter provides:
      open_fold(folder, k)                       -> a Fold
      make_mogp(name, fold, is_covariant)        -> a constructed MOGP
      write_sobol(gp, kind_name, m, results)     -> compose+save GSA frames
    """
    p = planted()
    fold = adapter.open_fold(root / 'shuffled', 0)

    gp = adapter.make_mogp('gpr.v.a', fold, is_covariant=False)
    gp.kernel.data.replace(variance=p['kernel_variance'],
                           lengthscales=p['lengthscales'])
    gp.likelihood.data.replace(variance=p['likelihood_variance'],
                               log_marginal=p['log_marginal'])
    gp.write_meta(dict(GPR_META))

    gp_c = adapter.make_mogp('gpr.c.a', fold, is_covariant=True)
    gp_c.kernel.data.replace(variance=p['kernel_variance_LL'],
                             lengthscales=p['lengthscales'])
    gp_c.likelihood.data.replace(variance=p['likelihood_variance_LL'],
                                 log_marginal=p['log_marginal'])
    gp_c.write_meta(dict(GPR_META))

    adapter.write_sobol(gp, 'FIRST_ORDER', -1, p['gsa_full'])
    adapter.write_sobol(gp, 'TOTAL', 1, p['gsa_m1'])
