"""romcomma_tpu — a TPU-native JAX framework for Reduced Order Modelling via
Global Sensitivity Analysis using Gaussian Process Regression.

This is a ground-up TPU-first rebuild with the capabilities of the reference
``rom-comma`` library (see ``/root/reference``): CSV dataset -> k-fold
Repository with per-fold normalization -> multi-output GP regression
(ARD-RBF kernel, on-device L-BFGS marginal-likelihood optimization) ->
closed-form Sobol' sensitivity indices (first-order / closed / total, with
optional standard errors) -> iterative input-basis rotation (ROM).

Architecture (TPU-first, NOT a port):
  - ``ops``      pure jitted numerics: MXU-friendly ARD-RBF gram (matmul
                 expansion + Pallas tiled kernel), Cholesky/triangular
                 solves, log-marginal-likelihood, on-device L-BFGS.
  - ``models``   functional GP core (parameter pytrees, vmap over outputs)
                 plus thin persistent wrappers writing the reference's
                 CSV + meta.json tree for drop-in compatibility.
  - ``gsa``      closed-form Sobol' calibrators as fused jnp einsum chains
                 (no TF rank-6 limit workarounds needed under XLA).
  - ``rom``      input-basis rotation optimizer (the reference's dormant
                 ROM, re-designed and alive).
  - ``parallel`` jax.sharding Mesh helpers; N-sharded gram / fold-parallel
                 execution over ICI via pjit-inserted collectives.
  - ``data``     host-side Repository/Fold/Normalization persistence,
                 byte-compatible with the reference formats
                 (reference: romcomma/data/storage.py).
  - ``user``     orchestration API: run.gpr / run.gsa / run.rom, sampling,
                 test functions, results collection
                 (reference: romcomma/user/*).
"""

from romcomma_tpu.base import definitions as _definitions  # noqa: F401  (configures x64)
from romcomma_tpu import base, data, ops, models, gsa, rom, parallel, user  # noqa: F401

__version__ = '0.1.0'
