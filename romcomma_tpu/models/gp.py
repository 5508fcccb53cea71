"""Functional multi-output GP core: log-marginal likelihood, calibration,
prediction, and posterior factors — pure jitted functions over parameter
pytrees.

This replaces the reference's object web of gpflow models
(romcomma/gpf/models.py MOGPR + per-output gpflow GPRs built in
romcomma/gpr/models.py:332-343) with two code paths:

  - variant: L independent ARD-RBF GPs, vmapped over the output axis — the
    whole L-way Python loop of the reference collapses into one compiled
    batched computation, including L *independent* L-BFGS descents
    (matching the reference's per-GP scipy optimizations,
    gpr/models.py:359-361).
  - covariant: one (LN,LN) system with full (L,L) signal/noise covariances
    (reference math: gpf/models.py:73-82, gpf/likelihoods.py:64-67).

Shapes follow the reference conventions so the GSA layer can consume
``K_cho`` (L,N,N)|(LN,LN) and ``K_inv_Y`` (L,1,N) unchanged
(gpr/models.py:427-444).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from romcomma_tpu.ops.gram import (rbf_gram, rbf_gram_variant, rbf_gram_covariant,
                                   rbf_gram_covariant_unit)
from romcomma_tpu.ops.linalg import cholesky, tri_solve, cho_solve, add_diag, mvn_logpdf
from romcomma_tpu.ops import lbfgs
from romcomma_tpu.models.params import (VariantParams, CovariantParams,
                                        variant_constrain, covariant_constrain)


# --------------------------------------------------------------------------- #
# Variant path: L independent GPs, vmapped over outputs.
# --------------------------------------------------------------------------- #

def _noisy_chol_single(x, lengthscales, variance, noise):
    k = rbf_gram(x, x, lengthscales, variance)
    return cholesky(add_diag(k, noise))


def lml_single(raw: VariantParams, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """LML of ONE output's GP. raw leaves are unbatched: raw_variance scalar,
    raw_lengthscales (M,), raw_noise scalar. y: (N,)."""
    c = variant_constrain(raw)
    chol = _noisy_chol_single(x, c['lengthscales'], c['variance'], c['noise'])
    return jnp.sum(mvn_logpdf(y[:, None], jnp.zeros_like(y)[:, None], chol))


@jax.jit
def lml_variant(raw: VariantParams, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-output LML vector (L,). raw batched over L; y: (N,L). Jitted:
    called standalone (disk-consistency recompute, reload verification), and
    eager dispatch pays one host round-trip per op on tunnelled runtimes."""
    return jax.vmap(lml_single, in_axes=(VariantParams(0, 0, 0), None, 1))(raw, x, y)


def _calibrate_variant_core(raw: VariantParams, mask: VariantParams, x: jnp.ndarray,
                            y: jnp.ndarray, maxiter: int, gtol: float, ftol: float):
    """L independent on-device L-BFGS maximizations of the per-output LML.

    mask leaves are 0/1 floats switching trainability per the reference META
    system; frozen leaves never move. Returns (raw_opt, lml (L,), iters (L,)).

    x/y are cast to the params' working dtype: the params define the compute
    precision (f32 fast path vs f64 verification), and mixed dtypes would
    otherwise promote the objective under x64.
    """
    wd = jax.tree_util.tree_leaves(raw)[0].dtype
    x, y = x.astype(wd), y.astype(wd)

    def one(raw_l: VariantParams, y_l: jnp.ndarray):
        frozen = raw_l

        def objective(p: VariantParams) -> jnp.ndarray:
            eff = jax.tree_util.tree_map(
                lambda pv, fv, m: fv + m * (pv - fv), p, frozen, mask)
            value = -lml_single(eff, x, y_l)
            # +inf (not NaN) on factorization breakdown so the linesearch
            # backs off instead of poisoning the whole descent.
            return jnp.where(jnp.isfinite(value), value, jnp.inf)

        res = lbfgs.minimize(objective, raw_l, maxiter=maxiter, gtol=gtol, ftol=ftol)
        eff = jax.tree_util.tree_map(
            lambda pv, fv, m: fv + m * (pv - fv), res.params, frozen, mask)
        return eff, -res.value, res.iterations

    return jax.vmap(one, in_axes=(VariantParams(0, 0, 0), 1))(raw, y)


@partial(jax.jit, static_argnames=('maxiter',))
def calibrate_variant(raw: VariantParams, mask: VariantParams, x: jnp.ndarray,
                      y: jnp.ndarray, maxiter: int = 5000, gtol: float = 1e-16,
                      ftol: float = lbfgs.SCIPY_FTOL):
    """One fold's variant calibration (see _calibrate_variant_core)."""
    return _calibrate_variant_core(raw, mask, x, y, maxiter, gtol, ftol)


@partial(jax.jit, static_argnames=('maxiter',))
def calibrate_variant_folds(raws: VariantParams, mask: VariantParams,
                            xs: jnp.ndarray, ys: jnp.ndarray,
                            maxiter: int = 5000, gtol: float = 1e-16,
                            ftol: float = lbfgs.SCIPY_FTOL):
    """K same-shape folds calibrated as ONE batched computation — the latent
    fold axis the reference loops in Python (user/run.py:60-61; SURVEY §2.4
    'embarrassing parallelism, unexploited'). raw leaves are stacked on a
    leading fold axis; xs (K,N,M); ys (K,N,L). Returns per-fold stacked
    (raw_opt, lml (K,L), iters (K,L))."""
    return jax.vmap(
        lambda r, x, y: _calibrate_variant_core(r, mask, x, y, maxiter, gtol, ftol),
        in_axes=(VariantParams(0, 0, 0), 0, 0))(raws, xs, ys)


@partial(jax.jit, static_argnames=('y_instead_of_f',))
def predict_variant(raw: VariantParams, x: jnp.ndarray, y: jnp.ndarray,
                    xs: jnp.ndarray, y_instead_of_f: bool = True
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior mean/variance at xs. Returns (mean (o,L), var (o,L))."""
    c = variant_constrain(raw)
    K = rbf_gram_variant(x, x, c['lengthscales'], c['variance'])        # (L,N,N)
    chol = cholesky(K + c['noise'][:, None, None] * jnp.eye(x.shape[0], dtype=x.dtype))
    Ks = rbf_gram_variant(x, xs, c['lengthscales'], c['variance'])      # (L,N,o)
    A = tri_solve(chol, Ks)                                             # (L,N,o)
    alpha = tri_solve(chol, y.T[..., None])                             # (L,N,1)
    mean = jnp.einsum('lno,lni->ol', A, alpha)
    # Clamp at zero against f32 cancellation (predictive var is >= 0 exactly).
    var_f = jnp.maximum(c['variance'][None, :] - jnp.einsum('lno,lno->ol', A, A), 0.0)
    var = var_f + (c['noise'][None, :] if y_instead_of_f else 0.0)
    return mean, var


@partial(jax.jit, static_argnames=('y_instead_of_f',))
def predict_variant_from_factors(raw: VariantParams, K_cho: jnp.ndarray,
                                 K_inv_Y: jnp.ndarray, x: jnp.ndarray,
                                 xs: jnp.ndarray, y_instead_of_f: bool = True
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior mean/variance at xs reusing a cached factorization — the
    chunk kernel behind GPR.predict: only O(N o) work per call, so large test
    sets stream through in bounded memory instead of one O(N^2 + N o)
    program."""
    c = variant_constrain(raw)
    Ks = rbf_gram_variant(x, xs, c['lengthscales'], c['variance'])      # (L,N,o)
    mean = jnp.einsum('lno,lin->ol', Ks, K_inv_Y)
    # The variance solve runs in the WORKING dtype: the posterior mean (via
    # the f64 K_inv_Y) is the accuracy-critical output; XLA's f64 TRSM
    # expander needs ~19 GB at N=12k and f64 emulation costs minutes there.
    # In the f32 fast path the predictive SD is therefore approximate at
    # high condition numbers (clamped at the noise floor below).
    A = tri_solve(K_cho.astype(Ks.dtype), Ks)                           # (L,N,o)
    var_f = jnp.maximum(c['variance'][None, :] - jnp.einsum('lno,lno->ol', A, A), 0.0)
    var = var_f + (c['noise'][None, :] if y_instead_of_f else 0.0)
    var = var.astype(mean.dtype)
    return mean, var


def _tree64(tree):
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float64), tree)


# Staged f64 posterior pipeline for large N: one jitted program holding the
# whole gram->cholesky->solve chain keeps ~15+ N^2 f64 buffers alive at once
# (measured OOM at N=12k on a 16 GB chip); three stages with donated inputs
# bound the peak at ~4 buffers.

@jax.jit
def _gram64_noisy_variant(raw: VariantParams, x: jnp.ndarray) -> jnp.ndarray:
    c = variant_constrain(_tree64(raw))
    x64 = jnp.asarray(x, jnp.float64)
    K = rbf_gram_variant(x64, x64, c['lengthscales'], c['variance'])
    return K + c['noise'][:, None, None] * jnp.eye(x.shape[0], dtype=K.dtype)


@partial(jax.jit, donate_argnums=(0,))
def _chol64(Kn: jnp.ndarray) -> jnp.ndarray:
    return cholesky(Kn)


@jax.jit
def _kiy64(chol: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    k_inv_y = cho_solve(chol, jnp.asarray(y, jnp.float64).T[..., None])
    return jnp.swapaxes(k_inv_y, -1, -2)


def posterior_factors_variant_staged(raw: VariantParams, x: jnp.ndarray,
                                     y: jnp.ndarray):
    """Same result as posterior_factors_variant, bounded peak memory."""
    chol = _chol64(_gram64_noisy_variant(raw, x))
    return chol, _kiy64(chol, y)


@jax.jit
def posterior_factors_variant(raw: VariantParams, x: jnp.ndarray, y: jnp.ndarray):
    """(K_cho (L,N,N), K_inv_Y (L,1,N)) — the GSA inputs (gpr/models.py:427-444).

    ALWAYS computed and returned in float64: an f32 Cholesky breaks down
    once cond(K) ~ N s2 / noise crosses 1/eps_f32 (measured: garbage Sobol'
    indices at N=12k), the GSA contractions downstream cancel catastrophically
    unless their inputs carry f64 precision, and this one-off O(N^3) is cheap
    next to the training loop even under TPU f64 emulation."""
    c = variant_constrain(_tree64(raw))
    x64, y64 = jnp.asarray(x, jnp.float64), jnp.asarray(y, jnp.float64)
    K = rbf_gram_variant(x64, x64, c['lengthscales'], c['variance'])
    chol = cholesky(K + c['noise'][:, None, None] * jnp.eye(x.shape[0], dtype=K.dtype))
    k_inv_y = cho_solve(chol, y64.T[..., None])                         # (L,N,1)
    return chol, jnp.swapaxes(k_inv_y, -1, -2)                          # (L,1,N)


# --------------------------------------------------------------------------- #
# Covariant path: one (LN,LN) system.
# --------------------------------------------------------------------------- #

def _covariant_noisy_K(c: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """(LN,LN) noisy gram: K + Sigma kron I_N (gpf/likelihoods.py:64-67)."""
    L = c['lengthscales'].shape[0]
    N = x.shape[0]
    K4 = rbf_gram_covariant(x, x, c['lengthscales'], c['F'])            # (L,N,L,N)
    noise4 = c['noise_cov'][:, None, :, None] * jnp.eye(N, dtype=x.dtype)[None, :, None, :]
    return (K4 + noise4).reshape(L * N, L * N)


@jax.jit
def lml_covariant(raw: CovariantParams, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """LML of the covariant MOGP. y: (N,L), internally stacked to (LN,1)
    output-major exactly like the reference (gpf/models.py:130). Jitted —
    see lml_variant."""
    c = covariant_constrain(raw)
    Kn = _covariant_noisy_K(c, x)
    chol = cholesky(Kn)
    yy = y.T.reshape(-1, 1)
    return jnp.sum(mvn_logpdf(yy, jnp.zeros_like(yy), chol))


def _covariant_objective(raw: CovariantParams, mask: CovariantParams,
                         x: jnp.ndarray, y: jnp.ndarray, ls_frozen: bool):
    """Masked negative-LML objective closure for covariant calibration.

    With ``ls_frozen`` (the reference's DEFAULT covariant configuration,
    gpr/kernels.py:54-57) the unit-variance gram is computed ONCE outside the
    objective and closed over — the TPU-native equivalent of the reference's
    K_unit_variance cache (gpf/kernels.py:74-104, used at gpf/models.py:67-68):
    inside a fused lax.while_loop descent XLA hoists the loop-invariant gram,
    and on the host-paced path it is literally a staged constant. Only the
    O((LN)^3) factorization remains per evaluation; the O(L^2 N^2 M) gram
    drops out of the loop."""
    frozen = raw
    L = raw.raw_lengthscales.shape[0]
    N = x.shape[0]
    eye_N = jnp.eye(N, dtype=x.dtype)
    unit = (rbf_gram_covariant_unit(x, covariant_constrain(raw)['lengthscales'])
            if ls_frozen else None)
    if ls_frozen:
        # ls_frozen closes the unit gram over the INITIAL lengthscales, so
        # a mask that still marks them trainable would silently yield a
        # zero ls-gradient against a stale gram. Force the two consistent:
        # frozen gram <=> frozen lengthscales, by construction.
        mask = mask._replace(
            raw_lengthscales=jnp.zeros_like(mask.raw_lengthscales))
    yy = y.T.reshape(-1, 1)

    def objective(p: CovariantParams) -> jnp.ndarray:
        eff = jax.tree_util.tree_map(
            lambda pv, fv, m: fv + m * (pv - fv), p, frozen, mask)
        c = covariant_constrain(eff)
        if ls_frozen:
            K4 = c['F'][:, None, :, None] * unit
            noise4 = c['noise_cov'][:, None, :, None] * eye_N[None, :, None, :]
            Kn = (K4 + noise4).reshape(L * N, L * N)
        else:
            Kn = _covariant_noisy_K(c, x)
        chol = cholesky(Kn)
        return -jnp.sum(mvn_logpdf(yy, jnp.zeros_like(yy), chol))

    def merge(p: CovariantParams) -> CovariantParams:
        return jax.tree_util.tree_map(
            lambda pv, fv, m: fv + m * (pv - fv), p, frozen, mask)

    return objective, merge


@partial(jax.jit, static_argnames=('maxiter', 'ls_frozen'))
def calibrate_covariant(raw: CovariantParams, mask: CovariantParams,
                        x: jnp.ndarray, y: jnp.ndarray, maxiter: int = 5000,
                        gtol: float = 1e-16, ftol: float = lbfgs.SCIPY_FTOL,
                        ls_frozen: bool = False):
    wd = jax.tree_util.tree_leaves(raw)[0].dtype
    x, y = x.astype(wd), y.astype(wd)
    objective, merge = _covariant_objective(raw, mask, x, y, ls_frozen)
    res = lbfgs.minimize(objective, raw, maxiter=maxiter, gtol=gtol, ftol=ftol)
    return merge(res.params), -res.value, res.iterations


def calibrate_covariant_host(raw: CovariantParams, mask: CovariantParams,
                             x: jnp.ndarray, y: jnp.ndarray, maxiter: int = 5000,
                             gtol: float = 1e-16, ftol: float = lbfgs.SCIPY_FTOL,
                             ls_frozen: bool = False):
    """Host-paced covariant calibration for large LN: scipy L-BFGS-B over ONE
    jitted value+grad program per evaluation. The fused whole-descent program
    exceeds XLA TPU compiler limits near LN~20k (CLAUDE.md; ops/lbfgs.py:121-124)
    while the single-evaluation program stays compilable — the same policy as
    the variant dense route (parallel/distributed.py DENSE_DIRECT path)."""
    wd = jax.tree_util.tree_leaves(raw)[0].dtype
    x, y = x.astype(wd), y.astype(wd)
    objective, merge = _covariant_objective(raw, mask, x, y, ls_frozen)
    res = lbfgs.minimize_scipy(objective, raw, maxiter=maxiter, gtol=gtol, ftol=ftol)
    return merge(res.params), -res.value, res.iterations


@partial(jax.jit, static_argnames=('y_instead_of_f',))
def predict_covariant(raw: CovariantParams, x: jnp.ndarray, y: jnp.ndarray,
                      xs: jnp.ndarray, y_instead_of_f: bool = True
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior mean/variance at xs for the covariant MOGP.
    Returns (mean (o,L), var (o,L)) — the diagonal (over both output and
    sample) of the full predictive covariance, matching the reference's
    predict_y path (gpf/models.py:84-111 with full_cov=full_output_cov=False)."""
    c = covariant_constrain(raw)
    L = c['lengthscales'].shape[0]
    N, o = x.shape[0], xs.shape[0]
    Kn = _covariant_noisy_K(c, x)
    chol = cholesky(Kn)
    Kmn = rbf_gram_covariant(x, xs, c['lengthscales'], c['F']).reshape(L * N, L * o)
    A = tri_solve(chol, Kmn)                                            # (LN,Lo)
    alpha = tri_solve(chol, y.T.reshape(-1, 1))                         # (LN,1)
    mean = (A.T @ alpha).reshape(L, o).T                                # (o,L)
    # Diagonal of k(xs,xs): per (l,sample) it is F[l,l].
    knn_diag = jnp.broadcast_to(jnp.diag(c['F'])[:, None], (L, o))
    var_f = jnp.maximum((knn_diag - jnp.sum(A * A, axis=0).reshape(L, o)).T, 0.0)
    var = var_f + (jnp.diag(c['noise_cov'])[None, :] if y_instead_of_f else 0.0)
    return mean, var


@partial(jax.jit, static_argnames=('full_cov', 'full_output_cov'))
def predict_covariant_full(raw: CovariantParams, x: jnp.ndarray, y: jnp.ndarray,
                           xs: jnp.ndarray, full_cov: bool = False,
                           full_output_cov: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-covariance latent prediction p(f*|Y) for the covariant MOGP,
    matching the reference's predict_f shape semantics exactly
    (gpf/models.py:84-111), including the ``full_cov => full_output_cov``
    rule. Returns (mean (n,L), var):

        full_cov=False, full_output_cov=False -> var (n,L)
        full_cov=False, full_output_cov=True  -> var (n,L,L)
        full_cov=True  (forces full_output_cov) -> var (n,n,L,L)

    Latent f: no noise is added (the reference's predict_f is f, not y)."""
    full_output_cov = True if full_cov else full_output_cov
    c = covariant_constrain(raw)
    L = c['lengthscales'].shape[0]
    N, n = x.shape[0], xs.shape[0]
    chol = cholesky(_covariant_noisy_K(c, x))
    Kmn = rbf_gram_covariant(x, xs, c['lengthscales'], c['F']).reshape(L * N, L * n)
    A = tri_solve(chol, Kmn)                                            # (LN,Ln)
    alpha = tri_solve(chol, y.T.reshape(-1, 1))                         # (LN,1)
    mean = (A.T @ alpha).reshape(L, n).T                                # (n,L)
    Knn = rbf_gram_covariant(xs, xs, c['lengthscales'], c['F'])         # (L,n,L,n)
    f_var = Knn - (A.T @ A).reshape(L, n, L, n)
    if full_output_cov:
        f_var = jnp.einsum('LNln -> LlNn', f_var)                       # (L,L,n,n)
    else:
        f_var = jnp.einsum('LNLn -> LNn', f_var)                        # (L,n,n)
    if not full_cov:
        f_var = jnp.einsum('...NN -> ...N', f_var)
    return mean, jnp.transpose(f_var, tuple(reversed(range(f_var.ndim))))


@partial(jax.jit, static_argnames=('full_cov', 'full_output_cov'))
def predict_variant_full(raw: VariantParams, x: jnp.ndarray, y: jnp.ndarray,
                         xs: jnp.ndarray, full_cov: bool = False,
                         full_output_cov: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """predict_covariant_full's shape contract for the variant model: the L
    independent GPs have zero cross-output covariance, so the (L,L) blocks
    are diagonal embeddings of the per-output posterior covariances."""
    full_output_cov = True if full_cov else full_output_cov
    c = variant_constrain(raw)
    L, N, n = y.shape[1], x.shape[0], xs.shape[0]
    K = rbf_gram_variant(x, x, c['lengthscales'], c['variance'])
    chol = cholesky(K + c['noise'][:, None, None] * jnp.eye(N, dtype=x.dtype))
    Ks = rbf_gram_variant(x, xs, c['lengthscales'], c['variance'])      # (L,N,n)
    A = tri_solve(chol, Ks)
    alpha = tri_solve(chol, y.T[..., None])                             # (L,N,1)
    mean = jnp.einsum('lno,lni->ol', A, alpha)                          # (n,L)
    Knn = rbf_gram_variant(xs, xs, c['lengthscales'], c['variance'])    # (L,n,n)
    f_var = Knn - jnp.einsum('lna,lnb->lab', A, A)                      # (L,n,n)
    eye_L = jnp.eye(L, dtype=x.dtype)
    if full_cov:
        # (L,n,n) -> (n,n,L,L) with zeros off the output diagonal.
        return mean, jnp.einsum('lab,lj->abjl', f_var, eye_L)
    diag = jnp.einsum('lnn->ln', f_var)
    if full_output_cov:
        return mean, jnp.einsum('ln,lj->njl', diag, eye_L)              # (n,L,L)
    return mean, diag.T                                                 # (n,L)


@jax.jit
def posterior_factors_covariant(raw: CovariantParams, x: jnp.ndarray, y: jnp.ndarray):
    """(K_cho (LN,LN), K_inv_Y (L,1,N)) per gpr/models.py:427-444.
    Factorized in float64 like the variant path."""
    c = covariant_constrain(_tree64(raw))
    L = c['lengthscales'].shape[0]
    N = x.shape[0]
    x64, y64 = jnp.asarray(x, jnp.float64), jnp.asarray(y, jnp.float64)
    chol = cholesky(_covariant_noisy_K(c, x64))
    k_inv_y = cho_solve(chol, y64.T.reshape(-1, 1))
    return chol, k_inv_y.reshape(L, N)[:, None, :]
