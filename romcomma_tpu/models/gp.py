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


#: panel width of the covariant upper-engine blocked kernels; strips of the
#: streamed backward are max(block, 2048) columns (the variant engine's
#: GRAD_STRIP_COLS policy, parallel/distributed.py:489).
COVARIANT_UPPER_BLOCK: int = 512


def covariant_upper_lml(x: jnp.ndarray, lengthscales: jnp.ndarray,
                        y: jnp.ndarray, block: int = 0):
    """Custom-VJP ``lml(F, noise_cov)`` of the ls-frozen covariant MOGP on
    the row-major upper-factor blocked engine (ops/blocked.py) — the
    covariant analog of the variant streaming-v2 chain
    (parallel/distributed.py:585-695), replacing the XLA-builtin (LN,LN)
    Cholesky under autodiff that capped the covariant route (VERDICT r2 #5).

    Forward: K = F ox unit + noise_cov ox I assembled in ONE elementwise
    pass over the closed-over unit gram (the reference's K_unit_variance
    cache, gpf/kernels.py:74-104), factorized K = U^T U by the donated
    in-place blocked Cholesky; the factor is then donated into the in-place
    triangular inversion so the only VJP residual is V = U^{-1}.
    Backward: dLML/dF[i,j]   = 1/2 sum(W_blk(i,j) * unit_blk(i,j)),
              dLML/dnz[i,j]  = 1/2 tr(W_blk(i,j)),  W = alpha alpha^T - K^{-1},
    streamed as full-rate V V^T row strips — no gram rebuild, no
    refactorization, no (L,N,L,N) reshape of anything (Npad,Npad)-sized.

    Gradients are exact per-entry partials of F/noise_cov as free (L,L)
    matrices; the SPD Cholesky parameterization outside (covariant_constrain)
    symmetrizes them through ordinary autodiff."""
    from romcomma_tpu.ops import blocked

    dt = x.dtype
    L, M = lengthscales.shape
    N = x.shape[0]
    LN = L * N
    block = block or COVARIANT_UPPER_BLOCK
    block = min(block, -(-LN // 128) * 128)
    Npad = -(-LN // block) * block
    r = jnp.arange(Npad)
    blk = jnp.where(r < LN, r // N, L)                      # block row index
    # sample position within a block; unique negatives on padding rows so the
    # noise term's delta_nm never fires there
    posn = jnp.where(r < LN, r % N, -(r + 1))

    @jax.jit
    def _build_unit():
        # ONE program (peak: one (Npad,Npad) temp + output). On TPU the
        # cross term goes through the fused Pallas tile kernel: XLA lowers
        # the thin-contraction (Npad,M)@(M,Npad) jnp matmul into a
        # broadcast-and-reduce holding an (8,Npad,Npad) HLO temp — 33 GB
        # at LN~32k, a compile-time OOM (measured, chain5 2026-08-18).
        # The eager op-by-op build before this held 3-4 (Npad,Npad)
        # temporaries and OOM'd the 16 GB chip the same way.
        from romcomma_tpu.ops import gram as gram_mod
        u = (jnp.asarray(x, dt)[None, :, :]
             / jnp.asarray(lengthscales, dt)[:, None, :]).reshape(LN, M)
        u = jnp.zeros((Npad, M), dt).at[:LN].set(u)   # pad rows at origin
        live = (r < LN).astype(dt)
        if gram_mod._use_pallas(u):
            from romcomma_tpu.ops import pallas_kernels
            unit = pallas_kernels.unit_gram(u, u)
        else:
            sq = jnp.sum(u * u, axis=-1)
            d = sq[:, None] + sq[None, :] - 2.0 * jnp.matmul(
                u, u.T, precision=jax.lax.Precision.HIGHEST)
            unit = jnp.exp(-0.5 * jnp.maximum(d, 0.0))
        return unit * (live[:, None] * live[None, :])

    unit_p = _build_unit()
    y_p = jnp.zeros((Npad, 1), dt).at[:LN, :].set(
        jnp.asarray(y.T.reshape(LN, 1), dt))

    # Kernel selection mirrors DistributedGP's dense-engine knobs so one
    # measured adoption governs both chains (variant large-N and covariant).
    from romcomma_tpu.parallel.distributed import DistributedGP as _DGP
    chol = jax.jit(partial(blocked.cholesky_blocked_upper_2level, block=block,
                           super_block=_DGP.DENSE_SUPER_BLOCK,
                           precision=_DGP.CHOL_PRECISION),
                   donate_argnums=(0,))
    fwd = jax.jit(partial(blocked.solve_upper_t, block=block))
    bwd = jax.jit(partial(blocked.solve_upper, block=block))
    inv_kernel = (partial(blocked.invert_upper_blocked_2level,
                          super_block=_DGP.INV_SUPER_BLOCK)
                  if _DGP.INV_TWO_LEVEL else blocked.invert_upper_blocked)
    inv = jax.jit(partial(inv_kernel, block=block,
                          precision=jax.lax.Precision.HIGH),
                  donate_argnums=(0,))
    logdiag = jax.jit(lambda U: jnp.sum(jnp.log(jnp.diagonal(U))))
    const = -0.5 * LN * math.log(2.0 * math.pi)

    @jax.jit
    def assemble(unit, F, noise_cov):
        # unit is an ARGUMENT (not a closure constant): closure constants
        # can be materialized into the program image. The (L+1,L+1)-indexed
        # gathers fuse into the single elementwise combine; the pad tail's
        # unit diagonal rides the same expression (no scatter copy).
        F_ext = jnp.zeros((L + 1, L + 1), dt).at[:L, :L].set(jnp.asarray(F, dt))
        N_ext = jnp.zeros((L + 1, L + 1), dt).at[:L, :L].set(
            jnp.asarray(noise_cov, dt))
        eqn = posn[:, None] == posn[None, :]
        pad_eye = ((r >= LN)[:, None]) & (r[:, None] == r[None, :])
        return (unit * F_ext[blk[:, None], blk[None, :]]
                + jnp.where(eqn, N_ext[blk[:, None], blk[None, :]],
                            jnp.zeros((), dt))
                + pad_eye.astype(dt))

    def _value(U, z):
        value = -0.5 * jnp.sum(z * z) - logdiag(U) + const
        return jnp.where(jnp.isfinite(value), value, -jnp.inf)

    strip = int(min(Npad, max(block, 2048)))
    n_strips = -(-Npad // strip)
    arangeL = jnp.arange(L)

    @jax.jit
    def grads_stream(unit, V, alpha):
        a_full = alpha[:, 0]

        def body(t, acc):
            dF, dnz = acc
            r0 = jnp.minimum(t * strip, Npad - strip).astype(jnp.int32)
            gidx = r0 + jnp.arange(strip, dtype=jnp.int32)
            fresh = (gidx >= t * strip)
            V_rows = jax.lax.dynamic_slice(V, (r0, jnp.int32(0)), (strip, Npad))
            kinv_cols = jnp.matmul(V, V_rows.T,
                                   precision=jax.lax.Precision.HIGH)
            a_s = jax.lax.dynamic_slice(alpha, (r0, jnp.int32(0)), (strip, 1))
            Bbar = 0.5 * (a_s * a_full[None, :] - kinv_cols.T)   # (strip,Npad)
            unit_rows = jax.lax.dynamic_slice(unit, (r0, jnp.int32(0)),
                                              (strip, Npad))
            colblock = (Bbar * unit_rows)[:, :LN].reshape(strip, L, N).sum(-1)
            rowblk = (((gidx[:, None] // N) == arangeL[None, :])
                      & (gidx < LN)[:, None] & fresh[:, None]).astype(V.dtype)
            dF = dF + jnp.matmul(rowblk.T, colblock,
                                 precision=jax.lax.Precision.HIGHEST)
            nidx = (gidx % N)[:, None] + arangeL[None, :] * N    # (strip, L)
            vals = jnp.take_along_axis(Bbar, nidx, axis=1)
            dnz = dnz + jnp.matmul(rowblk.T, vals,
                                   precision=jax.lax.Precision.HIGHEST)
            return dF, dnz

        zero = (jnp.zeros((L, L), V.dtype), jnp.zeros((L, L), V.dtype))
        return jax.lax.fori_loop(0, n_strips, body, zero)

    @jax.custom_vjp
    def lml(F, noise_cov):
        U = chol(assemble(unit_p, F, noise_cov))
        z = fwd(U, y_p)
        return _value(U, z)

    def lml_fwd(F, noise_cov):
        U = chol(assemble(unit_p, F, noise_cov))
        z = fwd(U, y_p)
        value = _value(U, z)
        alpha = bwd(U, z)
        V = inv(U)                       # donates U; the ONLY big residual
        return value, (alpha, V)

    def lml_bwd(res, gbar):
        alpha, V = res
        dF, dnz = grads_stream(unit_p, V, alpha)
        return gbar * dF, gbar * dnz

    lml.defvjp(lml_fwd, lml_bwd)
    return lml


def _covariant_objective_upper(raw: CovariantParams, mask: CovariantParams,
                               x: jnp.ndarray, y: jnp.ndarray, block: int = 0):
    """Masked negative-LML objective over the upper-engine covariant chain
    (ls always frozen — the reference's default covariant configuration;
    the lengthscale-gradient case keeps the autodiff objective)."""
    frozen = raw
    mask = mask._replace(raw_lengthscales=jnp.zeros_like(mask.raw_lengthscales))
    lml_fn = covariant_upper_lml(
        x, covariant_constrain(raw)['lengthscales'], y, block=block)

    def merge(p: CovariantParams) -> CovariantParams:
        return jax.tree_util.tree_map(
            lambda pv, fv, m: fv + m * (pv - fv), p, frozen, mask)

    def objective(p: CovariantParams) -> jnp.ndarray:
        c = covariant_constrain(merge(p))
        return -lml_fn(c['F'], c['noise_cov'])

    return objective, merge


def calibrate_covariant_host(raw: CovariantParams, mask: CovariantParams,
                             x: jnp.ndarray, y: jnp.ndarray, maxiter: int = 5000,
                             gtol: float = 1e-16, ftol: float = lbfgs.SCIPY_FTOL,
                             ls_frozen: bool = False):
    """Host-paced covariant calibration for large LN: scipy L-BFGS-B, each
    objective evaluation a bounded device dispatch. The fused whole-descent
    program exceeds XLA TPU compiler limits near LN~20k (CLAUDE.md;
    ops/lbfgs.py:121-124) while per-evaluation programs stay compilable —
    the same policy as the variant large-N route.

    With ``ls_frozen`` (the reference's default covariant configuration) the
    objective runs on the blocked upper engine with the streaming-v2
    custom-VJP backward (covariant_upper_lml) driven EAGERLY, so peak HBM is
    the unit gram + one (Npad,Npad) carry; lengthscale-training falls back
    to the XLA-builtin autodiff objective (one fused val+grad program)."""
    wd = jax.tree_util.tree_leaves(raw)[0].dtype
    x, y = x.astype(wd), y.astype(wd)
    if ls_frozen:
        from romcomma_tpu.parallel.covariant_mesh import (
            COVARIANT_MESH_MIN_LN)
        from romcomma_tpu.parallel.distributed import make_n_mesh
        mesh = make_n_mesh()
        if (mesh.devices.size > 1
                and x.shape[0] * y.shape[1] >= COVARIANT_MESH_MIN_LN):
            # Multi-device at scale: the covariant gram is just another SPD
            # matrix — route through the cyclic2 deferred engine with the
            # covariant gram builder + one-hot (dF, dnoise) pair-tile
            # gradient (parallel/covariant_mesh.py), lifting the
            # single-chip LN ~ 32k HBM ceiling to ~32k * sqrt(S)
            # (per-device memory LN^2/S). Parity vs this single-chip chain
            # pinned at S in {1, 2, 8} by tests/test_covariant_mesh.py.
            # Below COVARIANT_MESH_MIN_LN the single-chip chain stands —
            # sharding gains nothing there and the block-cyclic plan
            # degenerates (see the gate's docstring).
            import numpy as _np
            from romcomma_tpu.parallel.covariant_mesh import (
                DistributedCovariantGP)
            dgp = DistributedCovariantGP(x.shape[0], y.shape[1], mesh)
            return dgp.calibrate(_np.asarray(x), _np.asarray(y), raw, mask,
                                 maxiter=maxiter, gtol=gtol, ftol=ftol)
        objective, merge = _covariant_objective_upper(raw, mask, x, y)
        res = lbfgs.minimize_scipy(objective, raw, maxiter=maxiter, gtol=gtol,
                                   ftol=ftol, fuse=False)
    else:
        objective, merge = _covariant_objective(raw, mask, x, y, ls_frozen)
        res = lbfgs.minimize_scipy(objective, raw, maxiter=maxiter, gtol=gtol,
                                   ftol=ftol)
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
