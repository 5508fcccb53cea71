"""MXU-blocked Cholesky and triangular solves for large N.

XLA's builtin TPU cholesky/triangular_solve lower to fine-grained blocked
loops that reach only ~2 TFLOP/s effective at N~8k (measured, BASELINE.md).
These implementations restructure each factorization/solve step so that all
O(N^3) work is a small number of LARGE (N,B)x(B,N)-shaped matmuls, which the
MXU executes near peak:

  - ``cholesky_blocked``: right-looking blocked factorization. Per panel k,
    one small (B,B) cholesky + (B,B) triangular inverse (cheap, XLA), then
    ONE (N,B)@(B,B) panel matmul and ONE (N,B)@(B,N) masked rank-B update.
  - ``trsm_blocked``: block forward/backward substitution; per block-row one
    (B,N)@(N,R) matmul against the already-solved prefix.

Both operate on padded square inputs (N rounded up to the block size; the
pad region carries an identity diagonal so factorization and log-dets pass
through unchanged). ``cholesky_blocked`` carries a custom VJP using the
standard Cholesky reverse-mode identity with the blocked TRSMs, so the LML
gradient path stays on the fast kernels end to end.

Numerical note: the per-panel triangular inverse is (B,B) only — never the
full matrix — and B<=256 keeps the inverse well-conditioned for the noisy
GP grams this library factorizes (validated to 1e-3 f32 / 1e-9 f64 against
jnp.linalg oracles in tests/test_blocked.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _i32(*vals):
    return tuple(jnp.asarray(v).astype(jnp.int32) for v in vals)


def _pad_spd(a: jnp.ndarray, Npad: int) -> jnp.ndarray:
    """Pad an SPD (N,N) matrix to (Npad,Npad) with an identity tail."""
    N = a.shape[-1]
    if Npad == N:
        return a
    out = jnp.zeros(a.shape[:-2] + (Npad, Npad), dtype=a.dtype)
    out = out.at[..., :N, :N].set(a)
    idx = jnp.arange(N, Npad)
    return out.at[..., idx, idx].set(1.0)


def _cholesky_blocked_impl(a: jnp.ndarray, block: int) -> jnp.ndarray:
    N = a.shape[-1]
    Npad = _round_up(N, block)
    A = _pad_spd(a, Npad)
    NB = Npad // block
    B = block
    eye_b = jnp.eye(B, dtype=a.dtype)
    col_idx = jnp.arange(Npad)
    row_idx = jnp.arange(Npad)

    def step(k, A):
        col0 = k * B
        panel = lax.dynamic_slice(A, _i32(0, col0), (Npad, B))        # (Npad,B)
        diag = lax.dynamic_slice(panel, _i32(col0, 0), (B, B))
        Lkk = jnp.linalg.cholesky(diag)
        inv = lax.linalg.triangular_solve(Lkk, eye_b, left_side=True, lower=True)
        Lpanel = jnp.matmul(panel, inv.T, precision=lax.Precision.HIGHEST)  # (Npad,B)
        # rows above the diagonal block are upper-triangle garbage -> zero;
        # the diagonal block itself comes out as Lkk exactly.
        Lpanel = jnp.where(row_idx[:, None] >= col0, Lpanel, 0.0)
        A = lax.dynamic_update_slice(A, Lpanel, _i32(0, col0))
        # trailing rank-B update on columns right of the panel (one MXU matmul)
        upd = jnp.matmul(Lpanel, Lpanel.T, precision=lax.Precision.HIGHEST)
        A = A - jnp.where(col_idx[None, :] >= col0 + B, upd, 0.0)
        return A

    A = lax.fori_loop(0, NB, step, A)
    return jnp.tril(A)[..., :N, :N]


def trsm_blocked(L: jnp.ndarray, y: jnp.ndarray, trans: bool = False,
                 block: int = 256) -> jnp.ndarray:
    """Solve L z = y (or L^T z = y with trans=True) for lower-triangular L
    (N,N) and y (N,R), by block substitution with full-width MXU matmuls."""
    N, R = L.shape[-1], y.shape[-1]
    Npad = _round_up(N, block)
    B = block
    NB = Npad // B
    if Npad != N:
        Lp = jnp.zeros((Npad, Npad), dtype=L.dtype).at[:N, :N].set(L)
        idx = jnp.arange(N, Npad)
        Lp = Lp.at[idx, idx].set(1.0)
        yp = jnp.zeros((Npad, R), dtype=y.dtype).at[:N, :].set(y)
    else:
        Lp, yp = L, y

    def fwd_step(k, z):
        row0 = k * B
        row_slab = lax.dynamic_slice(Lp, _i32(row0, 0), (B, Npad))     # (B,Npad)
        Lkk = lax.dynamic_slice(row_slab, _i32(0, row0), (B, B))
        y_k = lax.dynamic_slice(yp, _i32(row0, 0), (B, R))
        rhs = y_k - jnp.matmul(row_slab, z, precision=lax.Precision.HIGHEST)  # prefix only: z zero at/after row0
        z_k = lax.linalg.triangular_solve(Lkk, rhs, left_side=True, lower=True)
        return lax.dynamic_update_slice(z, z_k, _i32(row0, 0))

    def bwd_step(i, z):
        k = NB - 1 - i
        row0 = k * B
        col_slab = lax.dynamic_slice(Lp, _i32(0, row0), (Npad, B))     # (Npad,B)
        Lkk = lax.dynamic_slice(col_slab, _i32(row0, 0), (B, B))
        y_k = lax.dynamic_slice(yp, _i32(row0, 0), (B, R))
        rhs = y_k - jnp.matmul(col_slab.T, z, precision=lax.Precision.HIGHEST)  # suffix only: z zero at/before row0+B
        z_k = lax.linalg.triangular_solve(Lkk, rhs, left_side=True, lower=True,
                                          transpose_a=True)
        return lax.dynamic_update_slice(z, z_k, _i32(row0, 0))

    z0 = jnp.zeros_like(yp)
    z = lax.fori_loop(0, NB, bwd_step if trans else fwd_step, z0)
    return z[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def cholesky_blocked(a: jnp.ndarray, block: int = 256) -> jnp.ndarray:
    """Lower Cholesky factor of SPD a (N,N), MXU-blocked. Differentiable."""
    return _cholesky_blocked_impl(a, block)


def _chol_fwd(a, block):
    L = _cholesky_blocked_impl(a, block)
    return L, L


def _chol_bwd(block, L, Lbar):
    """Standard Cholesky reverse mode (Murray 2016): with
    Phi(X) = tril(X) - 0.5 diag(X) and Q = 0.5 (Phi(L^T Lbar) + Phi(L^T Lbar)^T),
    abar = L^{-T} Q L^{-1} — computed as two blocked TRSMs so the backward
    pass is MXU-bound too."""
    M = jnp.matmul(L.T, Lbar, precision=lax.Precision.HIGHEST)
    P = jnp.tril(M) - 0.5 * jnp.diag(jnp.diagonal(M))
    Q = 0.5 * (P + P.T)
    X = trsm_blocked(L, Q, trans=True, block=block)        # X   = L^{-T} Q
    St = trsm_blocked(L, X.T, trans=True, block=block)     # S^T = L^{-T} X^T
    return (0.5 * (St + St.T),)                            # S is symmetric


cholesky_blocked.defvjp(_chol_fwd, _chol_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def mvn_lml_blocked(K: jnp.ndarray, y: jnp.ndarray, block: int = 512) -> jnp.ndarray:
    """Zero-mean Gaussian log marginal likelihood of y (N,1) under SPD K
    (N,N), with every O(N^3) op on the MXU-blocked kernels and a custom VJP.

    The gradient w.r.t. K is the closed form 0.5 (alpha alpha^T - K^{-1})
    with alpha = K^{-1} y (Rasmussen & Williams eq. 5.9), built from one
    blocked N-RHS substitution sweep (L^{-1}) plus one full-rate MXU matmul
    — instead of reverse-differentiating the factorization loop. Composes
    with the (auto-differentiated, matmul-shaped) gram builders: this is the
    single-device hot spot of large-N calibration (the reference's
    gpf/models.py:81 Cholesky under TF autodiff).

    A non-finite factorization (f32 breakdown near singularity) yields -inf
    so linesearches back off rather than aborting."""
    value, _ = _mvn_lml_blocked_fwd(K, y, block)
    return value


def _mvn_lml_blocked_fwd(K, y, block):
    N = K.shape[-1]
    L = _cholesky_blocked_impl(K, block)
    z = trsm_blocked(L, y, block=block)
    alpha = trsm_blocked(L, z, trans=True, block=block)
    value = (-0.5 * jnp.sum(z * z)
             - jnp.sum(jnp.log(jnp.diagonal(L)))
             - 0.5 * N * jnp.log(2.0 * jnp.asarray(jnp.pi, y.dtype)))
    value = jnp.where(jnp.isfinite(value), value, -jnp.inf)
    return value, (L, alpha)


def _mvn_lml_blocked_bwd(block, res, gbar):
    L, alpha = res
    N = L.shape[-1]
    Linv = trsm_blocked(L, jnp.eye(N, dtype=L.dtype), block=block)
    Kinv = jnp.matmul(Linv.T, Linv, precision=lax.Precision.HIGHEST)
    Kbar = (0.5 * gbar) * (alpha @ alpha.T - Kinv)
    return Kbar, jnp.zeros_like(alpha)


mvn_lml_blocked.defvjp(_mvn_lml_blocked_fwd, _mvn_lml_blocked_bwd)
