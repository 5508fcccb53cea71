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


def _col_tile(NB: int, B: int, target: int = 4096) -> int:
    """Widest column-tile (a multiple of B dividing NB*B) not exceeding
    max(B, target) — exact tiling, no clamped/overlapping last tile."""
    best = 1
    for d in range(1, NB + 1):
        if NB % d == 0 and d * B <= max(B, target):
            best = d
    return best * B


def _width_segments(n_tiles: int, C: int, n_seg: int = 4):
    """Static start offsets (multiples of the tile width C) partitioning
    [0, n_tiles*C) into ~n_seg width classes for lax.switch-narrowed
    trailing updates: a full-width (Npad) rank-B update wastes the flops
    left of the current panel (~2/3 of the total over a whole
    factorization); selecting the widest segment whose start is <= the
    panel offset bounds the waste to ~1/(2*n_seg) instead."""
    return sorted({(n_tiles * b // n_seg) * C for b in range(n_seg)})


def _segment_index(seg_starts, offset):
    """Traced index of the last segment start <= offset."""
    starts = jnp.asarray(seg_starts, dtype=jnp.int32)
    return (jnp.sum(starts <= jnp.asarray(offset).astype(jnp.int32)) - 1
            ).astype(jnp.int32)


def _cholesky_blocked_impl(a: jnp.ndarray, block: int) -> jnp.ndarray:
    N = a.shape[-1]
    Npad = _round_up(N, block)
    A = _pad_spd(a, Npad)
    NB = Npad // block
    B = block
    eye_b = jnp.eye(B, dtype=a.dtype)
    row_idx = jnp.arange(Npad)
    # Column-tiled trailing update: a full (Npad,Npad) rank-B update is a
    # SECOND N^2 buffer live against the carry — 2x9.4 GB at N=50k, past the
    # 15.75 GB v5e HBM — and computes the masked-out already-factored
    # columns anyway. Tiling bounds the temp to (Npad, C) and the dynamic
    # lower bound skips fully-factored tiles (~half the update FLOPs).
    C = _col_tile(NB, B)
    n_tiles = Npad // C
    tile_idx = jnp.arange(C)

    def step(k, A):
        col0 = k * B
        panel = lax.dynamic_slice(A, _i32(0, col0), (Npad, B))        # (Npad,B)
        diag = lax.dynamic_slice(panel, _i32(col0, 0), (B, B))
        # symmetric diag: the transpose pins the TPU cholesky custom call's
        # operand-layout demand locally (see cholesky_blocked_upper).
        Lkk = jnp.linalg.cholesky(jnp.swapaxes(diag, -1, -2))
        inv = lax.linalg.triangular_solve(Lkk, eye_b, left_side=True, lower=True)
        Lpanel = jnp.matmul(panel, inv.T, precision=lax.Precision.HIGHEST)  # (Npad,B)
        # rows above the diagonal block are upper-triangle garbage -> zero;
        # the diagonal block itself comes out as Lkk exactly.
        Lpanel = jnp.where(row_idx[:, None] >= col0, Lpanel, 0.0)
        A = lax.dynamic_update_slice(A, Lpanel, _i32(0, col0))

        def upd_tile(t, A):
            c0 = t * C
            rows = lax.dynamic_slice(Lpanel, _i32(c0, 0), (C, B))
            upd = jnp.matmul(Lpanel, rows.T,
                             precision=lax.Precision.HIGHEST)          # (Npad,C)
            keep = (c0 + tile_idx)[None, :] >= col0 + B
            cur = lax.dynamic_slice(A, _i32(0, c0), (Npad, C))
            return lax.dynamic_update_slice(
                A, cur - jnp.where(keep, upd, 0.0), _i32(0, c0))

        t0 = ((col0 + B) // C).astype(jnp.int32)   # first tile with trailing cols
        return lax.fori_loop(t0, n_tiles, upd_tile, A)

    A = lax.fori_loop(0, NB, step, A)
    return jnp.tril(A)[..., :N, :N]


def cholesky_blocked_upper(a: jnp.ndarray, block: int = 256) -> jnp.ndarray:
    """UPPER Cholesky factor U of SPD a (N,N): a = U^T U, U = L^T.

    The row-major (layout-native) sibling of ``cholesky_blocked``: the panel
    loop reads/writes (B, Npad) ROW slabs, which are contiguous in XLA's
    default {1,0} layout — so the while-loop carry keeps the layout of the
    donated input and no transposed (Npad,Npad) layout-conversion copy is
    inserted. With the lower/column-panel variant at N=50k the carry chose
    the {0,1} layout and XLA materialized a second 9.38 GB copy — past the
    v5e 15.75 GB HBM. Use with ``solve_upper_t`` / ``solve_upper``.

    NOT differentiable (dynamic-bound fori_loop); gradient paths go through
    the custom-VJP LML wrappers, never through this factorization.
    The strict lower triangle of the padded intermediate holds garbage that
    is masked on every read and zeroed (jnp.triu) before returning."""
    N = a.shape[-1]
    Npad = _round_up(N, block)
    A = _pad_spd(a, Npad)
    NB = Npad // block
    B = block
    eye_b = jnp.eye(B, dtype=a.dtype)
    col_idx = jnp.arange(Npad)
    C = _col_tile(NB, B)
    n_tiles = Npad // C
    tile_idx = jnp.arange(C)

    def step(k, A):
        row0 = k * B
        slab = lax.dynamic_slice(A, _i32(row0, 0), (B, Npad))         # (B,Npad)
        diag = lax.dynamic_slice(slab, _i32(0, row0), (B, B))
        # diag is symmetric, so chol(diag^T) == chol(diag); the transpose
        # absorbs the TPU cholesky custom call's column-major operand-layout
        # demand locally — without it, XLA layout assignment propagates
        # {0,1} back through the slices INTO THE (Npad,Npad) LOOP CARRY and
        # materializes a full transposed copy (the N=50k OOM, measured).
        Lkk = jnp.linalg.cholesky(jnp.swapaxes(diag, -1, -2))
        inv = lax.linalg.triangular_solve(Lkk, eye_b, left_side=True, lower=True)
        U_k = jnp.matmul(inv, slab, precision=lax.Precision.HIGHEST)  # (B,Npad)
        # diag block comes out as Lkk^{-1} A_kk = Lkk^T = Ukk exactly;
        # columns left of the diagonal are garbage -> zero.
        U_k = jnp.where(col_idx[None, :] >= row0, U_k, 0.0)
        A = lax.dynamic_update_slice(A, U_k, _i32(row0, 0))

        # NOTE full-width trailing update on purpose: a lax.switch-narrowed
        # matmul over 4 static width classes was measured SLOWER at N=50k
        # (chol 7.8 s -> 9.6 s) — the kernel is tile-overhead-bound, not
        # flop-bound, and the switch blocks fusion of matmul/where/update.
        def upd_tile(t, A):
            r0 = t * C
            cols = lax.dynamic_slice(U_k, _i32(0, r0), (B, C))
            upd = jnp.matmul(cols.T, U_k,
                             precision=lax.Precision.HIGHEST)          # (C,Npad)
            keep = (r0 + tile_idx)[:, None] >= row0 + B
            cur = lax.dynamic_slice(A, _i32(r0, 0), (C, Npad))
            return lax.dynamic_update_slice(
                A, cur - jnp.where(keep, upd, 0.0), _i32(r0, 0))

        t0 = ((row0 + B) // C).astype(jnp.int32)   # first tile with trailing rows
        return lax.fori_loop(t0, n_tiles, upd_tile, A)

    A = lax.fori_loop(0, NB, step, A)
    return jnp.triu(A)[..., :N, :N]


def cholesky_blocked_upper_2level(a: jnp.ndarray, block: int = 256,
                                  super_block: int = 2048,
                                  precision=None) -> jnp.ndarray:
    """Two-level LEFT-LOOKING upper Cholesky: a = U^T U.

    The TPU answer to classical look-ahead (SURVEY §7 hard part 2, VERDICT
    r2 #2): GPU look-ahead overlaps panel k+1's factorization with panel
    k's trailing update on a second stream, but under XLA one fori_loop
    carry serializes everything — there is nothing to overlap WITH. What
    actually starves the MXU in the right-looking kernel is that ~all of
    the O(N^3) trailing-update flops issue from NB sequential small steps.
    This variant DEFERS them: a super-panel of SB rows receives its entire
    update from all previously factored rows as s big (SB,SB)@(SB,Npad)
    matmuls (full MXU rate, ~92-96% of the flops at SB=2-4k), then is
    factored internally by the usual B-wide micro-steps whose trailing
    updates now span at most SB rows instead of Npad.

    Same conventions as cholesky_blocked_upper: row-slab access only (the
    donated input's {1,0} layout is preserved), padding rows carry a unit
    diagonal, strict lower garbage masked and zeroed on return, NOT
    differentiable.

    ``precision``: matmul precision of the TRAILING UPDATES only (the super
    slab accumulation and the micro rank-B updates — ~all the flops); the
    panel scaling matmul stays HIGHEST (O(N^2 B) flops, and its rows are
    divided by the pivots, where rounding is least forgiving). None means
    HIGHEST (true f32 on TPU). lax.Precision.HIGH (bf16x3) is the measured
    fast tier for the gradient strips; see benchmarks/chol_2level.py for
    its factor-quality probe before adopting it anywhere."""
    upd_prec = lax.Precision.HIGHEST if precision is None else precision
    N = a.shape[-1]
    B = block
    Npad = _round_up(N, B)
    # Snap SB DOWN to a multiple of B dividing Npad: re-padding an input
    # that is already block-aligned (the engine's staged gram) would hold a
    # second (Npad',Npad') buffer next to the donated one — a 19 GB HBM OOM
    # at N=50k (measured). Worst case SB degenerates to B (= right-looking).
    SB = max(min(super_block, Npad), B)
    NBpad = Npad // B
    sb_blocks = SB // B
    while NBpad % sb_blocks:
        sb_blocks -= 1
    SB = sb_blocks * B
    A = _pad_spd(a, Npad)
    NS = Npad // SB
    NBm = SB // B
    eye_b = jnp.eye(B, dtype=a.dtype)
    col_idx = jnp.arange(Npad)
    Cm = _col_tile(NBm, B)                      # micro trailing tile rows
    n_tiles_m = SB // Cm
    tile_idx = jnp.arange(Cm)

    seg_starts_s = _width_segments(NS, SB)

    def super_step(s, A):
        S0 = (s * SB).astype(jnp.int32)
        slab = lax.dynamic_slice(A, _i32(S0, 0), (SB, Npad))
        # Segment-narrowed super accumulation: only columns >= S0 of the
        # slab are live (left of the diagonal block is strict-lower garbage
        # zeroed on return), so the deferred updates write the widest
        # static column segment containing S0 instead of full Npad —
        # a full-width sweep spends ~3x the N^3/3 useful flops.
        seg = _segment_index(seg_starts_s, S0)

        def branch(S):
            W = Npad - S

            def br(slab):
                sr = lax.dynamic_slice(slab, _i32(0, S), (SB, W))

                def acc_t(t, sr):
                    rows_t = lax.dynamic_slice(A, _i32(t * SB, S), (SB, W))
                    cols_t = lax.dynamic_slice(A, _i32(t * SB, S0), (SB, SB))
                    return sr - jnp.matmul(cols_t.T, rows_t,
                                           precision=upd_prec)

                sr = lax.fori_loop(0, s, acc_t, sr)
                return lax.dynamic_update_slice(slab, sr, _i32(0, S))

            return br

        slab = lax.switch(seg, [branch(S) for S in seg_starts_s], slab)

        def micro(k, slab):
            r0 = (k * B).astype(jnp.int32)      # row within the slab
            c0 = S0 + r0                        # global diagonal column
            panel = lax.dynamic_slice(slab, _i32(r0, 0), (B, Npad))
            diag = lax.dynamic_slice(panel, _i32(0, c0), (B, B))
            # transposed-chol layout absorption: see cholesky_blocked_upper
            Lkk = jnp.linalg.cholesky(jnp.swapaxes(diag, -1, -2))
            inv = lax.linalg.triangular_solve(Lkk, eye_b, left_side=True,
                                              lower=True)
            U_k = jnp.matmul(inv, panel, precision=lax.Precision.HIGHEST)
            U_k = jnp.where(col_idx[None, :] >= c0, U_k, 0.0)
            slab = lax.dynamic_update_slice(slab, U_k, _i32(r0, 0))

            def upd_tile(t, slab):
                tr0 = t * Cm
                cols = lax.dynamic_slice(U_k, _i32(0, S0 + tr0), (B, Cm))
                upd = jnp.matmul(cols.T, U_k, precision=upd_prec)   # (Cm,Npad)
                keep = (tr0 + tile_idx)[:, None] >= r0 + B
                cur = lax.dynamic_slice(slab, _i32(tr0, 0), (Cm, Npad))
                return lax.dynamic_update_slice(
                    slab, cur - jnp.where(keep, upd, 0.0), _i32(tr0, 0))

            t0 = ((r0 + B) // Cm).astype(jnp.int32)
            return lax.fori_loop(t0, n_tiles_m, upd_tile, slab)

        slab = lax.fori_loop(0, NBm, micro, slab)
        return lax.dynamic_update_slice(A, slab, _i32(S0, 0))

    A = lax.fori_loop(0, NS, super_step, A)
    return jnp.triu(A)[..., :N, :N]


def _pad_upper(U: jnp.ndarray, y: jnp.ndarray, Npad: int):
    N, R = U.shape[-1], y.shape[-1]
    if Npad == N:
        return U, y
    Up = jnp.zeros((Npad, Npad), dtype=U.dtype).at[:N, :N].set(U)
    idx = jnp.arange(N, Npad)
    Up = Up.at[idx, idx].set(1.0)
    yp = jnp.zeros((Npad, R), dtype=y.dtype).at[:N, :].set(y)
    return Up, yp


def solve_upper_t(U: jnp.ndarray, y: jnp.ndarray, block: int = 256) -> jnp.ndarray:
    """Solve U^T z = y for UPPER-triangular U (N,N), y (N,R) — the forward
    substitution of the row-major engine. Right-looking: once a block of z
    is known its contribution is eliminated from the remaining rhs with one
    (Npad,B)x(B,R) matmul against the CONTIGUOUS row slab of U (the
    lower-engine trsm reads column slabs, strided in row-major layout)."""
    N, R = U.shape[-1], y.shape[-1]
    Npad = _round_up(N, block)
    B = block
    NB = Npad // B
    Up, yp = _pad_upper(U, y, Npad)
    col_idx = jnp.arange(Npad)

    def step(k, w):
        row0 = k * B
        slab = lax.dynamic_slice(Up, _i32(row0, 0), (B, Npad))        # (B,Npad)
        Ukk = lax.dynamic_slice(slab, _i32(0, row0), (B, B))
        w_k = lax.dynamic_slice(w, _i32(row0, 0), (B, R))
        z_k = lax.linalg.triangular_solve(Ukk, w_k, left_side=True,
                                          lower=False, transpose_a=True)
        w = lax.dynamic_update_slice(w, z_k, _i32(row0, 0))
        # eliminate z_k from the unsolved rows (> row0+B); solved rows have
        # the slab masked to zero so they stay untouched.
        slab_m = jnp.where(col_idx[None, :] >= row0 + B, slab, 0.0)
        return w - jnp.matmul(slab_m.T, z_k, precision=lax.Precision.HIGHEST)

    z = lax.fori_loop(0, NB, step, yp)
    return z[:N]


def solve_upper(U: jnp.ndarray, z: jnp.ndarray, block: int = 256) -> jnp.ndarray:
    """Solve U alpha = z for UPPER-triangular U (N,N), z (N,R) — the backward
    substitution of the row-major engine. Left-looking from the bottom: each
    block solve consumes the already-solved suffix through one (B,Npad)x
    (Npad,R) matmul against the contiguous row slab (suffix-masked: the
    garbage strict-lower columns of a padded factor hit only zero rows but
    masking keeps NaN-safety explicit)."""
    N, R = U.shape[-1], z.shape[-1]
    Npad = _round_up(N, block)
    B = block
    NB = Npad // B
    Up, zp = _pad_upper(U, z, Npad)
    col_idx = jnp.arange(Npad)

    def step(i, w):
        k = NB - 1 - i
        row0 = k * B
        slab = lax.dynamic_slice(Up, _i32(row0, 0), (B, Npad))        # (B,Npad)
        Ukk = lax.dynamic_slice(slab, _i32(0, row0), (B, B))
        z_k = lax.dynamic_slice(w, _i32(row0, 0), (B, R))
        slab_m = jnp.where(col_idx[None, :] >= row0 + B, slab, 0.0)
        rhs = z_k - jnp.matmul(slab_m, w, precision=lax.Precision.HIGHEST)
        a_k = lax.linalg.triangular_solve(Ukk, rhs, left_side=True, lower=False)
        return lax.dynamic_update_slice(w, a_k, _i32(row0, 0))

    alpha = lax.fori_loop(0, NB, step, zp)
    return alpha[:N]


def invert_upper_blocked(U: jnp.ndarray, block: int = 256,
                         precision=lax.Precision.HIGHEST) -> jnp.ndarray:
    """V = U^{-1} for UPPER-triangular U (N,N), MXU-blocked and row-major
    layout-native (contiguous (B, Npad) row slabs, same carry discipline as
    ``cholesky_blocked_upper`` — donate U and the inversion is in place).

    Bottom-up row recursion: with rows > k already inverted,
    V[k,:] = Vkk [e_k | -U[k, k+B:] V[k+B:, :]] — one (B,Npad)x(Npad,C)
    matmul per (panel, column-tile), the tile loop skipping columns left of
    the diagonal block. Turns K^{-1} strip builds into single full-rate
    matmuls K^{-1}[:,c] = V V[c,:]^T (K = U^T U => K^{-1} = V V^T), replacing
    per-strip sequential substitution sweeps in the streamed LML gradient.

    Numerical note: an explicit triangular inverse squares the factor's
    condition contribution vs substitution; it feeds GRADIENT reductions
    (and the existing Linv fast path of kinv_all), never the posterior
    solve. NOT differentiable (dynamic-bound fori_loop)."""
    N = U.shape[-1]
    Npad = _round_up(N, block)
    B = block
    NB = Npad // B
    if Npad != N:
        A = jnp.zeros((Npad, Npad), dtype=U.dtype).at[:N, :N].set(U)
        idx = jnp.arange(N, Npad)
        A = A.at[idx, idx].set(1.0)
    else:
        A = U
    eye_b = jnp.eye(B, dtype=U.dtype)
    col_idx = jnp.arange(Npad)
    C = _col_tile(NB, B)
    n_tiles = Npad // C
    tile_idx = jnp.arange(C)

    seg_starts = _width_segments(n_tiles, C)

    def step(i, A):
        k = NB - 1 - i
        row0 = k * B
        slab = lax.dynamic_slice(A, _i32(row0, 0), (B, Npad))         # U row k
        Ukk = lax.dynamic_slice(slab, _i32(0, row0), (B, B))
        Vkk = lax.linalg.triangular_solve(Ukk, eye_b, left_side=True,
                                          lower=False)
        # suffix-masked: columns < row0+B of the slab are the diagonal block
        # and garbage — only already-inverted rows (>= row0+B) may contribute
        slab_m = jnp.where(col_idx[None, :] >= row0 + B, slab, 0.0)
        # zero the strict-lower garbage of this row NOW: later (upper) panels
        # read this row through their suffix masks, which do NOT cover the
        # region between their diagonal and row0. The suffix tiles below
        # overwrite cols >= row0 with the inverted values.
        A = lax.dynamic_update_slice(
            A, jnp.where(col_idx[None, :] >= row0, slab, 0.0), _i32(row0, 0))
        seg = _segment_index(seg_starts, row0)    # widest start <= row0

        def row_tile(t, A):
            c0 = t * C
            cols_g = c0 + tile_idx

            def branch(S):
                W = Npad - S
                def br(A):
                    # contraction rows [S, Npad): slab_m zeroes everything
                    # below row0+B > S, so the narrowed product is EXACT.
                    Vt = lax.dynamic_slice(A, _i32(S, c0), (W, C))
                    return jnp.matmul(
                        lax.dynamic_slice(slab_m, _i32(0, S), (B, W)), Vt,
                        precision=precision)                          # (B,C)
                return br

            T = lax.switch(seg, [branch(S) for S in seg_starts], A)
            newt = -jnp.matmul(Vkk, T, precision=precision)
            # diagonal-block columns carry Vkk; left of them zero
            diag_embed = jnp.matmul(
                Vkk, (cols_g[None, :] == row0 + jnp.arange(B)[:, None]
                      ).astype(A.dtype),
                precision=lax.Precision.HIGHEST)
            newt = jnp.where(cols_g[None, :] >= row0 + B, newt,
                             jnp.where(cols_g[None, :] >= row0, diag_embed, 0.0))
            return lax.dynamic_update_slice(A, newt, _i32(row0, c0))

        t0 = (row0 // C).astype(jnp.int32)     # first tile containing col row0
        return lax.fori_loop(t0, n_tiles, row_tile, A)

    A = lax.fori_loop(0, NB, step, A)
    return jnp.triu(A)[..., :N, :N]


def invert_upper_blocked_2level(U: jnp.ndarray, block: int = 256,
                                super_block: int = 3584,
                                precision=lax.Precision.HIGHEST) -> jnp.ndarray:
    """V = U^{-1}, the two-level sibling of ``invert_upper_blocked``.

    Bottom-up over SB-row super panels: the diagonal (SB,SB) block is
    inverted by the usual B-wide micro recursion (tiny — ~SB²·N of the
    N³/3 total flops), then the whole off-diagonal row lands as TWO large
    matmuls (Schur form): V[s, s+1:] = -V_ss · (U[s, s+1:] · V[s+1:, s+1:]).
    Both contraction and output widths are lax.switch-narrowed to the
    widest static segment containing the live columns (the masked rows make
    the narrowed product exact, as in ``invert_upper_blocked``), so the
    MXU sees ~NS big (SB,W)(W,W) products instead of NB serial B-row
    sweeps. Same conventions: row-major in place (donate U), padding rows
    carry a unit diagonal, NOT differentiable."""
    N = U.shape[-1]
    B = block
    Npad = _round_up(N, B)
    # Snap SB to a multiple of B dividing Npad (cholesky_blocked_upper_2level
    # discipline: never re-pad an already-aligned donated buffer).
    SB = max(min(super_block, Npad), B)
    NBpad = Npad // B
    sb_blocks = SB // B
    while NBpad % sb_blocks:
        sb_blocks -= 1
    SB = sb_blocks * B
    NS = Npad // SB
    NBm = SB // B
    if Npad != N:
        A = jnp.zeros((Npad, Npad), dtype=U.dtype).at[:N, :N].set(U)
        idx = jnp.arange(N, Npad)
        A = A.at[idx, idx].set(1.0)
    else:
        A = U
    eye_b = jnp.eye(B, dtype=U.dtype)
    col_idx = jnp.arange(Npad)
    scol_idx = jnp.arange(SB)
    seg_starts = _width_segments(NS, SB)

    def invert_diag(D):
        """Micro bottom-up inverse of one (SB,SB) upper block, in place."""

        def micro(i, D):
            r0 = ((NBm - 1 - i) * B).astype(jnp.int32)
            row = lax.dynamic_slice(D, _i32(r0, 0), (B, SB))
            Dkk = lax.dynamic_slice(row, _i32(0, r0), (B, B))
            Vkk = lax.linalg.triangular_solve(Dkk, eye_b, left_side=True,
                                              lower=False)
            row_m = jnp.where(scol_idx[None, :] >= r0 + B, row, 0.0)
            T = jnp.matmul(row_m, D, precision=precision)        # (B,SB)
            new = -jnp.matmul(Vkk, T, precision=precision)
            diag_embed = jnp.matmul(
                Vkk, (scol_idx[None, :] == r0 + jnp.arange(B)[:, None]
                      ).astype(D.dtype),
                precision=lax.Precision.HIGHEST)
            new = jnp.where(scol_idx[None, :] >= r0 + B, new, diag_embed)
            return lax.dynamic_update_slice(D, new, _i32(r0, 0))

        return lax.fori_loop(0, NBm, micro, D)

    def super_step(i, A):
        s = NS - 1 - i
        S0 = (s * SB).astype(jnp.int32)
        slab = lax.dynamic_slice(A, _i32(S0, 0), (SB, Npad))
        V_ss = invert_diag(lax.dynamic_slice(slab, _i32(0, S0), (SB, SB)))
        # Only already-inverted rows (>= S0+SB) may contribute; the masked
        # slab makes the segment-narrowed contraction exact.
        slab_m = jnp.where(col_idx[None, :] >= S0 + SB, slab, 0.0)
        seg = _segment_index(seg_starts, S0)

        def branch(S):
            W = Npad - S

            def br(A):
                Vb = lax.dynamic_slice(A, _i32(S, S), (W, W))
                T = jnp.matmul(lax.dynamic_slice(slab_m, _i32(0, S), (SB, W)),
                               Vb, precision=precision)          # (SB,W)
                row = jnp.zeros((SB, Npad), A.dtype)
                return lax.dynamic_update_slice(
                    row, -jnp.matmul(V_ss, T, precision=precision),
                    _i32(0, S))

            return br

        row = lax.switch(seg, [branch(S) for S in seg_starts], A)
        # cols in [S, S0+SB) of the product are exact zeros (V is upper);
        # stamp V_ss on the diagonal block and zero everything left of it.
        row = jnp.where(col_idx[None, :] >= S0 + SB, row, 0.0)
        row = lax.dynamic_update_slice(row, V_ss, _i32(0, S0))
        row = jnp.where(col_idx[None, :] >= S0, row, 0.0)
        return lax.dynamic_update_slice(A, row, _i32(S0, 0))

    A = lax.fori_loop(0, NS, super_step, A)
    return jnp.triu(A)[..., :N, :N]


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
    # dLML/dy = -K^{-1} y = -alpha (the quadform's y-gradient; the logdet
    # term is y-free) — callers differentiating through targets (e.g. a
    # trainable mean's residuals) rely on it.
    return Kbar, -gbar * alpha


mvn_lml_blocked.defvjp(_mvn_lml_blocked_fwd, _mvn_lml_blocked_bwd)
