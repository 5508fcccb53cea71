"""Two-level deferred-update block-cyclic engine — the round-3 single-chip
engine (ops/blocked.cholesky_blocked_upper_2level + the pair-tile streamed
backward) brought to the multi-device path (VERDICT r3 next-round #1).

Mirrors the role of the reference's single hot factorization
(/root/reference/romcomma/gpf/models.py:81) at mesh scale; SURVEY §7 hard
part 2.

Why the old right-looking kernel (parallel/distributed.cholesky) starves a
mesh: ~all of the O(N^3) trailing-update flops issue from NB sequential
rank-B steps, each preceded by an all_gather — contraction depth B (=256)
per matmul and NB (~200 at N=50k) latency-bound collectives.

The key structural fact this module exploits: with block-cyclic row
ownership (global elimination block g lives on device g mod S at local slot
g // S), a SUPER-PANEL of P = q*S consecutive global blocks is a LOCALLY
CONTIGUOUS (q*B, Npad) row slab on every device. The left-looking two-level
schedule then distributes perfectly:

  phase 1 (deferred update, ~all the flops): each device applies the
    super-panel's entire pending update from ALL of its finalized rows as
    ONE (s*q*B, SB)^T @ (s*q*B, W) matmul — contraction depth grows to
    Npad/S, full MXU rate, CHOL_PRECISION tier applies — followed by ONE
    psum. Work is 1/S per device by construction (every device owns the
    same number of finalized rows).
  phase 2 (panel factorization, the small interior): ONE all_gather
    replicates the (SB, Npad) panel slab, every device factors it
    REDUNDANTLY with the single-chip micro kernel (B-wide steps whose
    trailing updates span at most SB rows), then keeps its own q row
    blocks. Redundancy costs ~(3/2)*S*SB/Npad of the useful per-device
    work — the SB knob trades it against collective count (NS = Npad/SB
    collectives total, vs NB = Npad/B for the right-looking kernel).

Column layout: GLOBAL elimination order (NOT the stored/cyclic order of
parallel/distributed.py). Global order makes every hot slice contiguous and
costs nothing to build: a stored-order column axis is the (S, c, B) reshape
of Npad and global order is the (c, S, B) reshape, so the ring gram writes
its tiles with a single dynamic_update_slice on the device axis of the
(cB, c, S, B) view. Real rows/columns are exactly indices < N (padding
lives at the global tail), and the solves' RHS ordering is the ORIGINAL
data order. The stored<->global permutation is applied at the jit boundary
of the solve wrappers so DistributedGP's stored-order plumbing (posterior
refinement, psi solver, GSA staging) is untouched.

The streamed backward is the multi-device analog of the round-3 pair-tile
gradient: the factor is inverted IN PLACE (bottom-up super panels, one
all_gather + one psum each), and the gradient reductions ring-rotate the
V = U^{-1} row slabs so each device computes K^{-1} tiles
K^{-1}[my rows, src rows] = V_local @ V_src^T as full-rate matmuls with the
contraction segment-narrowed to the pair's live columns (every omitted
column hits a structural zero of V — the invert_upper_blocked trick at
super-chunk granularity).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from romcomma_tpu.parallel.distributed import (
    Plan, _shard_map, _i32, _row_sharding, _rep_sharding)
from romcomma_tpu.ops.blocked import _width_segments, _segment_index


def super_q(pl_: Plan, target: int) -> int:
    """Blocks-per-device q of one super panel: the largest q with panel
    width q*S*B <= target (q=1 always qualifies, so a panel never exceeds
    max(target, S*B)). q need NOT divide c — the last super panel is a
    partial tail (super_sizes), every size static at trace time."""
    return max(1, min(pl_.c, max(target, pl_.S * pl_.B) // (pl_.S * pl_.B)))


def super_sizes(pl_: Plan, q: int):
    """Per-panel blocks-per-device [q, q, ..., tail] covering c exactly."""
    NS = -(-pl_.c // q)
    sizes = [q] * (NS - 1) + [pl_.c - (NS - 1) * q]
    assert sizes[-1] >= 1 and sum(sizes) == pl_.c
    return sizes


def stored_global_perms(pl_: Plan) -> Tuple[np.ndarray, np.ndarray]:
    """(perm, inv): perm[stored_row] = global_row; inv[global_row] = stored."""
    perm = np.asarray(pl_.perm)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return perm, inv


def _local_g_rows(pl_, me, rows0_block: int, n_blocks: int):
    """Global row indices (traced) of n_blocks local row blocks starting at
    local block rows0_block on device me."""
    ci = rows0_block + jnp.arange(n_blocks)
    g_blocks = ci * pl_.S + me                       # global block per local
    return (g_blocks[:, None] * pl_.B
            + jnp.arange(pl_.B)[None, :]).reshape(-1)


def ring_gram_global(pl_: Plan, mesh: Mesh):
    """Noisy gram, rows block-cyclic (stored order), columns GLOBAL order.

    fn(x_stored (Npad,M) row-sharded, ls, s2, noise) -> K (Npad,Npad)
    row-sharded. Padding rows/cols (global index >= N) carry a unit diagonal.
    """
    from romcomma_tpu.ops.gram import rbf_gram

    S, B, c, Npad, N = pl_.S, pl_.B, pl_.c, pl_.Npad, pl_.N
    cB = c * B

    def local(x_local, ls, s2, noise):
        me = lax.axis_index('n')
        right = [(i, (i + 1) % S) for i in range(S)]
        g_rows = _local_g_rows(pl_, me, 0, c)                    # (cB,)
        row_real = (g_rows < N).astype(x_local.dtype)
        buf = x_local
        out4 = jnp.zeros((cB, c, S, B), dtype=x_local.dtype)
        for s in range(S):
            src = (me - s) % S
            tile = rbf_gram(x_local, buf, ls, s2)                # (cB, cB)
            # buf rows are src's stored rows (ci, b) -> global col block
            # ci*S + src: one dynamic write on the device axis of the
            # (row, ci, d, b) view places the whole tile.
            out4 = lax.dynamic_update_slice(
                out4, tile.reshape(cB, c, 1, B), _i32(0, 0, src, 0))
            if s + 1 < S:
                buf = lax.ppermute(buf, 'n', right)
        out = out4.reshape(cB, Npad)
        col_real = (jnp.arange(Npad) < N).astype(x_local.dtype)
        out = out * row_real[:, None] * col_real[None, :]
        eye = (jnp.arange(Npad)[None, :] == g_rows[:, None])
        return out + eye * jnp.where(row_real > 0, noise, 1.0)[:, None]

    fn = _shard_map(local, mesh=mesh,
                    in_specs=(P('n'), P(), P(), P()), out_specs=P('n'))
    return jax.jit(fn)


def cholesky_deferred(pl_: Plan, mesh: Mesh, super_block: int = 3584,
                      precision=None):
    """Distributed two-level left-looking UPPER Cholesky: K = U^T U.

    fn(K row-sharded, global cols) -> U row-sharded (strict-lower zero,
    padding diagonal 1). Donates K. ``precision`` applies to the deferred
    accumulation and micro trailing updates (~all the flops); panel scalings
    stay HIGHEST (rows divided by pivots — rounding least forgiving there).
    """
    upd_prec = lax.Precision.HIGHEST if precision is None else precision
    S, B, c, NB, Npad = pl_.S, pl_.B, pl_.c, pl_.NB, pl_.Npad
    q = super_q(pl_, super_block)
    sizes = super_sizes(pl_, q)                  # per-panel blocks/device
    eye_b = jnp.eye(B)

    def _cm(P_blocks: int) -> int:
        """Micro trailing tile rows dividing this panel's SB exactly."""
        best = 1
        for d in range(1, P_blocks + 1):
            if P_blocks % d == 0 and d * B <= max(B, 1024):
                best = d
        return best * B

    def local(K_local):
        me = lax.axis_index('n')
        A = K_local
        dt = K_local.dtype
        eye = eye_b.astype(dt)

        for s, q_s in enumerate(sizes):          # unrolled: static widths
            lo = s * q * B                       # local row offset
            qB_s = q_s * B
            SB_s = q_s * S * B
            S0 = s * q * S * B                   # global col offset
            W = Npad - S0
            Cm = _cm(q_s * S)
            n_tiles_m = SB_s // Cm
            tile_idx = jnp.arange(Cm)
            # ---- phase 1: deferred update from all finalized local rows --
            if s > 0:
                left = lax.slice(A, (0, S0), (lo, S0 + SB_s))
                right = lax.slice(A, (0, S0), (lo, Npad))
                Cd = jnp.matmul(left.T, right, precision=upd_prec)  # (SB_s, W)
            else:
                Cd = jnp.zeros((SB_s, W), dtype=dt)
            Upd = lax.psum(Cd, 'n')
            # ---- gather the panel's gram rows, reorder to global ----------
            mine = lax.slice(A, (lo, S0), (lo + qB_s, Npad))  # (qB_s, W)
            g_all = lax.all_gather(mine, 'n')                 # (S, qB_s, W)
            slab = (g_all.reshape(S, q_s, B, W).transpose(1, 0, 2, 3)
                    .reshape(SB_s, W)) - Upd
            # ---- phase 2: redundant micro factorization of the panel ------
            col_rel = jnp.arange(W)

            def micro(k, slab, W=W, Cm=Cm, n_tiles_m=n_tiles_m,
                      tile_idx=tile_idx):
                r0 = (k * B).astype(jnp.int32)   # relative row AND diag col
                panel = lax.dynamic_slice(slab, _i32(r0, 0), (B, W))
                diag = lax.dynamic_slice(panel, _i32(0, r0), (B, B))
                # transposed chol absorbs the TPU custom call's layout demand
                Lkk = jnp.linalg.cholesky(jnp.swapaxes(diag, -1, -2))
                inv = lax.linalg.triangular_solve(Lkk, eye, left_side=True,
                                                  lower=True)
                U_k = jnp.matmul(inv, panel, precision=lax.Precision.HIGHEST)
                U_k = jnp.where(col_rel[None, :] >= r0, U_k, 0.0)
                slab = lax.dynamic_update_slice(slab, U_k, _i32(r0, 0))

                def upd_tile(t, slab):
                    tr0 = t * Cm
                    cols = lax.dynamic_slice(U_k, _i32(0, tr0), (B, Cm))
                    upd = jnp.matmul(cols.T, U_k, precision=upd_prec)
                    keep = (tr0 + tile_idx)[:, None] >= r0 + B
                    cur = lax.dynamic_slice(slab, _i32(tr0, 0), (Cm, W))
                    return lax.dynamic_update_slice(
                        slab, cur - jnp.where(keep, upd, 0.0), _i32(tr0, 0))

                t0 = ((r0 + B) // Cm).astype(jnp.int32)
                return lax.fori_loop(t0, n_tiles_m, upd_tile, slab)

            slab = lax.fori_loop(0, q_s * S, micro, slab)
            # ---- keep my q_s row blocks, zero the strict-left garbage -----
            mine_f = lax.dynamic_slice(
                slab.reshape(q_s, S, B, W), _i32(0, me, 0, 0), (q_s, 1, B, W)
            ).reshape(qB_s, W)
            row = jnp.concatenate(
                [jnp.zeros((qB_s, S0), dtype=dt), mine_f], axis=1)
            A = lax.dynamic_update_slice(A, row, _i32(lo, 0))
        return A

    fn = _shard_map(local, mesh=mesh, in_specs=(P('n'),), out_specs=P('n'))
    return jax.jit(fn, donate_argnums=(0,))


def invert_deferred(pl_: Plan, mesh: Mesh, super_block: int = 3584,
                    precision=lax.Precision.HIGHEST):
    """V = U^{-1} distributed, bottom-up super panels, in place (donate U).

    fn(U row-sharded, global cols) -> V row-sharded. Per super panel: ONE
    all_gather of the panel's U rows, a redundant (SB,SB) micro inverse,
    each device's contribution to U[panel, >panel] @ V[>panel, :] as one
    big matmul + ONE psum — the Schur form of invert_upper_blocked_2level
    with the contraction distributed over row owners."""
    S, B, c, NB, Npad = pl_.S, pl_.B, pl_.c, pl_.NB, pl_.Npad
    q = super_q(pl_, super_block)
    sizes = super_sizes(pl_, q)
    eye_b = jnp.eye(B)

    def local(U_local):
        me = lax.axis_index('n')
        A = U_local
        dt = U_local.dtype
        eye = eye_b.astype(dt)

        def invert_diag(D, SB_s, NBm):
            """Micro bottom-up inverse of one (SB_s, SB_s) upper block."""
            scol_idx = jnp.arange(SB_s)

            def micro(i, D):
                r0 = ((NBm - 1 - i) * B).astype(jnp.int32)
                row = lax.dynamic_slice(D, _i32(r0, 0), (B, SB_s))
                Dkk = lax.dynamic_slice(row, _i32(0, r0), (B, B))
                Vkk = lax.linalg.triangular_solve(Dkk, eye, left_side=True,
                                                  lower=False)
                row_m = jnp.where(scol_idx[None, :] >= r0 + B, row, 0.0)
                T = jnp.matmul(row_m, D, precision=precision)
                new = -jnp.matmul(Vkk, T, precision=precision)
                diag_embed = jnp.matmul(
                    Vkk, (scol_idx[None, :] == r0 + jnp.arange(B)[:, None]
                          ).astype(dt),
                    precision=lax.Precision.HIGHEST)
                new = jnp.where(scol_idx[None, :] >= r0 + B, new, diag_embed)
                return lax.dynamic_update_slice(D, new, _i32(r0, 0))

            return lax.fori_loop(0, NBm, micro, D)

        for s in range(len(sizes) - 1, -1, -1):  # bottom-up, unrolled
            q_s = sizes[s]
            lo = s * q * B
            qB_s = q_s * B
            SB_s = q_s * S * B
            S0 = s * q * S * B
            S1 = S0 + SB_s
            W = Npad - S0
            W1 = Npad - S1
            c_below = c - (s * q + q_s)          # local blocks below panel
            # gather my panel rows of U, reorder to global panel order
            mine = lax.slice(A, (lo, S0), (lo + qB_s, Npad))  # (qB_s, W)
            g_all = lax.all_gather(mine, 'n')
            slab = (g_all.reshape(S, q_s, B, W).transpose(1, 0, 2, 3)
                    .reshape(SB_s, W))
            V_ss = invert_diag(lax.slice(slab, (0, 0), (SB_s, SB_s)),
                               SB_s, q_s * S)
            if W1 > 0:
                # my finalized V rows below the panel: local blocks
                # ci >= s*q + q_s, live cols >= S1
                Vb = lax.slice(A, (lo + qB_s, S1), (c * B, Npad))
                # panel's U columns owned by ME below the panel: the
                # (ci, d, b) view of the slab's cols >= SB_s, device at me
                Uc = lax.dynamic_slice(
                    slab[:, SB_s:].reshape(SB_s, c_below, S, B),
                    _i32(0, 0, me, 0), (SB_s, c_below, 1, B)
                ).reshape(SB_s, c_below * B)
                T = lax.psum(jnp.matmul(Uc, Vb, precision=precision), 'n')
                right = -jnp.matmul(V_ss, T, precision=precision)  # (SB_s,W1)
                V_panel = jnp.concatenate([V_ss, right], axis=1)   # (SB_s, W)
            else:
                V_panel = V_ss
            mine_f = lax.dynamic_slice(
                V_panel.reshape(q_s, S, B, W), _i32(0, me, 0, 0),
                (q_s, 1, B, W)).reshape(qB_s, W)
            row = jnp.concatenate(
                [jnp.zeros((qB_s, S0), dtype=dt), mine_f], axis=1)
            A = lax.dynamic_update_slice(A, row, _i32(lo, 0))
        return A

    fn = _shard_map(local, mesh=mesh, in_specs=(P('n'),), out_specs=P('n'))
    return jax.jit(fn, donate_argnums=(0,))


def solve_forward_global(pl_: Plan, mesh: Mesh):
    """U^T z = y (forward substitution), y/z in GLOBAL order, replicated.
    Left-looking: per block k, every device contracts its own column block
    against the solved prefix (rows with unsolved global index read z = 0,
    so no ownership masks are needed) and two small psums broadcast the
    partials and the owner's diagonal block."""
    S, B, c, NB, Npad = pl_.S, pl_.B, pl_.c, pl_.NB, pl_.Npad

    def local(U_local, Y):
        me = lax.axis_index('n')
        R = Y.shape[1]

        def body(k, Z):
            col0 = (k * B).astype(jnp.int32)
            colblk = lax.dynamic_slice(U_local, _i32(0, col0), (c * B, B))
            Zm = lax.dynamic_slice(Z.reshape(c, S, B, R), _i32(0, me, 0, 0),
                                   (c, 1, B, R)).reshape(c * B, R)
            partial = jnp.matmul(colblk.T, Zm,
                                 precision=lax.Precision.HIGHEST)
            total = lax.psum(partial, 'n')
            cand = lax.dynamic_slice(U_local, _i32((k // S) * B, col0), (B, B))
            Ukk = lax.psum(jnp.where(me == k % S, cand, 0.0), 'n')
            y_k = lax.dynamic_slice(Y, _i32(col0, 0), (B, R))
            z_k = lax.linalg.triangular_solve(Ukk, y_k - total,
                                              left_side=True, lower=False,
                                              transpose_a=True)
            return lax.dynamic_update_slice(Z, z_k, _i32(col0, 0))

        return lax.fori_loop(0, NB, body, jnp.zeros_like(Y))

    fn = _shard_map(local, mesh=mesh, in_specs=(P('n'), P()), out_specs=P())
    return jax.jit(fn)


def solve_backward_global(pl_: Plan, mesh: Mesh):
    """U w = z (backward substitution), z/w in GLOBAL order, replicated."""
    S, B, c, NB, Npad = pl_.S, pl_.B, pl_.c, pl_.NB, pl_.Npad
    col_idx = jnp.arange(Npad)

    def local(U_local, Z):
        me = lax.axis_index('n')
        R = Z.shape[1]

        def body(i, W):
            k = NB - 1 - i
            col0 = (k * B).astype(jnp.int32)
            slab = lax.dynamic_slice(U_local, _i32((k // S) * B, 0), (B, Npad))
            slab_m = jnp.where(col_idx[None, :] >= col0 + B, slab, 0.0)
            part = jnp.matmul(slab_m, W, precision=lax.Precision.HIGHEST)
            rhs = lax.psum(jnp.where(me == k % S, part, 0.0), 'n')
            Ukk_c = lax.dynamic_slice(slab, _i32(0, col0), (B, B))
            Ukk = lax.psum(jnp.where(me == k % S, Ukk_c, 0.0), 'n')
            z_k = lax.dynamic_slice(Z, _i32(col0, 0), (B, R))
            w_k = lax.linalg.triangular_solve(Ukk, z_k - rhs, left_side=True,
                                              lower=False)
            return lax.dynamic_update_slice(W, w_k, _i32(col0, 0))

        return lax.fori_loop(0, NB, body, jnp.zeros_like(Z))

    fn = _shard_map(local, mesh=mesh, in_specs=(P('n'), P()), out_specs=P())
    return jax.jit(fn)


def log_diag_sum_global(pl_: Plan, mesh: Mesh):
    """sum(log diag(U)) — padding rows carry diag 1 and contribute 0."""
    S, B, c, Npad = pl_.S, pl_.B, pl_.c, pl_.Npad

    def local(U_local):
        me = lax.axis_index('n')

        def body(ci, acc):
            col0 = ((ci * S + me) * B).astype(jnp.int32)
            blk = lax.dynamic_slice(U_local, _i32(ci * B, col0), (B, B))
            return acc + jnp.sum(jnp.log(jnp.diagonal(blk)))

        try:
            acc0 = lax.pcast(jnp.asarray(0.0, U_local.dtype), ('n',),
                             to='varying')
        except (AttributeError, TypeError):      # older jax
            acc0 = lax.pvary(jnp.asarray(0.0, U_local.dtype), 'n')
        return lax.psum(lax.fori_loop(0, c, body, acc0), 'n')

    fn = _shard_map(local, mesh=mesh, in_specs=(P('n'),), out_specs=P())
    return jax.jit(fn)


def grads_ring_pairs(pl_: Plan, mesh: Mesh, super_block: int = 3584,
                     precision=lax.Precision.HIGH):
    """Streamed LML hyperparameter gradient from the distributed triangular
    inverse: grads(V row-sharded, alpha (Npad,1) GLOBAL replicated,
    x_stored (Npad,M) row-sharded, ls, s2, noise) -> (dls, ds2, dnoise)
    [unscaled: caller divides dls by ls^3 and ds2 by s2].

    The V slabs ring-rotate; each device computes its (my rows x src rows)
    K^{-1} tiles as V_local-chunk @ V_src-chunk^T with the contraction
    segment-narrowed to the pair's live columns, rebuilds the matching
    signal-gram tile from the rotating x rows, and accumulates the closed-
    form reductions of dLML/dK = (alpha alpha^T - K^{-1})/2 locally; one
    final psum combines devices.

    HALF-RING symmetry sweep (W = Bbar o K is symmetric because both
    alpha alpha^T and V V^T are): only ring offsets 0..S//2 run. The self
    step (offset 0) enumerates unordered chunk pairs with off-diagonal
    weight 2 — the single-chip pair-tile kernel exactly; offsets
    1..ceil(S/2)-1 carry each unordered device pair once and weigh their
    tiles 2; for even S the antipodal offset S/2 is computed by BOTH
    endpoints (transposed tiles) at weight 1. Halves both the tile flops
    (~Npad^3/3 total MACs with segment narrowing, matching the single-chip
    kernel) and the ring traffic vs the full ordered enumeration."""
    from romcomma_tpu.ops.gram import rbf_gram

    S, B, c, NB, Npad, N = pl_.S, pl_.B, pl_.c, pl_.NB, pl_.Npad, pl_.N
    cB = c * B
    q = super_q(pl_, super_block)
    SB = q * S * B
    NS = -(-c // q)              # tail chunk clamps + fresh-masks (below)
    qB = q * B
    seg_starts = _width_segments(NS, SB)

    def local(V_local, alpha_g, x_local, ls, s2, noise):
        me = lax.axis_index('n')
        dt = V_local.dtype
        M = x_local.shape[1]
        right = [(i, (i + 1) % S) for i in range(S)]

        def chunk(V_slab, x_slab, a_slab, dev, si):
            """One qB-row super chunk of a device's slab + its metadata.
            The tail chunk is CLAMPED to the slab end and its overlap with
            the previous chunk fresh-masked to zero (single-chip pair-tile
            discipline) — q need not divide c."""
            r0 = jnp.minimum(si * qB, (c - q) * B).astype(jnp.int32)
            Vr = lax.dynamic_slice(V_slab, _i32(r0, 0), (qB, Npad))
            xr = lax.dynamic_slice(x_slab, _i32(r0, 0), (qB, M))
            ar = lax.dynamic_slice(a_slab, _i32(r0, 0), (qB, 1))[:, 0]
            ci = (r0 // B) + jnp.arange(q)
            g_rows = ((ci * S + dev)[:, None] * B
                      + jnp.arange(B)[None, :]).reshape(-1)
            fresh = (r0 + jnp.arange(qB)) >= si * qB
            return Vr, xr, ar, g_rows, ((g_rows < N) & fresh).astype(dt)

        def a_of(dev):
            return lax.dynamic_slice(
                alpha_g.reshape(c, S, B, 1), _i32(0, dev, 0, 0),
                (c, 1, B, 1)).reshape(cB, 1)

        a_mine = a_of(me)
        # self-step unordered chunk pairs (sr <= sc), off-diagonal weight 2
        self_pairs = [(sr, sc) for sc in range(NS) for sr in range(sc + 1)]
        sp_r = jnp.asarray([p[0] for p in self_pairs], jnp.int32)
        sp_c = jnp.asarray([p[1] for p in self_pairs], jnp.int32)

        def make_pair_body(src, a_buf, V_buf, x_buf, pr, pc, w_off):
            def pair_body(p, acc):
                dls, ds2, dnoise = acc
                sr = pr[p] if pr is not None else p // NS
                sc = pc[p] if pc is not None else p % NS
                Vr, xr, ar, gr, mr = chunk(V_local, x_local, a_mine, me, sr)
                Vc, xc, ac, gc, mc = chunk(V_buf, x_buf, a_buf, src, sc)
                seg = _segment_index(seg_starts,
                                     jnp.maximum(sr, sc) * SB)

                def branch(S_):
                    Wd = Npad - S_

                    def br(_):
                        return jnp.matmul(
                            lax.dynamic_slice(Vr, _i32(0, S_), (qB, Wd)),
                            lax.dynamic_slice(Vc, _i32(0, S_), (qB, Wd)).T,
                            precision=precision)

                    return br

                kinv = lax.switch(seg, [branch(S_) for S_ in seg_starts], 0)
                K_t = rbf_gram(xr, xc, ls, s2)
                mask2 = mr[:, None] * mc[None, :]
                Bbar = 0.5 * (ar[:, None] * ac[None, :] - kinv) * mask2
                W_t = Bbar * (K_t * mask2)
                w = (jnp.where(sr == sc, 1.0, 2.0).astype(dt)
                     if w_off is None else jnp.asarray(w_off, dt))
                ds2 = ds2 + w * jnp.sum(W_t)
                # true diagonal entries live only in self-step diagonal
                # pairs (weight 1 by construction); eye is zero elsewhere
                eye = (gr[:, None] == gc[None, :]).astype(dt)
                dnoise = dnoise + jnp.sum(Bbar * eye)
                rs = jnp.sum(W_t, axis=1)
                cs = jnp.sum(W_t, axis=0)
                Wx = jnp.matmul(W_t, xc, precision=lax.Precision.HIGHEST)
                dls = dls + w * (jnp.einsum('am,a->m', xr * xr, rs)
                                 + jnp.einsum('bm,b->m', xc * xc, cs)
                                 - 2.0 * jnp.einsum('am,am->m', xr, Wx))
                return dls, ds2, dnoise

            return pair_body

        acc = (jnp.zeros((M,), dt), jnp.zeros((), dt), jnp.zeros((), dt))
        V_buf, x_buf = V_local, x_local
        for step in range(S // 2 + 1):
            src = (me - step) % S
            a_buf = a_of(src)
            if step == 0:
                # self tiles: unordered chunk pairs, off-diag weight 2
                body = make_pair_body(src, a_buf, V_buf, x_buf,
                                      sp_r, sp_c, None)
                acc = lax.fori_loop(0, len(self_pairs), body, acc)
            else:
                # distinct device pair: all ordered chunk pairs. Offsets
                # 1..ceil(S/2)-1 carry each unordered device pair once
                # (weight 2); the antipodal offset S/2 of an even ring is
                # computed by both endpoints (weight 1).
                w_off = 1.0 if (S % 2 == 0 and step == S // 2) else 2.0
                body = make_pair_body(src, a_buf, V_buf, x_buf,
                                      None, None, w_off)
                acc = lax.fori_loop(0, NS * NS, body, acc)
            if step < S // 2:
                V_buf = lax.ppermute(V_buf, 'n', right)
                x_buf = lax.ppermute(x_buf, 'n', right)
        return tuple(lax.psum(a, 'n') for a in acc)

    fn = _shard_map(local, mesh=mesh,
                    in_specs=(P('n'), P(), P('n'), P(), P(), P()),
                    out_specs=(P(), P(), P()))
    return jax.jit(fn)


class DeferredEngine:
    """The builder bundle DistributedGP plugs in as engine='cyclic2'.

    Solve/logdiag wrappers speak the STORED-order convention of
    parallel/distributed.py at their boundary (one static row permutation of
    the replicated RHS each way), so every stored-order consumer — posterior
    refinement, the psi solver, predict — works unchanged."""

    def __init__(self, pl_: Plan, mesh: Mesh, super_block: int,
                 chol_precision, grad_precision):
        self.plan, self.mesh = pl_, mesh
        self.q = super_q(pl_, super_block)
        perm, inv = stored_global_perms(pl_)
        perm_j = jnp.asarray(perm)
        inv_j = jnp.asarray(inv)
        self.gram = ring_gram_global(pl_, mesh)
        self.chol = cholesky_deferred(pl_, mesh, super_block, chol_precision)
        self.inv = invert_deferred(pl_, mesh, super_block, grad_precision)
        fwd_g = solve_forward_global(pl_, mesh)
        bwd_g = solve_backward_global(pl_, mesh)
        self.logdiag = log_diag_sum_global(pl_, mesh)
        self._grads = grads_ring_pairs(pl_, mesh, super_block, grad_precision)

        @jax.jit
        def fwd(U, Y):
            return jnp.take(fwd_g(U, jnp.take(Y, inv_j, axis=0)), perm_j,
                            axis=0)

        @jax.jit
        def bwd(U, Z):
            return jnp.take(bwd_g(U, jnp.take(Z, inv_j, axis=0)), perm_j,
                            axis=0)

        self.fwd, self.bwd = fwd, bwd
        self._inv_perm = inv_j

    def grads(self, V, alpha_stored, x_dev, ls, s2, noise):
        """(dls, ds2, dnoise) — already scaled (dls/ls^3, ds2/s2)."""
        alpha_g = jnp.take(alpha_stored, self._inv_perm, axis=0)
        dls, ds2, dnoise = self._grads(V, alpha_g, x_dev, ls, s2, noise)
        return dls / (ls ** 3), ds2 / s2, dnoise
