"""Mesh-distributed covariant (LN, LN) MOGP chain on the deferred cyclic2
engine (VERDICT r4 #3).

The reference's hot spot IS the covariant factorization
(/root/reference/romcomma/gpf/models.py:73-82: one (LN, LN) Cholesky per
LML evaluation); this framework's single-chip answer is the blocked upper
engine (models/gp.covariant_upper_lml, LN <= ~32k on one v5e). This module
lifts that ceiling to ~LN ~ 32k * sqrt(S): the covariant gram is just
another SPD matrix, so the distributed two-level deferred engine
(parallel/cyclic_deferred.py) factorizes/solves/inverts it unchanged —
only the GRAM BUILDER and the streamed (dF, dnoise_cov) gradient know the
covariant structure.

Layout: global row index i = l * N + n (the y.T.reshape order of the
single-chip chain), staged into the block-cyclic stored order of
parallel.distributed.plan(L*N, S, B). Per row the staged arrays carry the
SCALED coordinates u_i = x_{n_i} / lambda_{l_i} (lengthscales are frozen in
the reference's covariant configuration, so u never changes during
calibration), a one-hot output-index row O_i (f32/f64 — L is tiny), and the
sample index n_i. Tiles assemble as

    K[i, j] = unit(u_i, u_j) * F[l_i, l_j]
              + delta(n_i == n_j) * noise_cov[l_i, l_j]

with the (l_i, l_j)-indexed factors computed as ONE-HOT MATMULS
(O_rows @ F @ O_cols^T — MXU-friendly, no gathers over sharded axes), and
the gradient reductions as their transposes: dF = O^T (Bbar o unit) O,
dnoise = O^T (Bbar o delta_n) O with Bbar = (alpha alpha^T - K^{-1}) / 2,
streamed through the SAME half-ring pair-tile schedule as the variant
gradient (cyclic_deferred.grads_ring_pairs — unordered tiles contribute
T + T^T, the matrix-valued analog of its off-diagonal weight 2).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from romcomma_tpu.parallel.distributed import (DistributedGP, Plan, _i32,
                                               _rep_sharding, _row_sharding,
                                               _shard_map, make_n_mesh, plan,
                                               to_stored)
from romcomma_tpu.parallel.cyclic_deferred import (DeferredEngine,
                                                   _local_g_rows,
                                                   _segment_index,
                                                   _width_segments,
                                                   stored_global_perms,
                                                   super_q)

#: matmul precision of the one-hot F/noise factor matmuls: one-hot rows
#: pick matrix entries exactly ONLY if the operands are not rounded to
#: bf16 first (the TPU default precision would round F itself).
_PICK = lax.Precision.HIGHEST


#: LN below which covariant calibration stays on the single-chip chain even
#: on a multi-device mesh: small problems gain nothing from sharding, and
#: the deferred engine's block-cyclic plan degenerates at LN << S*B
#: (measured: a 42x-padded LN=48/S=8/B=256 plan CRASHES the XLA CPU
#: compiler — the round-5 routing regression this gate fixes).
COVARIANT_MESH_MIN_LN: int = 4096


class CovariantStage(NamedTuple):
    """Device-resident staged inputs of the covariant chain."""
    u: jnp.ndarray        # (Npad, M) scaled coords, row-sharded
    O: jnp.ndarray        # (Npad, L) one-hot output index, row-sharded
    ns: jnp.ndarray       # (Npad,) int32 sample index (-1 on padding)
    y: jnp.ndarray        # (Npad, 1) flattened outputs, replicated


def ring_gram_global_covariant(pl_: Plan, mesh):
    """Covariant gram, rows block-cyclic (stored order), columns GLOBAL
    order — the cyclic2 engine's input convention (ring_gram_global).

    fn(u, O, ns, F, noise_cov) -> K (Npad, Npad) row-sharded. Padding
    rows/cols carry a unit diagonal; real diagonal noise arrives through
    the delta(n_i == n_j) term itself.
    """
    from romcomma_tpu.ops.gram import rbf_gram

    S, B, c, Npad, LN = pl_.S, pl_.B, pl_.c, pl_.Npad, pl_.N
    cB = c * B

    def local(u_local, O_local, ns_local, F, noise_cov):
        me = lax.axis_index('n')
        right = [(i, (i + 1) % S) for i in range(S)]
        g_rows = _local_g_rows(pl_, me, 0, c)                    # (cB,)
        dt = u_local.dtype
        row_real = (g_rows < LN).astype(dt)
        OF = jnp.matmul(O_local, F, precision=_PICK)             # (cB, L)
        ON = jnp.matmul(O_local, noise_cov, precision=_PICK)
        bufs = (u_local, O_local, ns_local)
        out4 = jnp.zeros((cB, c, S, B), dtype=dt)
        for s in range(S):
            src = (me - s) % S
            bu, bO, bns = bufs
            unit_t = rbf_gram(u_local, bu, jnp.ones((), dt), jnp.ones((), dt))
            Fv = jnp.matmul(OF, bO.T, precision=_PICK)           # (cB, cB)
            Nv = jnp.matmul(ON, bO.T, precision=_PICK)
            eqn = (ns_local[:, None] == bns[None, :]).astype(dt)
            tile = unit_t * Fv + eqn * Nv
            out4 = lax.dynamic_update_slice(
                out4, tile.reshape(cB, c, 1, B), _i32(0, 0, src, 0))
            if s + 1 < S:
                bufs = tuple(lax.ppermute(b, 'n', right) for b in bufs)
        out = out4.reshape(cB, Npad)
        col_real = (jnp.arange(Npad) < LN).astype(dt)
        out = out * row_real[:, None] * col_real[None, :]
        eye = (jnp.arange(Npad)[None, :] == g_rows[:, None])
        return out + eye * (1.0 - row_real)[:, None]

    fn = _shard_map(local, mesh=mesh,
                    in_specs=(P('n'), P('n'), P('n'), P(), P()),
                    out_specs=P('n'))
    return jax.jit(fn)


def grads_ring_pairs_covariant(pl_: Plan, mesh, super_block: int = 3584,
                               precision=lax.Precision.HIGH):
    """Streamed covariant LML gradient from the distributed triangular
    inverse: grads(V row-sharded, alpha (Npad, 1) GLOBAL replicated,
    u, O, ns row-sharded) -> (dF (L, L), dnoise_cov (L, L)).

    The half-ring pair-tile schedule is grads_ring_pairs' exactly (same
    segment-narrowed V-chunk matmuls, same tail clamp + fresh masks); the
    per-tile reductions become one-hot matmuls, and an unordered tile pair
    (off-diagonal weight 2 in the scalar sweep) contributes T + T^T — its
    mirrored block's contribution is exactly the transpose."""
    from romcomma_tpu.ops.gram import rbf_gram

    S, B, c, NB, Npad, LN = pl_.S, pl_.B, pl_.c, pl_.NB, pl_.Npad, pl_.N
    cB = c * B
    q = super_q(pl_, super_block)
    SB = q * S * B
    NS = -(-c // q)
    qB = q * B
    seg_starts = _width_segments(NS, SB)

    def local(V_local, alpha_g, u_local, O_local, ns_local):
        me = lax.axis_index('n')
        dt = V_local.dtype
        M = u_local.shape[1]
        L = O_local.shape[1]
        right = [(i, (i + 1) % S) for i in range(S)]

        def chunk(V_slab, u_slab, O_slab, ns_slab, a_slab, dev, si):
            r0 = jnp.minimum(si * qB, (c - q) * B).astype(jnp.int32)
            Vr = lax.dynamic_slice(V_slab, _i32(r0, 0), (qB, Npad))
            ur = lax.dynamic_slice(u_slab, _i32(r0, 0), (qB, M))
            Orr = lax.dynamic_slice(O_slab, _i32(r0, 0), (qB, L))
            nr = lax.dynamic_slice(ns_slab, _i32(r0), (qB,))
            ar = lax.dynamic_slice(a_slab, _i32(r0, 0), (qB, 1))[:, 0]
            ci = (r0 // B) + jnp.arange(q)
            g_rows = ((ci * S + dev)[:, None] * B
                      + jnp.arange(B)[None, :]).reshape(-1)
            fresh = (r0 + jnp.arange(qB)) >= si * qB
            return Vr, ur, Orr, nr, ar, ((g_rows < LN) & fresh).astype(dt)

        def a_of(dev):
            return lax.dynamic_slice(
                alpha_g.reshape(c, S, B, 1), _i32(0, dev, 0, 0),
                (c, 1, B, 1)).reshape(cB, 1)

        a_mine = a_of(me)
        self_pairs = [(sr, sc) for sc in range(NS) for sr in range(sc + 1)]
        sp_r = jnp.asarray([p[0] for p in self_pairs], jnp.int32)
        sp_c = jnp.asarray([p[1] for p in self_pairs], jnp.int32)

        def make_pair_body(src, bufs, pr, pc, w_off):
            a_buf, V_buf, u_buf, O_buf, ns_buf = bufs

            def pair_body(p, acc):
                dF, dnz = acc
                sr = pr[p] if pr is not None else p // NS
                sc = pc[p] if pc is not None else p % NS
                Vr, ur, Orr, nr, ar, mr = chunk(V_local, u_local, O_local,
                                                ns_local, a_mine, me, sr)
                Vc, uc, Occ, ncol, ac, mc = chunk(V_buf, u_buf, O_buf,
                                                  ns_buf, a_buf, src, sc)
                seg = _segment_index(seg_starts, jnp.maximum(sr, sc) * SB)

                def branch(S_):
                    Wd = Npad - S_

                    def br(_):
                        return jnp.matmul(
                            lax.dynamic_slice(Vr, _i32(0, S_), (qB, Wd)),
                            lax.dynamic_slice(Vc, _i32(0, S_), (qB, Wd)).T,
                            precision=precision)

                    return br

                kinv = lax.switch(seg, [branch(S_) for S_ in seg_starts], 0)
                unit_t = rbf_gram(ur, uc, jnp.ones((), dt), jnp.ones((), dt))
                mask2 = mr[:, None] * mc[None, :]
                Bbar = 0.5 * (ar[:, None] * ac[None, :] - kinv) * mask2
                eqn = (nr[:, None] == ncol[None, :]).astype(dt)
                T_F = jnp.matmul(Orr.T, jnp.matmul(Bbar * unit_t, Occ,
                                                   precision=_PICK),
                                 precision=_PICK)
                T_N = jnp.matmul(Orr.T, jnp.matmul(Bbar * eqn, Occ,
                                                   precision=_PICK),
                                 precision=_PICK)
                w = (jnp.where(sr == sc, 1.0, 2.0).astype(dt)
                     if w_off is None else jnp.asarray(w_off, dt))
                # unordered pair: this tile + its mirrored block (= T^T)
                dF = dF + T_F + (w - 1.0) * T_F.T
                dnz = dnz + T_N + (w - 1.0) * T_N.T
                return dF, dnz

            return pair_body

        zero = jnp.zeros((L, L), dt)
        acc = (zero, zero)
        bufs = (a_of(me), V_local, u_local, O_local, ns_local)
        for step in range(S // 2 + 1):
            src = (me - step) % S
            bufs = (a_of(src),) + bufs[1:]
            if step == 0:
                body = make_pair_body(src, bufs, sp_r, sp_c, None)
                acc = lax.fori_loop(0, len(self_pairs), body, acc)
            else:
                w_off = 1.0 if (S % 2 == 0 and step == S // 2) else 2.0
                body = make_pair_body(src, bufs, None, None, w_off)
                acc = lax.fori_loop(0, NS * NS, body, acc)
            if step < S // 2:
                bufs = (bufs[0],) + tuple(lax.ppermute(b, 'n', right)
                                          for b in bufs[1:])
        return tuple(lax.psum(a, 'n') for a in acc)

    fn = _shard_map(local, mesh=mesh,
                    in_specs=(P('n'), P(), P('n'), P('n'), P('n')),
                    out_specs=(P(), P()))
    return jax.jit(fn)


class DistributedCovariantGP:
    """The covariant analog of DistributedGP: plan over LN rows, cyclic2
    deferred engine, one custom-VJP LML over (F, noise_cov) with
    lengthscales frozen (the reference's covariant configuration)."""

    def __init__(self, N: int, L: int, mesh=None, block: int = 256,
                 dtype=None, super_block: int | None = None):
        self.N, self.L = N, L
        self.mesh = mesh if mesh is not None else make_n_mesh()
        self.plan = plan(L * N, S=self.mesh.devices.size, B=block)
        self.dtype = dtype
        self.super_block = (DistributedGP.DENSE_SUPER_BLOCK
                            if super_block is None else super_block)
        self.engine = DeferredEngine(
            self.plan, self.mesh, super_block=self.super_block,
            chol_precision=DistributedGP.CHOL_PRECISION,
            grad_precision=DistributedGP.GRAD_PRECISION)
        self._gram = ring_gram_global_covariant(self.plan, self.mesh)
        self._grads = grads_ring_pairs_covariant(
            self.plan, self.mesh, self.super_block,
            DistributedGP.GRAD_PRECISION)
        _, inv = stored_global_perms(self.plan)
        self._inv_perm = jnp.asarray(inv)

    def stage(self, X: np.ndarray, Y: np.ndarray,
              lengthscales: np.ndarray) -> CovariantStage:
        """Host (N, M) X / (N, L) Y / (L, M) frozen lengthscales ->
        device-resident staged arrays in block-cyclic stored order."""
        from romcomma_tpu.base.definitions import FLOAT
        dt = self.dtype if self.dtype is not None else FLOAT()
        N, L = self.N, self.L
        X = np.asarray(X, dtype=dt)
        ls = np.asarray(lengthscales, dtype=dt).reshape(L, -1)
        u = (X[None, :, :] / ls[:, None, :]).reshape(L * N, -1)
        O = np.eye(L, dtype=dt)[np.repeat(np.arange(L), N)]
        ns = np.tile(np.arange(N, dtype=np.int32), L)
        y = np.asarray(Y, dtype=dt).reshape(N, L).T.reshape(L * N, 1)
        rs, rep = _row_sharding(self.mesh), _rep_sharding(self.mesh)
        return CovariantStage(
            u=jax.device_put(jnp.asarray(to_stored(self.plan, u)), rs),
            O=jax.device_put(jnp.asarray(to_stored(self.plan, O)), rs),
            ns=jax.device_put(jnp.asarray(
                to_stored(self.plan, ns[:, None], fill=-1)[:, 0]), rs),
            y=jax.device_put(jnp.asarray(to_stored(self.plan, y)), rep))

    def lml_fn(self, st: CovariantStage):
        """The jittable custom-VJP lml(F, noise_cov) over the staged data —
        forward = gram + chol + solve + logdet, backward = distributed
        triangular inverse + half-ring pair-tile (dF, dnoise) sweep."""
        eng, pl_ = self.engine, self.plan
        const = -0.5 * pl_.N * math.log(2.0 * math.pi)
        inv_perm = self._inv_perm
        gram, grads = self._gram, self._grads

        @jax.custom_vjp
        def lml(F, noise_cov):
            U = eng.chol(gram(st.u, st.O, st.ns, F, noise_cov))
            z = eng.fwd(U, st.y)
            value = -0.5 * jnp.sum(z * z) - eng.logdiag(U) + const
            return jnp.where(jnp.isfinite(value), value, -jnp.inf)

        def lml_fwd(F, noise_cov):
            U = eng.chol(gram(st.u, st.O, st.ns, F, noise_cov))
            z = eng.fwd(U, st.y)
            value = -0.5 * jnp.sum(z * z) - eng.logdiag(U) + const
            value = jnp.where(jnp.isfinite(value), value, -jnp.inf)
            alpha = eng.bwd(U, z)
            V = eng.inv(U)                   # donates U
            return value, (alpha, V)

        def lml_bwd(res, gbar):
            alpha, V = res
            alpha_g = jnp.take(alpha, inv_perm, axis=0)
            dF, dnz = grads(V, alpha_g, st.u, st.O, st.ns)
            return gbar * dF, gbar * dnz

        lml.defvjp(lml_fwd, lml_bwd)
        return lml

    def calibrate(self, X: np.ndarray, Y: np.ndarray, raw, mask,
                  maxiter: int = 5000, gtol: float = 1e-16,
                  ftol: float | None = None):
        """Host-paced covariant calibration (scipy L-BFGS-B, one bounded
        device dispatch per evaluation) over CovariantParams with the
        lengthscales FROZEN — models/gp.calibrate_covariant_host's contract
        on the mesh engine. Returns (params, lml, iterations)."""
        from romcomma_tpu.models.gp import covariant_constrain
        from romcomma_tpu.ops import lbfgs
        if ftol is None:
            ftol = lbfgs.SCIPY_FTOL
        frozen = raw
        mask = mask._replace(
            raw_lengthscales=jnp.zeros_like(mask.raw_lengthscales))
        st = self.stage(X, Y, np.asarray(
            covariant_constrain(raw)['lengthscales']))
        lml = self.lml_fn(st)

        def merge(p):
            return jax.tree_util.tree_map(
                lambda pv, fv, m: fv + m * (pv - fv), p, frozen, mask)

        def objective(p):
            cc = covariant_constrain(merge(p))
            return -lml(cc['F'], cc['noise_cov'])

        res = lbfgs.minimize_scipy(objective, raw, maxiter=maxiter,
                                   gtol=gtol, ftol=ftol, fuse=False)
        return merge(res.params), -res.value, res.iterations
