"""Distributed dense GP linear algebra over a 1-D ('n') device mesh.

This is the scale-out layer SURVEY.md §7 step 7 calls the hard part: the
reference caps out near N≈10k on one device (benchmark_script.py:36-38)
because the noisy gram K (N,N), its Cholesky, and the posterior solves are
all single-device. Here every O(N^2)/O(N^3) object is sharded over the mesh:

  - ``ring_gram``: X row-blocks rotate around the ICI ring (lax.ppermute) so
    each device builds its (N/S, N) slab of the ARD-RBF gram tile by tile —
    the structural analog of ring attention's KV rotation; no device ever
    holds all pairwise work.
  - ``cholesky``: right-looking blocked Cholesky with **block-cyclic** row
    ownership (block g of the elimination order lives on device g mod S) so
    the trailing update stays load-balanced to the last panel. The panel is
    all-gathered and the (cheap) panel solve is computed redundantly on every
    device — a broadcast-free formulation; the O(N^3) trailing update is a
    per-device (B,B)x(B,N) MXU matmul stream.
  - ``solve_forward``/``solve_backward``: block forward/back substitution
    with masked-psum ownership selection.
  - ``lml``: the exact GP log marginal likelihood with a **custom VJP**: the
    reverse pass materializes K^{-1} slab-by-slab (chunked identity solves +
    the dLML/dK = (alpha alpha^T - K^{-1})/2 identity) and reduces every
    hyperparameter gradient to row sums and matvecs of (dLML/dK ∘ K) — all
    distributed, never an (N,N,M) tensor. This removes the reverse-mode
    differentiation of the factorization loop entirely.

Storage layout. All (N, ·) objects live in "stored order": the N axis is
padded to NB·B rows and block-permuted owner-major, so stored block
t = d·c + ci on device d is global elimination block g = ci·S + d
(g_of_t(t) = (t mod c)·S + t//c). Rows AND columns of K are permuted
consistently, so chol/solves/logdet are those of P K Pᵀ — identical LML.
Padding blocks are identity rows (unit diagonal, zero off-diagonal): they
factorize to themselves, contribute log 1 = 0 to the log determinant, and
carry zero right-hand sides.

Single-output (L=1) per call: the scale regime is huge-N ARD-RBF GPs (the
v5e benchmark target is N=20k..50k, M=30, L=1); multi-output variant models
loop L over the same compiled program.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map_raw      # jax >= 0.6 style
except ImportError:                                   # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_raw


def _shard_map(*args, **kwargs):
    """shard_map with varying-manual-axes checking off: the Pallas gram tile
    kernel runs inside these shard_maps and pallas_call cannot declare its
    output vma; correctness of the collectives is covered by the
    single-device oracle tests instead."""
    try:
        return _shard_map_raw(*args, check_vma=False, **kwargs)
    except TypeError:                                  # older jax: no kwarg
        return _shard_map_raw(*args, **kwargs)


def _i32(*vals):
    """Cast slice indices to a uniform int32 (axis_index is int32; x64 mode
    promotes python ints to int64 — lax requires matching index dtypes)."""
    return tuple(jnp.asarray(v).astype(jnp.int32) for v in vals)


def make_n_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D ('n',) mesh over the first n_devices devices."""
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devices), axis_names=('n',))


class Plan(NamedTuple):
    """Static blocking plan for one (N, B, S) problem."""
    N: int          # real rows
    B: int          # block size
    S: int          # devices
    NB: int         # total blocks (padded)
    c: int          # blocks per device
    Npad: int       # NB * B
    g_of_t: Tuple[int, ...]   # stored slot -> global elimination block
    perm: Tuple[int, ...]     # stored row  -> global row (< Npad)

    @property
    def dtype_rows_mask(self) -> np.ndarray:
        """(Npad,) bool — stored rows that are real data rows."""
        p = np.asarray(self.perm)
        return p < self.N


def plan(N: int, S: int, B: int = 256) -> Plan:
    """Blocking plan: NB is the smallest multiple of S with NB*B >= N."""
    NB = max(1, math.ceil(N / (B * S))) * S
    c = NB // S
    Npad = NB * B
    g_of_t = tuple((t % c) * S + t // c for t in range(NB))
    perm = tuple(g_of_t[r // B] * B + r % B for r in range(Npad))
    return Plan(N=N, B=B, S=S, NB=NB, c=c, Npad=Npad, g_of_t=g_of_t, perm=perm)


def to_stored(pl_: Plan, a: np.ndarray, fill: float = 0.0) -> np.ndarray:
    """Host-side: global (N, ...) -> stored-order padded (Npad, ...)."""
    out_shape = (pl_.Npad,) + tuple(a.shape[1:])
    out = np.full(out_shape, fill, dtype=a.dtype)
    perm = np.asarray(pl_.perm)
    real = perm < pl_.N
    out[real] = np.asarray(a)[perm[real]]
    return out


def from_stored(pl_: Plan, a: np.ndarray) -> np.ndarray:
    """Host-side inverse of :func:`to_stored` (drops padding)."""
    perm = np.asarray(pl_.perm)
    real = perm < pl_.N
    out_shape = (pl_.N,) + tuple(a.shape[1:])
    out = np.empty(out_shape, dtype=np.asarray(a).dtype)
    out[perm[real]] = np.asarray(a)[real]
    return out


def _row_sharding(mesh: Mesh):
    return NamedSharding(mesh, P('n'))


def _rep_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())


# --------------------------------------------------------------------------- #
# Ring gram
# --------------------------------------------------------------------------- #

def ring_gram(pl_: Plan, mesh: Mesh):
    """Jitted builder of the noisy stored-order gram, rows sharded over 'n'.

    Returns fn(x_stored (Npad,M) sharded, ls (M,), s2, noise) -> K (Npad,Npad)
    row-sharded. Padding rows get unit diagonal / zero off-diagonal.
    """
    from romcomma_tpu.ops.gram import rbf_gram

    S, B, c, NB, Npad, N = pl_.S, pl_.B, pl_.c, pl_.NB, pl_.Npad, pl_.N
    cB = c * B
    real = jnp.asarray(pl_.dtype_rows_mask)            # (Npad,) stored-order

    def local(x_local, real_local, ls, s2, noise):
        # x_local (cB, M); rotate row blocks around the ring.
        me = lax.axis_index('n')
        right = [(i, (i + 1) % S) for i in range(S)]
        buf = x_local
        out = jnp.zeros((cB, Npad), dtype=x_local.dtype)
        for s in range(S):
            src = (me - s) % S                          # owner of buf's rows
            tile = rbf_gram(x_local, buf, ls, s2)       # (cB, cB)
            out = lax.dynamic_update_slice(out, tile, _i32(0, src * cB))
            if s + 1 < S:
                buf = lax.ppermute(buf, 'n', right)
        # mask padding and add the noisy/unit diagonal
        col_real = real                                  # (Npad,)
        row_real = real_local[:, 0]                      # (cB,)
        out = out * row_real[:, None] * col_real[None, :]
        rows0 = me * cB
        eye = (jnp.arange(Npad)[None, :] == (rows0 + jnp.arange(cB))[:, None])
        out = out + eye * jnp.where(row_real, noise, 1.0)[:, None]
        return out

    fn = _shard_map(local, mesh=mesh,
                    in_specs=(P('n'), P('n'), P(), P(), P()),
                    out_specs=P('n'))

    @jax.jit
    def build(x_stored, ls, s2, noise):
        return fn(x_stored, real[:, None].astype(x_stored.dtype), ls, s2, noise)

    return build


# --------------------------------------------------------------------------- #
# Distributed blocked Cholesky (right-looking, block-cyclic)
# --------------------------------------------------------------------------- #

def cholesky(pl_: Plan, mesh: Mesh):
    """Jitted distributed Cholesky of a stored-order row-sharded SPD matrix.

    fn(K (Npad,Npad) row-sharded) -> L row-sharded, block-lower-masked.
    """
    S, B, c, NB, Npad = pl_.S, pl_.B, pl_.c, pl_.NB, pl_.Npad
    g_vec = jnp.asarray(pl_.g_of_t)                     # (NB,) stored -> global

    def local(K_local):
        me = lax.axis_index('n')
        A = K_local.reshape(c, B, Npad)
        g_local = g_vec[me * c + jnp.arange(c)]         # (c,) global idx of rows

        def body(k, A):
            d_k = k % S
            c_k = k // S
            t_k = d_k * c + c_k                          # stored slot of step k
            col = t_k * B
            panel_local = lax.dynamic_slice(A, _i32(0, 0, col), (c, B, B))
            panel_all = lax.all_gather(panel_local, 'n')  # (S, c, B, B) stored
            panel_all = panel_all.reshape(NB, B, B)
            L_kk = jnp.linalg.cholesky(panel_all[t_k])
            # Redundant panel solve on every device: X L_kk^T = P.
            sol = lax.linalg.triangular_solve(
                jnp.broadcast_to(L_kk, (NB, B, B)), panel_all,
                left_side=False, lower=True, transpose_a=True)
            is_k = (g_vec == k)[:, None, None]
            gt_k = (g_vec > k)[:, None, None]
            P_L = jnp.where(is_k, L_kk[None], jnp.where(gt_k, sol, 0.0))
            # Write the finalized column block for this device's rows.
            mine = lax.dynamic_slice(P_L, _i32(me * c, 0, 0), (c, B, B))
            A = lax.dynamic_update_slice(A, mine, _i32(0, 0, col))
            # Trailing update on rows with global index > k, columns > k.
            Pmat = jnp.where(gt_k, P_L, 0.0).reshape(Npad, B)
            upd = jnp.einsum('cbi,ni->cbn', jnp.where(g_local[:, None, None] > k,
                                                      mine, 0.0), Pmat,
                             precision=lax.Precision.HIGHEST)
            return A - upd

        A = lax.fori_loop(0, NB, body, A)
        # Final mask: zero strictly-upper blocks and strict-upper of diagonals.
        col_g = jnp.repeat(g_vec, B)                     # (Npad,) per column
        row_in = jnp.arange(B)
        col_in = jnp.tile(jnp.arange(B), NB)
        keep = (g_local[:, None, None] > col_g[None, None, :]) | (
            (g_local[:, None, None] == col_g[None, None, :])
            & (row_in[None, :, None] >= col_in[None, None, :]))
        return (A * keep).reshape(c * B, Npad)

    fn = _shard_map(local, mesh=mesh, in_specs=(P('n'),), out_specs=P('n'))
    # Donate K: the factorization overwrites it panel-by-panel, and holding
    # K and L together is 2 full (Npad, Npad) buffers — the N=50k HBM budget.
    return jax.jit(fn, donate_argnums=(0,))


# --------------------------------------------------------------------------- #
# Distributed triangular solves (matrix RHS)
# --------------------------------------------------------------------------- #

def solve_forward(pl_: Plan, mesh: Mesh):
    """fn(L row-sharded, Y (Npad,R) replicated) -> Z with L Z = Y, replicated."""
    S, B, c, NB, Npad = pl_.S, pl_.B, pl_.c, pl_.NB, pl_.Npad

    def local(L_local, Y):
        me = lax.axis_index('n')
        A = L_local.reshape(c, B, Npad)
        R = Y.shape[1]

        def body(k, Z):
            d_k = k % S
            c_k = k // S
            t_k = d_k * c + c_k
            col = t_k * B
            slab = lax.dynamic_slice(A, _i32(c_k, 0, 0), (1, B, Npad))[0]  # (B,Npad)
            L_kk = lax.dynamic_slice(slab, _i32(0, col), (B, B))
            y_k = lax.dynamic_slice(Y, _i32(col, 0), (B, R))
            rhs = y_k - jnp.matmul(slab, Z, precision=lax.Precision.HIGHEST)
            z_k = lax.linalg.triangular_solve(L_kk, rhs, left_side=True,
                                              lower=True)
            z_k = jnp.where(me == d_k, z_k, 0.0)
            z_k = lax.psum(z_k, 'n')
            return lax.dynamic_update_slice(Z, z_k, _i32(col, 0))

        Z = lax.fori_loop(0, NB, body, jnp.zeros_like(Y))
        return Z

    fn = _shard_map(local, mesh=mesh, in_specs=(P('n'), P()), out_specs=P())
    return jax.jit(fn)


def solve_backward(pl_: Plan, mesh: Mesh):
    """fn(L row-sharded, Z (Npad,R) replicated) -> W with Lᵀ W = Z, replicated."""
    S, B, c, NB, Npad = pl_.S, pl_.B, pl_.c, pl_.NB, pl_.Npad
    g_vec = jnp.asarray(pl_.g_of_t)

    def local(L_local, Z):
        me = lax.axis_index('n')
        A = L_local.reshape(c, B, Npad)
        g_local = g_vec[me * c + jnp.arange(c)]
        R = Z.shape[1]
        rows0 = me * c * B

        def body(i, W):
            k = NB - 1 - i
            d_k = k % S
            c_k = k // S
            t_k = d_k * c + c_k
            col = t_k * B
            cols = lax.dynamic_slice(A, _i32(0, 0, col), (c, B, B))   # L[rows, k]
            W_local = lax.dynamic_slice(W, _i32(rows0, 0), (c * B, R)).reshape(c, B, R)
            mask = (g_local > k)[:, None, None]
            partial = jnp.einsum('cbk,cbr->kr', jnp.where(mask, cols, 0.0), W_local,
                                 precision=lax.Precision.HIGHEST)
            total = lax.psum(partial, 'n')
            diag_cand = lax.dynamic_slice(A, _i32(c_k, 0, col), (1, B, B))[0]
            L_kk = lax.psum(jnp.where(me == d_k, diag_cand, 0.0), 'n')
            z_k = lax.dynamic_slice(Z, _i32(col, 0), (B, R))
            w_k = lax.linalg.triangular_solve(L_kk, z_k - total, left_side=True,
                                              lower=True, transpose_a=True)
            return lax.dynamic_update_slice(W, w_k, _i32(col, 0))

        W = lax.fori_loop(0, NB, body, jnp.zeros_like(Z))
        return W

    fn = _shard_map(local, mesh=mesh, in_specs=(P('n'), P()), out_specs=P())
    return jax.jit(fn)


def log_diag_sum(pl_: Plan, mesh: Mesh):
    """fn(L row-sharded) -> sum(log diag(L)) (padding contributes log 1 = 0)."""
    S, B, c, NB, Npad = pl_.S, pl_.B, pl_.c, pl_.NB, pl_.Npad

    def local(L_local):
        me = lax.axis_index('n')
        A = L_local.reshape(c, B, Npad)

        def body(ci, acc):
            col = (me * c + ci) * B
            blk = lax.dynamic_slice(A, _i32(ci, 0, col), (1, B, B))[0]
            return acc + jnp.sum(jnp.log(jnp.diagonal(blk)))

        try:
            acc0 = lax.pcast(jnp.asarray(0.0, L_local.dtype), ('n',), to='varying')
        except (AttributeError, TypeError):  # older jax
            acc0 = lax.pvary(jnp.asarray(0.0, L_local.dtype), 'n')
        acc = lax.fori_loop(0, c, body, acc0)
        return lax.psum(acc, 'n')

    fn = _shard_map(local, mesh=mesh, in_specs=(P('n'),), out_specs=P())
    return jax.jit(fn)


# --------------------------------------------------------------------------- #
# Distributed LML with analytic hyperparameter gradients
# --------------------------------------------------------------------------- #

class DistributedGP:
    """Distributed single-output ARD-RBF GP: LML (custom VJP), calibration,
    posterior solves — every O(N^2) object sharded over the mesh.

    Hyperparameters enter *constrained* (ls (M,), s2, noise scalars); wrap
    with the transforms in romcomma_tpu.models.params for raw-space descent.
    """

    #: bytes allowed for the replicated (Npad, Npad) L^{-1} buffer in the
    #: single-device K^{-1} build (Linv^T Linv); beyond it (or multi-device)
    #: the chunked two-sweep build is used.
    KINV_LINV_BUDGET_BYTES: int = 5 * 2 ** 30

    #: N up to which a SINGLE-device mesh constructed WITHOUT dense_kernels
    #: (block-cyclic engine) calibrates through one dense fused step program
    #: with XLA's builtin gram/cholesky instead of the cyclic kernels (~6
    #: live (N,N) f32 buffers bound a 16 GB HBM near N~22k). The upper
    #: engine (dense_kernels=True) never takes this branch: it measured
    #: faster than the fused program at every N (see calibrate) and is the
    #: production single-device route (models/gpr.py).
    DENSE_DIRECT_MAX_N: int = 21000
    #: panel width of the dense upper-factor engine's blocked kernels
    #: (ops/blocked.py). Measured N=50k/M=30 f32: B=1024 is ~4% faster per
    #: val+grad (chol 7.1 vs 7.8 s, inverse 1.9 vs 3.7 s) but widens the
    #: per-panel triangular inverse to 1024x1024 — more f32 conditioning
    #: exposure on near-breakdown grams — so 512 stays the default.
    DENSE_BLOCK: int = 512
    #: super-panel rows of the two-level left-looking Cholesky
    #: (ops/blocked.cholesky_blocked_upper_2level — snapped down to a
    #: divisor of Npad inside the kernel). Measured f32 TPU vs the
    #: right-looking kernel: N=50000 7.85 -> 4.82 s (SB 3584), N=20000
    #: 0.63 -> 0.39 s (SB 2048) — the deferred trailing updates issue as
    #: (SB,SB)@(SB,Npad) matmuls at full MXU rate.
    DENSE_SUPER_BLOCK: int = 3584
    #: trailing-update matmul precision of the two-level Cholesky. The
    #: factor feeds EVERYTHING (value, posterior, gradient), so a faster
    #: tier must clear the factor-quality probe of benchmarks/chol_2level.py
    #: before being set here. HIGH (bf16_3x) cleared it with factor quality
    #: IDENTICAL to HIGHEST (f64-oracle strip residual 3.88e-6 at both
    #: N=20000 and N=50000, same gram) while cutting the factorization
    #: 0.400 -> 0.248 s at 20k and 4.826 -> 2.631 s at 50k (TPU v5e,
    #: 2026-08-18) — unlike DEFAULT (bf16_1x), which NaN'd the blocked
    #: factorization outright (BENCH note b9042db). On CPU, HIGH == HIGHEST
    #: (true f32 hardware matmuls), so this is accelerator-only behavior.
    CHOL_PRECISION = lax.Precision.HIGH
    #: triangular-inverse kernel selection: the two-level super-panel Schur
    #: variant (ops/blocked.invert_upper_blocked_2level) vs the
    #: segment-narrowed row sweep. Both run at GRAD_PRECISION (the inverse
    #: feeds only gradient reductions). Head-to-head on TPU
    #: (benchmarks/inv_2level.py, 2026-08-18): the row sweep WINS — 0.200
    #: vs 0.224 s at N=20000 and 1.901 vs 2.312 s at N=50000 (the sweep's
    #: (B,W)@(W,C) products already saturate the MXU at B=512, and the
    #: Schur form pays an extra pass over the output) — so the two-level
    #: variant stays opt-in.
    INV_TWO_LEVEL: bool = False
    INV_SUPER_BLOCK: int = 3584
    #: N at/above which dense_kernels selects the deferred cyclic engine
    #: even on a SINGLE-device mesh: with tail super panels its unrolled
    #: static-width schedule + half-ring pair backward measured FASTER than
    #: the upper engine on one v5e — 0.378 vs 0.545 s/val+grad at N=20000
    #: and 4.04 vs 6.00 s at N=50000 (benchmarks/cyclic2_engine.py,
    #: 2026-08-20) — at a ~3-4x one-time compile premium (55-93 s vs
    #: 15-25 s through the remote helper, persisted to the compile cache).
    #: Below this the upper engine's smaller compile wins the trade.
    CYCLIC2_SINGLE_CHIP_MIN_N: int = 16384

    def __init__(self, N: int, mesh: Mesh | None = None, block: int = 256,
                 dtype=None, dense_kernels: bool = False,
                 engine: str | None = None):
        """``dtype``: working dtype of staged arrays and therefore of the
        whole engine; None uses base.definitions.FLOAT(). Pass np.float64 to
        force a true-f64 engine (the escalation ladder relies on this — a
        FLOAT()-pinned stage would silently cast an intended f64 rescue back
        to f32 under ROMCOMMA_X64=0).

        ``dense_kernels``: factorize/solve with the round-3 two-level
        deferred-update kernels instead of the round-1 right-looking
        block-cyclic engine. On a SINGLE-device mesh this selects the
        row-major upper-factor engine (ops/blocked.py — same padding
        conventions, far smaller HLO: measured 7 s vs 153 s val+grad
        compile at N=8192, one large matmul per panel). On a MULTI-device
        mesh it selects the distributed deferred engine
        (parallel/cyclic_deferred.py): per super panel ONE big
        deferred-update matmul per device (contraction up to Npad/S, the
        CHOL_PRECISION tier) + one psum + one all_gather, with a
        ring-rotating pair-tile streamed backward — so a real v5e-8
        inherits the single-chip engine's structure instead of NB
        latency-bound rank-B steps."""
        self.mesh = mesh if mesh is not None else make_n_mesh()
        self.dtype = dtype
        self.plan = plan(N, S=self.mesh.devices.size, B=block)
        self._gram = ring_gram(self.plan, self.mesh)
        # ``engine`` overrides the dense_kernels auto-selection (benchmark
        # harnesses measure engines head-to-head on the same mesh):
        # 'upper' (S=1 only), 'cyclic2' (any S), 'cyclic'.
        if engine is not None:
            if engine == 'upper' and self.mesh.devices.size > 1:
                # Silently serving cyclic2 here would let a benchmark
                # harness "measure the upper engine" on a mesh where it
                # cannot run (ADVICE r4).
                raise ValueError("engine='upper' is single-device only; "
                                 f"this mesh has {self.mesh.devices.size} "
                                 "devices — use engine='cyclic2'.")
            dense_kernels = engine in ('upper', 'cyclic2')
            force_cyclic2 = engine == 'cyclic2'
        else:
            # production auto-selection: the deferred cyclic engine beats
            # the upper engine on one chip at large N (see
            # CYCLIC2_SINGLE_CHIP_MIN_N)
            force_cyclic2 = (dense_kernels
                             and N >= self.CYCLIC2_SINGLE_CHIP_MIN_N)
        if dense_kernels and self.plan.S == 1 and not force_cyclic2:
            # Row-major (upper-factor) engine: K = U^T U with every hot
            # access a contiguous (B, Npad) row slab, so the donated gram
            # aliases the factorization carry with NO transposed
            # (Npad,Npad) layout-conversion copy — the single-chip N=50k
            # HBM budget (ops/blocked.py cholesky_blocked_upper).  The
            # factor handle is opaque: only _fwd/_bwd/_logdiag consume it.
            from romcomma_tpu.ops import blocked
            bb = max(block, min(self.DENSE_BLOCK, self.plan.Npad))
            self._chol = jax.jit(
                functools.partial(blocked.cholesky_blocked_upper_2level,
                                  block=bb,
                                  super_block=self.DENSE_SUPER_BLOCK,
                                  precision=self.CHOL_PRECISION),
                donate_argnums=(0,))
            self._fwd = jax.jit(functools.partial(blocked.solve_upper_t, block=bb))
            self._bwd = jax.jit(functools.partial(blocked.solve_upper, block=bb))
            self._logdiag = jax.jit(
                lambda U: jnp.sum(jnp.log(jnp.diagonal(U))))   # pad diag == 1
            # bound ONCE here: the strip matmul below reads the same
            # instance attribute, so mutating the class knob after
            # construction cannot silently mix precisions between the
            # inverse and the V V^T strips
            self._grad_precision = self.GRAD_PRECISION
            inv_kernel = (functools.partial(blocked.invert_upper_blocked_2level,
                                            super_block=self.INV_SUPER_BLOCK)
                          if self.INV_TWO_LEVEL else blocked.invert_upper_blocked)
            self._inv = jax.jit(
                functools.partial(inv_kernel, block=bb,
                                  precision=self._grad_precision),
                donate_argnums=(0,))
            self._engine = 'upper'
        elif dense_kernels:
            # Multi-device deferred two-level engine (round-3 structure on
            # the mesh): global-order columns, big deferred-update matmuls,
            # in-place distributed triangular inverse + ring pair-tile
            # streamed gradient (parallel/cyclic_deferred.py docstring).
            from romcomma_tpu.parallel.cyclic_deferred import DeferredEngine
            self._deferred = DeferredEngine(
                self.plan, self.mesh, super_block=self.DENSE_SUPER_BLOCK,
                chol_precision=self.CHOL_PRECISION,
                grad_precision=self.GRAD_PRECISION)
            self._gram = self._deferred.gram
            self._chol = self._deferred.chol
            self._fwd = self._deferred.fwd
            self._bwd = self._deferred.bwd
            self._logdiag = self._deferred.logdiag
            self._inv = self._deferred.inv
            self._grad_precision = self.GRAD_PRECISION
            self._engine = 'cyclic2'
        else:
            self._chol = cholesky(self.plan, self.mesh)
            self._fwd = solve_forward(self.plan, self.mesh)
            self._bwd = solve_backward(self.plan, self.mesh)
            self._logdiag = log_diag_sum(self.plan, self.mesh)
            self._inv = None
            self._grad_precision = self.GRAD_PRECISION
            self._engine = 'cyclic'
        self._lml = self._build_lml()

    # -- host-side staging -------------------------------------------------- #

    def stage(self, X: np.ndarray, Y: np.ndarray):
        """Host (N,M) X / (N,1)|(N,) Y -> stored-order padded device arrays,
        cast to the working dtype (base.definitions.FLOAT()): raw float64
        numpy inputs must not silently select the f64 (TPU-emulated) path —
        under ROMCOMMA_X64=0 that compiles a program several times the HBM
        and an order of magnitude slower."""
        from romcomma_tpu.base.definitions import FLOAT
        dt = self.dtype if self.dtype is not None else FLOAT()
        X = np.asarray(X, dtype=dt)
        Y = np.asarray(Y, dtype=dt).reshape(len(X), -1)
        xs = to_stored(self.plan, X)
        ys = to_stored(self.plan, Y)
        x_dev = jax.device_put(jnp.asarray(xs), _row_sharding(self.mesh))
        y_dev = jax.device_put(jnp.asarray(ys), _rep_sharding(self.mesh))
        return x_dev, y_dev

    # -- LML ----------------------------------------------------------------- #

    def _grads_fn(self):
        """Distributed reductions for dLML/d{ls, s2, noise} given
        Bbar = dLML/dK = (alpha alphaᵀ - K⁻¹)/2, using
        tr(Bbar dK/dθ) with dK/ds2 = (K-noise I)/s2, dK/dnoise = I, and
        dK/dls_m = (K-noise I) ∘ D_m / ls_m³, D_m[a,b] = (x_am-x_bm)²."""
        pl_, mesh = self.plan, self.mesh
        S, B, c, NB, Npad = pl_.S, pl_.B, pl_.c, pl_.NB, pl_.Npad
        real = jnp.asarray(pl_.dtype_rows_mask)

        def local(K_local, Kinv_local, alpha, x, ls, s2, noise):
            me = lax.axis_index('n')
            cB = c * B
            rows0 = me * cB
            row_real = lax.dynamic_slice(real.astype(K_local.dtype), _i32(rows0), (cB,))
            col_real = real.astype(K_local.dtype)
            a_local = lax.dynamic_slice(alpha, _i32(rows0, 0), (cB, 1))
            Bbar = 0.5 * (a_local * alpha[:, 0][None, :] - Kinv_local)
            mask2 = row_real[:, None] * col_real[None, :]
            Bbar = Bbar * mask2
            eye = (jnp.arange(Npad)[None, :] == (rows0 + jnp.arange(cB))[:, None])
            Knn = (K_local - eye * noise) * mask2        # signal gram, no noise
            W = Bbar * Knn
            ds2 = lax.psum(jnp.sum(W), 'n') / s2
            dnoise = lax.psum(jnp.sum(Bbar * eye), 'n')
            # lengthscale grads: sum_ab W_ab (x_am - x_bm)^2 / ls^3
            x_local = lax.dynamic_slice(x, _i32(rows0, 0), (cB, x.shape[1]))
            r = jnp.sum(W, axis=1)                       # (cB,) local rows
            col_sum = lax.psum(jnp.sum(W, axis=0), 'n')  # (Npad,)
            Wx = jnp.matmul(W, x, precision=lax.Precision.HIGHEST)   # (cB, M)
            term = (jnp.einsum('am,a->m', x_local * x_local, r)
                    + jnp.einsum('am,am->m', x_local, Wx) * (-2.0))
            term = lax.psum(term, 'n')
            term = term + jnp.einsum('bm,b->m', x * x, col_sum)
            dls = term / (ls ** 3)
            return dls, ds2, dnoise

        fn = _shard_map(local, mesh=mesh,
                        in_specs=(P('n'), P('n'), P(), P(), P(), P(), P()),
                        out_specs=(P(), P(), P()))
        return jax.jit(fn)

    #: identity-column strip width of the streaming gradient build.
    GRAD_STRIP_COLS: int = 2048
    #: matmul precision of the GRADIENT-ONLY large matmuls (the triangular
    #: inverse and the V V^T strips). These feed dLML/dtheta reductions,
    #: never the value, factor, or posterior — HIGHEST (bf16_6x) is the
    #: framework default everywhere else; HIGH (bf16_3x, ~2x MXU rate) is
    #: the default HERE: measured at N=50000/M=30 the gradient l2 agrees
    #: with HIGHEST to ~2e-5 relative while saving ~6 s of the ~21 s
    #: val+grad (scipy L-BFGS-B's descent is insensitive at that level;
    #: the stopping rule uses the f64 host-projected gradient norm).
    GRAD_PRECISION = lax.Precision.HIGH
    #: streaming backward form: unordered pair tiles (True — exploits the
    #: symmetry of W = Bbar∘K and the triangular zero-prefixes of V for
    #: ~2.5x fewer strip flops; _grads_streaming_pairs_fn) vs the per-strip
    #: full-width sweep (False). Parity pinned by
    #: tests/test_distributed.py::test_pair_tile_backward_matches_strip.
    #: TPU head-to-head (engine_valgrad stream, 2026-08-19): val+grad
    #: 0.723 -> 0.615 s at N=20000 and 8.789 -> 7.028 s at N=50000,
    #: gradient l2 agreement ~1e-7 — default ON.
    GRAD_PAIR_TILES: bool = True
    #: bytes of simultaneously-live (Npad, Npad) gradient buffers above which
    #: the single-device backward pass streams K^{-1} strips instead of
    #: storing K, K^{-1} and L together (3 full buffers).
    GRADS_MEMORY_BUDGET_BYTES: int = 12 * 2 ** 30

    def grad_strip(self) -> tuple:
        """(strip columns, strip count) of the streaming gradient build —
        the single source of the policy (benchmarks probe it too)."""
        strip = int(min(self.plan.Npad, max(self.plan.B, self.GRAD_STRIP_COLS)))
        return strip, -(-self.plan.Npad // strip)

    def _grads_streaming_fn(self, kinv_source: str = 'solves'):
        """dLML/d{ls, s2, noise} WITHOUT materializing K or K^{-1}: strips of
        K^{-1} and the matching signal-gram rows are rebuilt on the fly.
        Peak memory = one (Npad,Npad) operand + O(Npad * strip) — the
        difference between N <= 21k and N = 50k fitting one chip's HBM (the
        stored path holds THREE (Npad, Npad) buffers through the backward
        pass).  Single-device only; the sharded path keeps the stored form
        (per-device slabs are Npad^2/S).

        ``kinv_source``: 'solves' takes identity-column substitution sweeps
        against the saved factor (2 sequential NB-step sweeps per strip);
        'vvt' takes ONE full-rate MXU matmul per strip against the explicit
        triangular inverse V = U^{-1} (K^{-1} = V V^T) — the operand is then
        V, produced by ops/blocked.invert_upper_blocked."""
        pl_ = self.plan
        Npad = pl_.Npad
        fwd, bwd = self._fwd, self._bwd
        real = jnp.asarray(pl_.dtype_rows_mask)
        strip, n_strips = self.grad_strip()
        from romcomma_tpu.ops.gram import rbf_gram

        @jax.jit
        def grads(L, alpha, x, ls, s2, noise):
            dt = L.dtype
            col_real = real.astype(dt)
            a_full = alpha[:, 0]
            arangeN = jnp.arange(Npad, dtype=jnp.int32)

            def body(t, acc):
                dls, ds2, dnoise, col_sum = acc
                r0 = jnp.minimum(t * strip, Npad - strip).astype(jnp.int32)
                gidx = r0 + jnp.arange(strip, dtype=jnp.int32)
                # the clamped last strip overlaps earlier rows: mask them out
                fresh = (gidx >= t * strip).astype(dt)
                if kinv_source == 'vvt':
                    V_rows = lax.dynamic_slice(L, _i32(r0, 0), (strip, Npad))
                    kinv_cols = jnp.matmul(L, V_rows.T,
                                           precision=self._grad_precision)
                else:
                    cols = (arangeN[:, None] == gidx[None, :]).astype(dt)
                    kinv_cols = bwd(L, fwd(L, cols))        # (Npad, strip)
                x_s = lax.dynamic_slice(x, _i32(r0, 0), (strip, x.shape[1]))
                K_rows = rbf_gram(x_s, x, ls, s2)           # signal gram rows
                a_s = lax.dynamic_slice(alpha, _i32(r0, 0), (strip, 1))
                row_real = lax.dynamic_slice(col_real, _i32(r0), (strip,)) * fresh
                mask2 = row_real[:, None] * col_real[None, :]
                Bbar = 0.5 * (a_s * a_full[None, :] - kinv_cols.T) * mask2
                eye = (gidx[:, None] == arangeN[None, :]).astype(dt)
                W = Bbar * (K_rows * mask2)
                ds2 = ds2 + jnp.sum(W)
                dnoise = dnoise + jnp.sum(Bbar * eye)
                rsum = jnp.sum(W, axis=1)
                col_sum = col_sum + jnp.sum(W, axis=0)
                Wx = jnp.matmul(W, x, precision=lax.Precision.HIGHEST)
                dls = dls + (jnp.einsum('am,a->m', x_s * x_s, rsum)
                             - 2.0 * jnp.einsum('am,am->m', x_s, Wx))
                return dls, ds2, dnoise, col_sum

            zero = (jnp.zeros((x.shape[1],), dt), jnp.zeros((), dt),
                    jnp.zeros((), dt), jnp.zeros((Npad,), dt))
            dls, ds2, dnoise, col_sum = lax.fori_loop(0, n_strips, body, zero)
            dls = (dls + jnp.einsum('bm,b->m', x * x, col_sum)) / (ls ** 3)
            return dls, ds2 / s2, dnoise

        return grads

    def _grads_streaming_pairs_fn(self):
        """The symmetric pair-tile variant of the streaming V Vᵀ backward.

        The per-strip form computes every K⁻¹ column block at full
        contraction width: 2·Npad³ flops for a symmetric matrix whose
        operand V is upper-triangular. This form iterates UNORDERED tile
        pairs (q >= t) instead: each K⁻¹ block is one
        (strip,W)@(W,strip) product of two thin V row slabs, with the
        contraction segment-narrowed to columns >= the widest static
        start <= t·strip (every omitted column hits a structural zero of
        the t slab, so the narrowed product is exact — the
        invert_upper_blocked trick). Off-diagonal blocks enter every
        reduction with weight 2 (W = Bbar∘K is symmetric because both
        α αᵀ and V Vᵀ are). Flop count ≈ Npad³/3 + segment waste —
        ~2.5x fewer than the per-strip form.  Same contract as
        _grads_streaming_fn(kinv_source='vvt'): grads(V, alpha, x, ...)."""
        from romcomma_tpu.ops.blocked import _segment_index, _width_segments
        from romcomma_tpu.ops.gram import rbf_gram
        pl_ = self.plan
        Npad = pl_.Npad
        real = jnp.asarray(pl_.dtype_rows_mask)
        strip, n_strips = self.grad_strip()
        pairs = [(q, t) for q in range(n_strips) for t in range(q + 1)]
        q_of_p = jnp.asarray([q for q, _ in pairs], jnp.int32)
        t_of_p = jnp.asarray([t for _, t in pairs], jnp.int32)
        seg_starts = _width_segments(n_strips, strip)
        prec = self._grad_precision

        @jax.jit
        def grads(V, alpha, x, ls, s2, noise):
            dt = V.dtype
            col_real = real.astype(dt)
            arangeS = jnp.arange(strip, dtype=jnp.int32)

            def tile(idx):
                r0 = jnp.minimum(idx * strip, Npad - strip).astype(jnp.int32)
                gidx = r0 + arangeS
                # the clamped last tile overlaps earlier rows: mask them out
                fresh = (gidx >= idx * strip).astype(dt)
                mask = lax.dynamic_slice(col_real, _i32(r0), (strip,)) * fresh
                xs = lax.dynamic_slice(x, _i32(r0, 0), (strip, x.shape[1]))
                a_s = lax.dynamic_slice(alpha, _i32(r0, 0), (strip, 1))[:, 0]
                Vr = lax.dynamic_slice(V, _i32(r0, 0), (strip, Npad))
                return r0, gidx, mask, xs, a_s, Vr

            def body(p, acc):
                dls, ds2, dnoise = acc
                qi = q_of_p[p]
                ti = t_of_p[p]
                rq, gq, mq, xq, aq, Vq = tile(qi)
                rt, gt, mt, xt, at, Vt = tile(ti)
                seg = _segment_index(seg_starts, rt)

                def branch(S):
                    W = Npad - S

                    def br(_):
                        return jnp.matmul(
                            lax.dynamic_slice(Vq, _i32(0, S), (strip, W)),
                            lax.dynamic_slice(Vt, _i32(0, S), (strip, W)).T,
                            precision=prec)

                    return br

                kinv = lax.switch(seg, [branch(S) for S in seg_starts], 0)
                K_qt = rbf_gram(xq, xt, ls, s2)
                mask2 = mq[:, None] * mt[None, :]
                Bbar = 0.5 * (aq[:, None] * at[None, :] - kinv) * mask2
                W_qt = Bbar * (K_qt * mask2)
                w = jnp.where(qi == ti, 1.0, 2.0).astype(dt)
                ds2 = ds2 + w * jnp.sum(W_qt)
                # true diagonal entries live only in diagonal pairs (clamped-
                # tile overlaps are fresh-masked to zero), weight 1 by
                # construction of the ordered-(i,j) enumeration.
                eye = (gq[:, None] == gt[None, :]).astype(dt)
                dnoise = dnoise + jnp.sum(Bbar * eye)
                rs = jnp.sum(W_qt, axis=1)
                cs = jnp.sum(W_qt, axis=0)
                Wx = jnp.matmul(W_qt, xt, precision=lax.Precision.HIGHEST)
                dls = dls + w * (jnp.einsum('am,a->m', xq * xq, rs)
                                 + jnp.einsum('bm,b->m', xt * xt, cs)
                                 - 2.0 * jnp.einsum('am,am->m', xq, Wx))
                return dls, ds2, dnoise

            zero = (jnp.zeros((x.shape[1],), dt), jnp.zeros((), dt),
                    jnp.zeros((), dt))
            dls, ds2, dnoise = lax.fori_loop(0, len(pairs), body, zero)
            return dls / (ls ** 3), ds2 / s2, dnoise

        return grads

    def _itemsize(self) -> int:
        """Bytes per element of the STAGED working dtype — the dtype
        calibrate() actually runs in (``self.dtype`` override, else the
        global FLOAT()). Memory-route decisions must all use this one
        definition: a hardcoded 4 desynchronized _build_lml's backward
        choice from calibrate()'s driver choice on f64-default runs."""
        from romcomma_tpu.base.definitions import FLOAT
        return np.dtype(self.dtype if self.dtype is not None else FLOAT()).itemsize

    def _build_lml(self):
        pl_ = self.plan
        Npad, B, NB, N = pl_.Npad, pl_.B, pl_.NB, pl_.N
        gram, chol, fwd, bwd, logdiag = (self._gram, self._chol, self._fwd,
                                         self._bwd, self._logdiag)
        itemsize = self._itemsize()
        use_streaming = (pl_.S == 1 and
                         3 * Npad * Npad * itemsize > self.GRADS_MEMORY_BUDGET_BYTES)
        # v2 (upper engine only): the forward inverts the donated factor in
        # place and carries V = U^{-1} as the ONLY residual; the backward is
        # full-rate V V^T strip matmuls — no gram/refactorization at all.
        # ALWAYS on for the upper engine, not just past the memory budget:
        # it is both lighter (one (Npad,Npad) buffer) and FASTER than the
        # stored 3-buffer backward — measured head-to-head at N=20000/M=30
        # f32 TPU: 1.099 s/val+grad streaming-v2 vs 1.744 s stored (and
        # 2.062 s for the fused builtin dense-direct program, VERDICT r2
        # #2). The substitution-sweep v1 stays memory-triggered: per-strip
        # sweeps are latency-bound (measured 25 s/eval at N=50k).
        use_streaming_v2 = pl_.S == 1 and self._engine == 'upper'
        # cyclic2 (the multi-device deferred engine) shares streaming-v2's
        # residual discipline: the forward donates U into the distributed
        # in-place inversion, the backward is the ring pair-tile sweep.
        use_ring_pairs = self._engine == 'cyclic2'
        if use_streaming_v2:
            grads_stream = (self._grads_streaming_pairs_fn()
                            if self.GRAD_PAIR_TILES else
                            self._grads_streaming_fn(kinv_source='vvt'))
        elif use_ring_pairs:
            grads_stream = self._deferred.grads
        elif use_streaming:
            grads_stream = self._grads_streaming_fn()
        else:
            grads_stream = None
        grads = self._grads_fn() if not use_ring_pairs else None
        inv = self._inv
        mesh = self.mesh

        @jax.custom_vjp
        def lml(ls, s2, noise, x, y):
            K = gram(x, ls, s2, noise)
            L = chol(K)
            z = fwd(L, y)
            quad = jnp.sum(z * z)
            value = (-0.5 * quad - logdiag(L)
                     - 0.5 * N * jnp.log(2.0 * jnp.asarray(jnp.pi, y.dtype)))
            # An f32 factorization of a near-singular K yields NaN; report
            # -inf instead so the linesearch backs off rather than aborting.
            return jnp.where(jnp.isfinite(value), value, -jnp.inf)

        def lml_fwd(ls, s2, noise, x, y):
            K = gram(x, ls, s2, noise)
            L = chol(K)
            z = fwd(L, y)
            alpha = bwd(L, z)
            value = (-0.5 * jnp.sum(z * z) - logdiag(L)
                     - 0.5 * N * jnp.log(2.0 * jnp.asarray(jnp.pi, y.dtype)))
            value = jnp.where(jnp.isfinite(value), value, -jnp.inf)
            # K is NOT saved as a residual: the gram is cheap to rebuild and
            # holding a second (Npad,Npad) slab through the whole linesearch
            # breaches HBM at large-N f64.  In streaming-v2 mode the residual
            # is the explicit triangular INVERSE V = U^{-1} instead of the
            # factor: U is donated into the in-place inversion right after
            # the solves, so the fwd+bwd chain still peaks at ONE
            # (Npad,Npad) buffer (~10 GB at N=50k f32 on a 16 GB chip) and
            # the backward needs no gram/factorization at all — only the
            # full-rate V V^T strip matmuls.
            res_L = inv(L) if (use_streaming_v2 or use_ring_pairs) else L
            return value, (ls, s2, noise, x, res_L, alpha)

        row_shard = _row_sharding(mesh)

        # Identity-column chunk width for building K^{-1}: wider chunks mean
        # fewer sequential block-substitution sweeps (each sweep is NB steps),
        # at the cost of one replicated (Npad, cols) buffer.
        kinv_cols = min(Npad, max(B, 2048))
        n_kinv_chunks = -(-Npad // kinv_cols)

        @functools.partial(jax.jit, out_shardings=row_shard)
        def kinv_all(L):
            """K^{-1} as Linv^T Linv on a single device (one substitution
            sweep + one full-rate MXU matmul — half the sequential steps of
            the two-sweep chunked build), falling back to the chunked
            two-sweep build when the replicated (Npad, Npad) Linv would not
            fit (multi-device, or very large Npad)."""
            if pl_.S == 1 and Npad * Npad * L.dtype.itemsize <= self.KINV_LINV_BUDGET_BYTES:
                Linv = fwd(L, jnp.eye(Npad, dtype=L.dtype))      # L^{-1}
                return lax.with_sharding_constraint(
                    jnp.matmul(Linv.T, Linv, precision=lax.Precision.HIGHEST),
                    row_shard)

            def body(t, Kinv):
                col0 = jnp.minimum(t * kinv_cols, Npad - kinv_cols).astype(jnp.int32)
                cols = (jnp.arange(Npad, dtype=jnp.int32)[:, None]
                        == col0 + jnp.arange(kinv_cols, dtype=jnp.int32)[None, :]
                        ).astype(L.dtype)
                chunk = bwd(L, fwd(L, cols))         # (Npad, kinv_cols) replicated
                return lax.dynamic_update_slice(Kinv, chunk, _i32(0, col0))

            Kinv0 = lax.with_sharding_constraint(
                jnp.zeros((Npad, Npad), dtype=L.dtype), row_shard)
            return lax.fori_loop(0, n_kinv_chunks, body, Kinv0)

        def lml_bwd(res, gbar):
            ls, s2, noise, x, L, alpha = res
            if use_streaming_v2 or use_ring_pairs:
                # res carries V = U^{-1} (inverted in place during the
                # forward); K^{-1} strips are single full-rate V V^T matmuls
                # instead of per-strip substitution sweeps (which are
                # latency-bound: 2 x NB sequential block steps per strip).
                dls, ds2, dnoise = grads_stream(L, alpha, x, ls, s2, noise)
            elif grads_stream is not None:
                dls, ds2, dnoise = grads_stream(L, alpha, x, ls, s2, noise)
            else:
                K = gram(x, ls, s2, noise)        # recomputed, not stored
                Kinv = kinv_all(L)
                dls, ds2, dnoise = grads(K, Kinv, alpha, x, ls, s2, noise)
            return (gbar * dls, gbar * ds2, gbar * dnoise,
                    jnp.zeros_like(x), jnp.zeros_like(alpha))

        lml.defvjp(lml_fwd, lml_bwd)
        return lml

    def _cast_hypers(self, x_dev, ls, s2, noise):
        """Cast hyperparameters to the staged arrays' working dtype — mixed
        f64 numpy hyperparameters with f32 staged data otherwise crash the
        ring-gram dynamic_update_slice (and would silently select the
        emulated-f64 path on TPU)."""
        dt = x_dev.dtype
        return (jnp.asarray(ls, dt), jnp.asarray(s2, dt), jnp.asarray(noise, dt))

    def lml(self, ls, s2, noise, x_dev, y_dev):
        """Exact LML (scalar). Differentiable in ls/s2/noise."""
        ls, s2, noise = self._cast_hypers(x_dev, ls, s2, noise)
        return self._lml(ls, s2, noise, x_dev, y_dev)

    # -- posterior ----------------------------------------------------------- #

    #: evaluate the refinement residual's f64 gram strips through the
    #: float-float exp tier (ops.fastmath.ff_exp_nonpos, ~3e-11 relative):
    #: 'auto' (default) engages it on accelerator backends, where the
    #: O(N^2) emulated-f64 transcendental is the dominant cost of every
    #: refinement round (posterior_alpha, make_psi_solver), and keeps the
    #: native-f64 exp on CPU (fast and exact). True/False force.
    RESIDUAL_FF_EXP = 'auto'

    #: contract the residual's f64 K-row strips against alpha by elementwise
    #: multiply + reduce when the RHS is narrow (R <= this) on accelerators:
    #: an emulated-f64 GEMV runs off the MXU ~10x slower than the reduction
    #: (benchmarks/egsa_ops.py) while GEMM-shaped R (the psi solver's ~M L^2
    #: factors) amortizes the MXU's multi-pass f64 emulation and keeps the
    #: matmul. None = auto (4 on accelerators, 0 — i.e. always the BLAS
    #: matmul — on CPU); an int forces that threshold on any backend.
    RESIDUAL_MV_REDUCE_MAX_R = None

    def _residual_f64(self):
        """Jitted distributed residual r = y - K alpha with the gram row-slab
        recomputed in float64 on the fly — the refinement direction for
        mixed-precision posterior solves (never materializes a full f64 K)."""
        if getattr(self, '_residual_cached', None) is not None:
            return self._residual_cached
        from romcomma_tpu.ops.gram import rbf_gram
        ff = (jax.default_backend() != 'cpu'
              if self.RESIDUAL_FF_EXP == 'auto' else bool(self.RESIDUAL_FF_EXP))
        rbf_gram = functools.partial(rbf_gram, ff_exp=ff)
        mv_max_r = (self.RESIDUAL_MV_REDUCE_MAX_R
                    if self.RESIDUAL_MV_REDUCE_MAX_R is not None
                    else (4 if jax.default_backend() != 'cpu' else 0))
        pl_, mesh = self.plan, self.mesh
        cB = pl_.c * pl_.B
        Npad = pl_.Npad
        real = jnp.asarray(pl_.dtype_rows_mask)

        B = pl_.B
        c = pl_.c

        def local(x_full, y, alpha, ls, s2, noise):
            me = lax.axis_index('n')
            rows0 = me * cB
            y_local = lax.dynamic_slice(y, _i32(rows0, 0), (cB, y.shape[1]))

            def body(ci, r):
                # One B-row strip of the f64 gram at a time: a full (cB,Npad)
                # f64 slab (plus sqdist temporaries) breaches HBM at N=20k.
                b0 = rows0 + ci * B
                x_rows = lax.dynamic_slice(x_full, _i32(b0, 0), (B, x_full.shape[1]))
                Krow = rbf_gram(x_rows, x_full, ls, s2)        # f64 (B, Npad)
                row_real = lax.dynamic_slice(real, _i32(b0), (B,))
                Krow = (Krow * row_real[:, None] * real[None, :]
                        + (jnp.arange(Npad)[None, :] == (b0 + jnp.arange(B))[:, None])
                        * jnp.where(row_real, noise, 1.0)[:, None])
                if 0 < alpha.shape[1] <= mv_max_r:
                    # narrow RHS: emulated-f64 GEMV off the MXU — multiply
                    # + reduce instead (exact f64 elementwise arithmetic)
                    Ka_row = jnp.stack(
                        [jnp.sum(Krow * alpha[:, j][None, :], axis=1)
                         for j in range(alpha.shape[1])], axis=1)
                else:
                    Ka_row = jnp.matmul(Krow, alpha,
                                        precision=lax.Precision.HIGHEST)
                return lax.dynamic_update_slice(r, Ka_row, _i32(ci * B, 0))

            Ka = lax.fori_loop(0, c, body, jnp.zeros_like(y_local))
            return y_local - Ka                                # rows sharded

        fn = _shard_map(local, mesh=mesh,
                        in_specs=(P(), P(), P(), P(), P(), P()),
                        out_specs=P('n'))
        self._residual_cached = jax.jit(fn)
        return self._residual_cached

    #: relative-residual convergence floor of the posterior refinement:
    #: once ||y - K alpha|| <= REFINE_RTOL * ||y|| the solve is f64-grade
    #: for every consumer (the GSA tiers sit at |dS| ~ 1e-5-6) and further
    #: rounds are pure cost — each one rebuilds an O(N^2) f64 gram on the
    #: fly (~0.7 s at N=20k, ~4.5 s at 50k on TPU; measured
    #: benchmarks/posterior_phase.py: round 1 already lands at 6e-11
    #: relative on the benchmark posterior, round 2 at 2e-14).
    REFINE_RTOL: float = 1e-9

    #: relative-residual QUALITY FLOOR of the refined posterior: if the
    #: safeguarded refinement stalls above this, the factor itself is the
    #: problem (the CHOL_PRECISION=HIGH bf16x3 trailing updates lose ground
    #: to a true-f32 factor once cond(K) ~ N s2/noise reaches ~2e6 —
    #: measured 3.4e-2 relative alpha error at the converged north-star
    #: optimum vs 5.6e-7 from a true-f32 factor + refinement) — the engine
    #: refactorizes once at HIGHEST precision and refines again.
    ALPHA_QUALITY_RTOL: float = 1e-6

    #: conditioning above which posterior_alpha factors at HIGHEST precision
    #: DIRECTLY: the HIGH (bf16x3) factor's refinement provably stalls there
    #: (measured floor 3.4e-2 alpha error at cond ~2.1e6, round 4) and the
    #: old path paid a doomed HIGH Cholesky + stalled rounds before
    #: escalating. Set at the same decade the GSA f32-planes gate uses.
    HIGH_FACTOR_COND_LIMIT: float = 1e6
    #: f64 (Npad,Npad) bytes allowed for the last-rung true-f64 posterior
    #: rescue (one emulated-f64 factorization); past it the deep refinement
    #: is the ceiling.
    F64_RESCUE_BUDGET_BYTES: int = 12 * 2 ** 30

    def _chol_precise(self):
        """A HIGHEST-precision factorization for the refinement escalation
        (lazily built; None when the production factor is already HIGHEST)."""
        if self.CHOL_PRECISION == lax.Precision.HIGHEST:
            return None
        if getattr(self, '_chol_precise_cached', None) is None:
            if self._engine == 'upper':
                from romcomma_tpu.ops import blocked
                bb = max(self.plan.B, min(self.DENSE_BLOCK, self.plan.Npad))
                self._chol_precise_cached = jax.jit(
                    functools.partial(blocked.cholesky_blocked_upper_2level,
                                      block=bb,
                                      super_block=self.DENSE_SUPER_BLOCK,
                                      precision=None),
                    donate_argnums=(0,))
            elif self._engine == 'cyclic2':
                from romcomma_tpu.parallel.cyclic_deferred import cholesky_deferred
                self._chol_precise_cached = cholesky_deferred(
                    self.plan, self.mesh, self.DENSE_SUPER_BLOCK,
                    precision=None)
            else:
                return None          # cyclic: already HIGHEST everywhere
        return self._chol_precise_cached

    def posterior_alpha(self, ls, s2, noise, x_dev, y_dev, refine: int = 2):
        """alpha = K⁻¹ y (stored order, replicated, float64) and L (row-
        sharded). When the working dtype is f32, up to ``refine`` rounds of
        mixed-precision iterative refinement (f32 factor, f64 residuals
        against an on-the-fly f64 gram) recover f64-grade accuracy — an f32
        solve alone breaks down once cond(K) ~ N s2/noise nears 1/eps_f32.
        Rounds stop early once the true residual reaches REFINE_RTOL
        relative to ||y||; a stall above ALPHA_QUALITY_RTOL escalates the
        factor to HIGHEST precision once and refines again (round-4 fix:
        the HIGH-tier factor stalls refinement at the converged optimum)."""
        ls, s2, noise = self._cast_hypers(x_dev, ls, s2, noise)
        # Round-5 shortcut: at conditioning where the HIGH (bf16x3) factor
        # is KNOWN to stall iterative refinement (measured: alpha error
        # floor 3.4e-2 at the converged optimum's cond ~2.1e6), factor at
        # HIGHEST precision DIRECTLY instead of paying a doomed HIGH
        # Cholesky plus its stalled refinement rounds and then escalating
        # (round-4's path). Saves one (Npad, Npad) factorization + 2-3
        # O(N^2) f64 residual evaluations per converged-model GSA call.
        direct_precise = None
        if x_dev.dtype != jnp.float64 and refine > 0:
            cond_est = (self.plan.N * float(np.max(np.asarray(s2)))
                        / max(float(np.min(np.asarray(noise))), 1e-300))
            if cond_est > self.HIGH_FACTOR_COND_LIMIT:
                direct_precise = self._chol_precise()
        K = self._gram(x_dev, ls, s2, noise)
        L = direct_precise(K) if direct_precise is not None else self._chol(K)
        z = self._fwd(L, y_dev)
        alpha = self._bwd(L, z)
        if x_dev.dtype == jnp.float64 or refine <= 0:
            return alpha, L
        residual = self._residual_f64()
        f64 = jnp.float64
        x64 = jnp.asarray(x_dev, f64)
        y64 = jnp.asarray(y_dev, f64)
        ls64, s264, n64 = (jnp.asarray(ls, f64), jnp.asarray(s2, f64),
                           jnp.asarray(noise, f64))
        norm_y = float(jnp.linalg.norm(y64))
        tol = self.REFINE_RTOL * norm_y

        def refine_with(L, alpha0, rounds):
            # Safeguarded refinement: iterative refinement diverges once
            # eps_factor * cond(K) exceeds ~1, so keep the iterate with the
            # smallest true (f64) residual, never a fixed iteration count.
            alpha = jnp.asarray(alpha0, f64)
            r = residual(x64, y64, alpha, ls64, s264, n64)
            best_alpha, best_norm = alpha, float(jnp.linalg.norm(r))
            for _ in range(rounds):
                if best_norm <= tol:
                    break
                d = self._bwd(L, self._fwd(L, jnp.asarray(r, x_dev.dtype)))
                alpha = alpha + jnp.asarray(d, f64)
                r = residual(x64, y64, alpha, ls64, s264, n64)
                norm = float(jnp.linalg.norm(r))
                if not np.isfinite(norm) or norm >= best_norm:
                    break
                best_alpha, best_norm = alpha, norm
            return best_alpha, best_norm

        # direct-HIGHEST factors get the deep budget immediately (they ARE
        # the escalation rung, minus the wasted HIGH attempt)
        best_alpha, best_norm = refine_with(
            L, alpha, max(refine, 40) if direct_precise is not None else refine)
        escalated = direct_precise is not None
        rescued = False
        # REFINE_RTOL=inf is the explicit opt-out of refinement cost — the
        # quality-floor escalations honor it too.
        if (best_norm > self.ALPHA_QUALITY_RTOL * norm_y
                and np.isfinite(tol)
                and direct_precise is None):
            chol_precise = self._chol_precise()
            if chol_precise is not None:
                escalated = True
                L = z = None    # free the HIGH factor BEFORE the rebuild —
                #                 two resident (Npad,Npad) buffers would
                #                 breach HBM at N=50k
                K = self._gram(x_dev, ls, s2, noise)
                L = chol_precise(K)
                alpha2 = self._bwd(L, self._fwd(L, y_dev))
                # Deep budget: an f32-grade factor contracts the residual by
                # ~eps_f32*cond per round (~0.25 at the measured cond 2e6,
                # ~0.6 at N=50k's 5e6), so crossing to the 1e-9 target can
                # take tens of rounds of one O(N^2) f64 residual each —
                # one-shot analytics cost, and the monotone safeguard stops
                # a stalled/diverging sequence immediately, so the budget
                # only spends while it is actually converging.
                alpha2, norm2 = refine_with(L, alpha2, max(refine, 40))
                if norm2 < best_norm:
                    best_alpha, best_norm = alpha2, norm2
        if (best_norm > self.ALPHA_QUALITY_RTOL * norm_y
                and np.isfinite(tol)
                and self.plan.Npad ** 2 * 8 <= self.F64_RESCUE_BUDGET_BYTES):
            # Last rung: ONE true-f64 engine solve (emulated on TPU — slow
            # but exact; the same rescue dtype the calibration ladder uses,
            # models/gpr.py). Infeasible past ~38k rows (f64 (Npad,Npad)
            # exceeds HBM); there the deep refinement above is the ceiling.
            rescued = True
            L = K = None
            # Same plan (N, S, B) -> the stored layout is identical: reuse
            # the staged arrays cast to f64 instead of re-staging from host.
            # Same plan AND same engine: dense_kernels=True alone would
            # auto-select cyclic2 at N>=16384 even when this engine is
            # 'upper', compiling a second engine whose f64 emulated compile
            # is ~7x slower, for a one-shot solve (ADVICE r4).
            dgp64 = DistributedGP(self.plan.N, self.mesh, block=self.plan.B,
                                  dtype=np.float64, engine=self._engine)
            x64s = jax.device_put(x64, _row_sharding(self.mesh))
            K64 = dgp64._gram(x64s, ls64, s264, n64)
            L64 = dgp64._chol(K64)
            alpha3 = jnp.asarray(dgp64._bwd(L64, dgp64._fwd(L64, y64)), f64)
            r3 = residual(x64, y64, alpha3, ls64, s264, n64)
            norm3 = float(jnp.linalg.norm(r3))
            if np.isfinite(norm3) and norm3 < best_norm:
                best_alpha, best_norm = alpha3, norm3
            del L64, K64, dgp64
            # the caller still receives a working-dtype factor
            K = self._gram(x_dev, ls, s2, noise)
            L = self._chol(K)
        self.last_refine = {'final_rel': best_norm / max(norm_y, 1e-300),
                            'escalated': escalated, 'rescued': rescued}
        return best_alpha, L

    def predict(self, ls, s2, noise, x_dev, y_dev, Xs: np.ndarray):
        """Posterior mean/variance at host test points Xs (o, M)."""
        from romcomma_tpu.ops.gram import rbf_gram
        ls, s2, noise = self._cast_hypers(x_dev, ls, s2, noise)
        alpha, L = self.posterior_alpha(ls, s2, noise, x_dev, y_dev)
        xs = jnp.asarray(np.asarray(Xs), x_dev.dtype)
        # Ks in stored order: k(x_stored, xs), zero for padding rows.
        real = jnp.asarray(self.plan.dtype_rows_mask)
        Ks = rbf_gram(x_dev, xs, ls, s2) * real[:, None]           # (Npad, o)
        mean = jnp.matmul(Ks.T, alpha, precision=lax.Precision.HIGHEST)  # (o, 1)
        A = self._fwd(L, Ks)                                       # (Npad, o)
        var = jnp.maximum(s2 - jnp.sum(A * A, axis=0), 0.0) + noise
        return mean[:, 0], var

    #: N at/above which error-GSA psi integrals use the DEVICE psi solver
    #: (working-dtype factor + safeguarded f64 iterative refinement) instead
    #: of a host dense f64 K_cho build: the host path materializes an f64
    #: (N,N) gram (3.2 GB at N=20k, 20 GB at N=50k) plus a host-CPU
    #: Cholesky (~1 min at 20k, ~14 min at 50k) — infeasible past ~20k.
    #: On ACCELERATOR backends 'auto' uses the device solver at every N:
    #: it reuses the posterior factor (~1 s) where the host build measured
    #: 69.6 s at N=8192 on the tunnelled TPU, at |dS|/|dT| ~5e-9 vs the
    #: host path's 5e-14 (both far inside the 1e-6 acceptance gate). This
    #: threshold only governs 'auto' on CPU backends, where native-f64
    #: host builds are cheap and exact.
    PSI_SOLVER_MIN_N: int = 16384

    def make_psi_solver(self, ls, s2, noise, x_dev, refine: int = 40,
                        factor=None):
        """K⁻¹-application in ORIGINAL row order for the error-GSA psi
        integrals (gsa/factorized_errors.py psi_solver mode): ONE
        working-dtype factorization on this engine + safeguarded f64
        iterative refinement against on-the-fly f64 gram row strips — no
        dense f64 (N,N) buffer is ever built, on host or device. The
        ``refine`` budget is deep (round-4): at a converged optimum's
        cond ~ 2e6+ the per-round contraction is only ~0.25-0.6, and the
        monotone safeguard exits immediately on stall, so the budget spends
        only while converging — exactly posterior_alpha's policy. The
        factorized error engine pairs (raw, K⁻¹-solved) factors so every
        mu_psi quadform is f1ᵀ K⁻¹ f2, replacing the K_cho half-solves.

        ``factor``: an already-computed engine factor of THIS (ls, s2,
        noise, x_dev) gram (e.g. posterior_alpha's second return) — reused
        verbatim. Passing it is mandatory practice at large N: a second
        (Npad, Npad) factorization while the first factor is still resident
        is exactly 2 dense buffers — 20 GB at N=50k f32, an HBM OOM on one
        v5e chip (measured, chain10); reuse keeps the peak at one.

        Returns fn(factor (..., N) f64) -> K⁻¹ factor, f64, same shape.
        Eager-only (called from the host-paced error pass)."""
        ls, s2, noise = self._cast_hypers(x_dev, ls, s2, noise)
        if factor is None:
            K = self._gram(x_dev, ls, s2, noise)
            Lf = self._chol(K)
        else:
            Lf = factor
        residual = self._residual_f64()
        pl_ = self.plan
        f64 = jnp.float64
        x64 = jnp.asarray(x_dev, f64)
        hyp64 = (jnp.asarray(ls, f64), jnp.asarray(s2, f64),
                 jnp.asarray(noise, f64))

        def solver(factor):
            shape = factor.shape
            R = int(np.prod(shape[:-1]))
            f = np.asarray(factor, dtype=np.float64).reshape(R, pl_.N).T
            rhs = to_stored(pl_, f)                         # (Npad, R)
            y64 = jnp.asarray(rhs)
            z = jnp.asarray(self._bwd(Lf, self._fwd(
                Lf, jnp.asarray(rhs, x_dev.dtype))), f64)
            r = residual(x64, y64, z, *hyp64)
            best, best_norm = z, float(jnp.linalg.norm(r))
            tol = self.REFINE_RTOL * float(jnp.linalg.norm(y64))
            for _ in range(refine):
                if best_norm <= tol:
                    break
                d = self._bwd(Lf, self._fwd(Lf, jnp.asarray(r, x_dev.dtype)))
                z = z + jnp.asarray(d, f64)
                r = residual(x64, y64, z, *hyp64)
                norm = float(jnp.linalg.norm(r))
                if not np.isfinite(norm) or norm >= best_norm:
                    break
                best, best_norm = z, norm
            out = from_stored(pl_, np.asarray(best))        # (N, R)
            # numpy return: in host-paced mode the assembly operands are
            # committed to the host CPU — a device-committed result here
            # could not mix with them (uncommitted numpy mixes with both).
            return np.ascontiguousarray(out.T).reshape(shape)

        return solver

    def sobol_indices(self, ls, s2, noise, x_dev, y_dev, X: np.ndarray,
                      kind='first_order', n_chunk: int | None = None,
                      gsa_dtype=None, error: bool = False,
                      is_T_partial: bool = True,
                      intervals_mixed: bool | None = None,
                      error_solver: str = 'auto'):
        """Closed-form Sobol' indices of the trained distributed GP.

        The plain (no-error) ClosedSobol needs only K^{-1}y from the posterior
        (the Cholesky factor itself is used only by the error path), so the
        distributed solves feed the standard calibrator directly. ALL slices
        of all requested kinds evaluate in one factorized O(N^2 M) pass
        (gsa.calibrators.ClosedSobol.marginalize_intervals) — the posterior
        solve and the per-dim exponent work are shared across kinds.

        ``kind``: one of ('first_order'|'closed'|'total') -> {m: S_m}; or a
        tuple of kinds -> {kind: {m: S_m}} computed in the same pass.

        ``gsa_dtype``: working dtype of the interval pass. Default float64
        (full safety). jnp.float32 is the measured-safe fast mode for the
        FACTORIZED pass — the per-slice quadforms sum positive-pdf-weighted
        terms, so with the f64-refined posterior feeding it, |dS| ~ 1e-6 at
        N=4096 (tests/test_gsa_chunked.py pins 1e-4) — worth ~6x on TPU
        where f64 is emulated.

        ``error``: also compute the Sobol' standard errors W/T through the
        factorized scan engine (gsa/factorized_errors.py; always f64 planes
        for the W/T sweep itself — but pass ``gsa_dtype=np.float32`` to opt
        the BASE V pass into the f32-planes + f64-accumulation tier
        (meta fast_V), removing the emulated-f64 V pass from the run.
        Deltas vs the all-f64 oracle are N- and conditioning-dependent:
        dT <= 1.4e-5 / dS ~ 6e-6 at N=2048/M=10 with unit hypers;
        dS ~ 2.6e-4 / dT ~ 5.5e-5 on a trained tight-lengthscale Ishigami
        posterior at N=120, where the ratio cancellations average less). The
        psi integrals need the dense Cholesky factor of K in ORIGINAL row
        order, which is refactorized in f64 on the host CPU (one-shot
        analytics cost; the distributed factor is block-cyclic-permuted and
        cannot be reused). Returns {'S': by_kind, 'T': by_kind} instead of
        the plain S structure. ``is_T_partial`` selects the reference's
        partial/total T formula (calibrators.py _T).

        Multi-output: pass ``ls`` (L,M), ``s2``/``noise`` (L,) and
        ``y_dev`` (Npad, L) — per-output indices come back as a LIST of
        the single-output structures (variant GPs are independent, so the
        outputs share only X; the per-dim exponent planes differ per
        output and are evaluated sequentially).
        """
        import time
        t_start = time.time()
        from romcomma_tpu.gsa.calibrators import ClosedSobol, ClosedSobolWithError
        t_import = time.time() - t_start
        t0 = time.time()
        # Device->host fetch of the (tiny) hyperparameters. Labeled because
        # the axon tunnel intermittently stalls THIS one RPC for minutes
        # (observed 30-440 s at any N, while every subsequent dispatch runs
        # at full speed) — an unlabeled stall here polluted whole-run wall
        # times with no attributable phase. Callers holding host values
        # (numpy/float) skip the fetch entirely.
        ls_arr = np.asarray(ls)
        self._t_args_fetch = time.time() - t0
        if ls_arr.ndim == 2:
            s2_arr = np.asarray(s2).reshape(ls_arr.shape[0])
            nz_arr = np.asarray(noise).reshape(ls_arr.shape[0])
            if not error:
                return self._sobol_indices_multi(
                    ls_arr, s2_arr, nz_arr, x_dev, y_dev, X, kind=kind,
                    n_chunk=n_chunk, gsa_dtype=gsa_dtype,
                    intervals_mixed=intervals_mixed)
            return self._sobol_indices_multi_error(
                ls_arr, s2_arr, nz_arr, x_dev, y_dev, X, kind=kind,
                n_chunk=n_chunk, gsa_dtype=gsa_dtype,
                is_T_partial=is_T_partial, intervals_mixed=intervals_mixed,
                error_solver=error_solver)
        kinds = (kind,) if isinstance(kind, str) else tuple(kind)
        t0 = time.time()
        # Posterior cache: repeated analytics on the SAME trained model
        # (same hyperparameters, same staged data) reuse the refined alpha
        # — the deep HIGHEST-refinement at a converged optimum costs ~4 s
        # at N=20k, and a serving deployment computes it once per model
        # (the reference's GPflow caches its posterior the same way). The
        # error path still re-solves: it needs the factor, which is never
        # cached (a 10 GB resident buffer at N=50k).
        cache_key = (np.asarray(ls).tobytes(), float(np.asarray(s2)),
                     float(np.asarray(noise)), id(x_dev), id(y_dev))
        cached = getattr(self, '_alpha_cache', None)
        if not error and cached is not None and cached[0] == cache_key:
            alpha = cached[1]
        else:
            alpha_stored, L_post = self.posterior_alpha(ls, s2, noise,
                                                        x_dev, y_dev)
            alpha = from_stored(self.plan, np.asarray(alpha_stored))   # (N,1)
            if not error:
                # Drop the factor eagerly — only the error psi solver needs
                # it, and at N=50k it is a 10 GB resident buffer.
                del L_post
                self._alpha_cache = (cache_key, alpha)
        t_posterior = time.time() - t0
        N, M = self.plan.N, X.shape[1]
        meta = {} if n_chunk is None else {'n_chunk': n_chunk}
        on_accel = jax.default_backend() != 'cpu'
        # Interval-pass precision policy (all deltas vs the f64 oracle,
        # benchmarks/gsa_intervals.py):
        #   NO-ERROR on accelerators: f32 planes + f64 quadform
        #   accumulation (intervals_acc_f64). The emulated-f64 exponent
        #   arithmetic dominates the pass on TPU — measured N=50000/M=30:
        #   pure f64 921 s, mixed (f64 exponents + shifted-f32 exp) 705 s,
        #   plain f32 29 s at |dS| 1.9e-5 vs mixed's 1.26e-5; N=20000:
        #   221 / 133 / 49 s at |dS| 4.9e-6 vs mixed's 5.3e-6. f32 planes
        #   cost NOTHING in measured accuracy, and the f64 accumulation
        #   tier protects the cancellation-sensitive across-chunk sums
        #   where plain f32 had the least headroom. gsa_dtype=float32
        #   opts into pure f32; gsa_dtype=np.float64 forces f64 planes
        #   (then intervals_mixed picks the exp tier, default shifted-f32).
        #   All f32-tier exps are log-sum-exp-shifted — a naive f32 exp
        #   overflows at E > 88, reached at N=50k.
        #   ERROR passes stay f64 planes with the float-float 'ff' exp
        #   tier (~3e-11): T = sqrt of a near-cancelling quadform
        #   difference that amplifies plane noise ~1e3, so f32's ~6e-8
        #   floors near-zero T at ~3e-3 while 'ff' keeps every T within
        #   ~1e-7 of the f64 oracle.
        from romcomma_tpu.gsa.calibrators import f32_planes_safe
        gate_ok = f32_planes_safe(N, float(np.asarray(s2)),
                                  float(np.asarray(noise)))
        if gsa_dtype is None and not error and on_accel and gate_ok:
            f64 = jnp.float32
            meta['intervals_acc_f64'] = True
        else:
            f64 = (jnp.float64 if (gsa_dtype is None or error)
                   else jnp.dtype(gsa_dtype))
            if error and gsa_dtype is not None and \
                    jnp.dtype(gsa_dtype) == jnp.float32:
                # Opt-in fast error mode: the W/T sweep keeps f64 planes +
                # 'ff' exp (T needs them — see the policy note above), but
                # the base V pass runs a reduced twin (calibrators.py
                # fast_V): the f32-planes tier inside its conditioning
                # gate, the df double-f32 tier beyond it (an f32 twin
                # there would only trip the V-sanity rerun and pay the
                # pass twice). Measured vs the all-f64 oracle at
                # N=2048/M=10: |dT| <= 1.4e-5, |dS| ~ 6e-6; on TPU it
                # removes the emulated-f64 V pass (~167 s of a ~740 s
                # N=20k error run).
                meta['fast_V'] = 'f32' if gate_ok else 'df'
        if intervals_mixed is None:
            # Tier ladder of f64 planes on accelerators: shifted-f32 exp
            # (~1e-7) inside the f32 gate; the 'df' double-f32 pipeline
            # (~2e-12 planes at near-f32 rate, ops/fastmath.py) up to its
            # own measured ceiling; PURE f64 planes + native exp beyond —
            # the same amplification that breaks f32 planes breaks a 1e-7
            # exp tier (measured: S in [-0.18, 0.82] vs the oracle's
            # [0.44, 0.56] at the converged optimum under the shifted
            # tier, with a 5e-7-accurate alpha), and breaks BOTH reduced
            # f64 tiers ('df' AND 'ff') at cond ~1e8 (3-4e-4 — the
            # DF_PLANES_COND_LIMIT anchors). ERROR passes keep f64 planes
            # + 'ff' exp (the W/T sweep engine's tier).
            from romcomma_tpu.gsa.calibrators import DF_PLANES_COND_LIMIT
            cond_est = (N * float(np.max(np.asarray(s2)))
                        / max(float(np.min(np.asarray(noise))), 1e-300))
            if not (on_accel and f64 == jnp.float64):
                intervals_mixed = False
            elif error:
                intervals_mixed = 'ff'
            elif gate_ok:
                intervals_mixed = True
            elif cond_est <= DF_PLANES_COND_LIMIT:
                intervals_mixed = 'df'
            else:
                intervals_mixed = False          # exact rung: native f64
        meta['intervals_mixed'] = intervals_mixed
        t0 = time.time()
        if error:
            use_device = (error_solver == 'device'
                          or (error_solver == 'auto'
                              and (on_accel
                                   or self.plan.N >= self.PSI_SOLVER_MIN_N)))
            if use_device:
                # Device psi solver: no dense f64 (N,N) anywhere — the f32
                # engine factor + f64-refined FULL solves (VERDICT r2 #3).
                # The posterior factor is the SAME gram's factor: reuse it
                # so exactly one (Npad, Npad) buffer is ever resident.
                meta['psi_solver'] = self.make_psi_solver(ls, s2, noise, x_dev,
                                                          factor=L_post)
                del L_post
                K_cho = jnp.zeros((1, 1, 1), f64)
            else:
                del L_post
                from romcomma_tpu.ops.gram import rbf_gram
                from romcomma_tpu.ops.linalg import add_diag
                from romcomma_tpu.ops.linalg import cholesky as dense_cholesky
                cpu = jax.devices('cpu')[0]
                with jax.default_device(cpu):
                    x64 = jnp.asarray(np.asarray(X), jnp.float64)
                    K = rbf_gram(x64, x64, jnp.asarray(np.asarray(ls), jnp.float64),
                                 jnp.asarray(float(s2), jnp.float64))
                    K_cho = dense_cholesky(add_diag(K, jnp.asarray(float(noise),
                                                                   jnp.float64)))
                K_cho = jnp.asarray(np.asarray(K_cho), f64)
            meta['is_T_partial'] = bool(is_T_partial)
        else:
            K_cho = jnp.zeros((1, 1, 1), f64)
        t_kcho = time.time() - t0
        t0 = time.time()
        # defer_V: V0 comes from the (0, M) interval below — no separate
        # full-interval V dispatch.
        cls = ClosedSobolWithError if error else ClosedSobol
        # NO-ERROR setup runs on the HOST CPU: the calibrator's _calibrate
        # precompute is ~50 tiny O(N M) eager ops, which on a tunnelled
        # accelerator cost a ~60 ms round-trip EACH (the 4.3 s 'setup'
        # phase of BENCH_r04) but run in milliseconds of native f64 on the
        # host; the interval pack then ships to the device in ONE transfer
        # (meta['pack_device'] — marginalize_intervals moves it).
        import contextlib
        from romcomma_tpu.base.definitions import host_cpu_device
        if on_accel and not error:
            meta['pack_device'] = jax.devices()[0]

            def build_ctx():
                return jax.default_device(host_cpu_device(True))
        else:
            build_ctx = contextlib.nullcontext
        # Hyperparameters may arrive mesh-replicated from calibrate(); pull
        # them to host values so the calibrator's arrays are unsharded (the
        # error engine commits its final solves to the host CPU device, and
        # committed-vs-mesh-replicated operands cannot mix).
        with build_ctx():
            cal = cls.from_arrays(
                F=jnp.asarray([[float(np.asarray(s2))]], f64),
                K_cho=K_cho,
                K_inv_Y=jnp.asarray(alpha.T.reshape(1, 1, N), f64),
                Lambda=jnp.asarray(np.asarray(ls), f64)[None, :],
                X=jnp.asarray(np.asarray(X), f64),
                is_F_diagonal=True, L=1, M=M, N=N, defer_V=True, **meta)
        t_setup = time.time() - t0
        t0 = time.time()
        if self.mesh.devices.size > 1:
            # Multi-device: the factorized interval sweeps (V and W/T) shard
            # their q-chunk loops over the same ('n',) mesh as training —
            # analytics no longer serializes onto one device (gsa/mesh.py).
            cal.gsa_mesh = self.mesh
        family = {'first_order': [(m, m + 1) for m in range(M)],
                  'closed': [(0, m + 1) for m in range(M)],
                  'total': [(m + 1, M) for m in range(M)]}
        flat = [(0, M)] + [s for k in kinds for s in family[k]]
        # host-paced chunks: bounded dispatches for tunnelled TPU runtimes
        out = cal.marginalize_intervals(tuple(flat), host_paced=True)
        V_all = np.asarray(out['V'])[0, 0]
        # Post-pass sanity (second line of defense behind f32_planes_safe):
        # every V is a closed-Sobol' variance in [0, V_M]. A reduced-
        # precision tier that broke its cancellation envelope produces
        # negative or super-unit values (measured: V_M < 0 at the converged
        # north-star optimum) — escalate to full-f64 planes and rerun.
        V0 = float(V_all[0])
        v_sane = (np.all(np.isfinite(V_all)) and V0 > 0.0
                  and np.all(V_all >= -0.02 * V0)
                  and np.all(V_all <= 1.02 * V0))
        if not v_sane and (meta.get('intervals_acc_f64')
                           or meta.get('fast_V')
                           or f64 == jnp.float32
                           or meta.get('intervals_mixed')):
            import warnings
            warnings.warn(
                f'reduced-precision GSA interval tier produced invalid '
                f'variances (V0={V0:.3e}) at N={N} — escalating to f64 '
                f'planes with the native f64 exp and re-running.',
                RuntimeWarning)
            meta = {k: v for k, v in meta.items()
                    if k not in ('intervals_acc_f64', 'fast_V')}
            meta['intervals_mixed'] = False      # native f64 exp: exact rung
            f64 = jnp.float64
            with build_ctx():
                cal = cls.from_arrays(
                    F=jnp.asarray([[float(np.asarray(s2))]], f64),
                    K_cho=(K_cho if error else jnp.zeros((1, 1, 1), f64)),
                    K_inv_Y=jnp.asarray(alpha.T.reshape(1, 1, N), f64),
                    Lambda=jnp.asarray(np.asarray(ls), f64)[None, :],
                    X=jnp.asarray(np.asarray(X), f64),
                    is_F_diagonal=True, L=1, M=M, N=N, defer_V=True, **meta)
            if self.mesh.devices.size > 1:
                cal.gsa_mesh = self.mesh
            out = cal.marginalize_intervals(tuple(flat), host_paced=True)
            V_all = np.asarray(out['V'])[0, 0]
        self.last_gsa_timings = {'posterior_s': round(t_posterior, 1),
                                 'setup_s': round(t_setup, 1),
                                 'intervals_s': round(time.time() - t0, 1),
                                 'import_s': round(t_import, 1),
                                 'args_fetch_s': round(self._t_args_fetch, 1),
                                 'total_s': round(time.time() - t_start, 1)}
        self.last_gsa_timings.update(
            {f'iv_{k}': v for k, v in
             getattr(cal, 'last_interval_timings', {}).items()})
        if error:
            self.last_gsa_timings['k_cho_s'] = round(t_kcho, 1)
        S_out = self._kinds_from_V(V_all, kinds, M, kind)
        if not error:
            return S_out
        t0 = time.time()
        # forcing T materializes the deferred psi refinement solves (device)
        # and the host-side W/T assembly einsums — attribute them.
        T_all = np.asarray(out['T'])[0, 0][1:]
        self.last_gsa_timings['t_assembly_s'] = round(time.time() - t0, 1)
        T_by_kind = {k: {m: float(T_all[i * M + m]) for m in range(M)}
                     for i, k in enumerate(kinds)}
        return {'S': S_out,
                'T': T_by_kind[kind] if isinstance(kind, str) else T_by_kind}

    @staticmethod
    def _kinds_from_V(V_col: np.ndarray, kinds: tuple, M: int, kind):
        """{kind: {m: S}} from one output's V column vector laid out as
        [V0, kinds[0] slices (M), kinds[1] slices (M), ...]; the 'total'
        kind applies the reference's S_M - S_complement semantics."""
        V0 = float(V_col[0])
        S_all = V_col[1:] / V0
        by_kind = {}
        for i, k in enumerate(kinds):
            S_k = S_all[i * M:(i + 1) * M]
            by_kind[k] = {m: (1.0 - float(v) if k == 'total' else float(v))
                          for m, v in enumerate(S_k)}
        return by_kind[kind] if isinstance(kind, str) else by_kind

    def _sobol_indices_multi(self, ls: np.ndarray, s2: np.ndarray,
                             noise: np.ndarray, x_dev, y_dev, X: np.ndarray,
                             kind, n_chunk, gsa_dtype, intervals_mixed):
        """Multi-output (no-error) Sobol' indices in ONE shared interval
        pass: per-output posterior solves (the grams differ per output's
        hyperparameters), then gsa.calibrators.marginalize_intervals_stacked
        vmaps the factorized O(N^2 M) chunk step over outputs so every q
        chunk is streamed once for ALL outputs — instead of re-running the
        whole pass per output (the round-2 sequential loop; VERDICT r2 #4).
        Numerically identical to the per-output path (same ops, vmapped)."""
        import time
        import jax
        from romcomma_tpu.gsa.calibrators import (ClosedSobol,
                                                  marginalize_intervals_stacked)
        kinds = (kind,) if isinstance(kind, str) else tuple(kind)
        L_out = ls.shape[0]
        N, M = self.plan.N, X.shape[1]
        meta = {} if n_chunk is None else {'n_chunk': n_chunk}
        on_accel = jax.default_backend() != 'cpu'
        # Same precision policy as sobol_indices: f32 planes + f64 quadform
        # accumulation on accelerators (no-error pass) INSIDE the tier's
        # conditioning envelope (f32_planes_safe, worst output), f64
        # otherwise.
        from romcomma_tpu.gsa.calibrators import f32_planes_safe
        gate_ok = f32_planes_safe(N, s2, noise)
        if gsa_dtype is None and on_accel and gate_ok:
            f64 = jnp.float32
            meta['intervals_acc_f64'] = True
        else:
            f64 = jnp.float64 if gsa_dtype is None else jnp.dtype(gsa_dtype)
        if intervals_mixed is None:
            # same tier ladder as sobol_indices: 'df' double-f32 pipeline
            # once the conditioning gate failed (up to its own ceiling),
            # shifted-f32 exp inside the gate, pure f64 beyond
            from romcomma_tpu.gsa.calibrators import DF_PLANES_COND_LIMIT
            cond_est = (N * float(np.max(np.asarray(s2)))
                        / max(float(np.min(np.asarray(noise))), 1e-300))
            if not (f64 == jnp.float64 and on_accel):
                intervals_mixed = False
            elif gate_ok:
                intervals_mixed = True
            elif cond_est <= DF_PLANES_COND_LIMIT:
                intervals_mixed = 'df'
            else:
                intervals_mixed = False
        meta['intervals_mixed'] = intervals_mixed
        t0 = time.time()
        alphas = []
        for l in range(L_out):
            a_stored, _ = self.posterior_alpha(ls[l], s2[l], noise[l],
                                               x_dev, y_dev[:, l:l + 1])
            alphas.append(from_stored(self.plan, np.asarray(a_stored)))
        t_posterior = time.time() - t0
        t0 = time.time()
        family = {'first_order': [(m, m + 1) for m in range(M)],
                  'closed': [(0, m + 1) for m in range(M)],
                  'total': [(m + 1, M) for m in range(M)]}
        flat = [(0, M)] + [s for k in kinds for s in family[k]]

        def run_pass(f64p, meta_p):
            Xp = jnp.asarray(np.asarray(X), f64p)
            cals = [ClosedSobol.from_arrays(
                        F=jnp.asarray([[float(s2[l])]], f64p),
                        K_cho=jnp.zeros((1, 1, 1), f64p),
                        K_inv_Y=jnp.asarray(alphas[l].T.reshape(1, 1, N), f64p),
                        Lambda=jnp.asarray(ls[l], f64p)[None, :], X=Xp,
                        is_F_diagonal=True, L=1, M=M, N=N, defer_V=True,
                        **meta_p)
                    for l in range(L_out)]
            return marginalize_intervals_stacked(cals, tuple(flat),
                                                 host_paced=True)

        outs = run_pass(f64, meta)
        V_cols = [np.asarray(o['V'])[0, 0] for o in outs]
        sane = all(np.all(np.isfinite(V)) and V[0] > 0
                   and np.all(V >= -0.02 * V[0]) and np.all(V <= 1.02 * V[0])
                   for V in V_cols)
        if not sane and (f64 == jnp.float32 or meta.get('intervals_mixed')):
            # tier broke its cancellation envelope (see sobol_indices):
            # escalate every output to f64 planes + native f64 exp, rerun.
            import warnings
            warnings.warn(f'reduced-precision stacked GSA tier produced '
                          f'invalid variances at N={N} — escalating to f64 '
                          f'planes with the native f64 exp and re-running.',
                          RuntimeWarning)
            meta_p = {k: v for k, v in meta.items()
                      if k != 'intervals_acc_f64'}
            meta_p['intervals_mixed'] = False
            outs = run_pass(jnp.float64, meta_p)
            V_cols = [np.asarray(o['V'])[0, 0] for o in outs]
        self.last_gsa_timings = {'posterior_s': round(t_posterior, 1),
                                 'intervals_s': round(time.time() - t0, 1),
                                 'args_fetch_s': round(
                                     getattr(self, '_t_args_fetch', 0.0), 1),
                                 'outputs': L_out}
        return [self._kinds_from_V(V, kinds, M, kind) for V in V_cols]

    def _sobol_indices_multi_error(self, ls: np.ndarray, s2: np.ndarray,
                                   noise: np.ndarray, x_dev, y_dev,
                                   X: np.ndarray, kind, n_chunk, gsa_dtype,
                                   is_T_partial, intervals_mixed,
                                   error_solver):
        """Multi-output W/T error Sobol' indices in ONE stacked sweep:
        per-output posterior solves, then ONE stacked base V pass and ONE
        stacked factorized error sweep (gsa/calibrators.py
        marginalize_intervals_error_stacked; the chunk steps are vmapped
        over outputs) — instead of re-running both O(N^2 M) passes per
        output (the round-3 sequential loop; the reference's per-latent
        loop is gpr/models.py:340-342).  Numerically identical to L
        single-output ``sobol_indices(error=True)`` calls (same ops,
        vmapped).

        Precision policy matches the single-output error path: f64 planes +
        'ff' exp tier on accelerators for W/T; ``gsa_dtype=np.float32``
        opts the base V pass into the fast_V f32-planes tier.  The psi
        solvers are built LAZILY per output (meta['psi_solver_factory'])
        so at most one (Npad, Npad) engine factor is ever resident — L
        eager solvers would OOM the chip at large N."""
        import time
        t_start = time.time()
        from romcomma_tpu.gsa.calibrators import (
            ClosedSobolWithError, marginalize_intervals_error_stacked)
        kinds = (kind,) if isinstance(kind, str) else tuple(kind)
        L_out = ls.shape[0]
        N, M = self.plan.N, X.shape[1]
        on_accel = jax.default_backend() != 'cpu'
        meta = {} if n_chunk is None else {'n_chunk': n_chunk}
        f64 = jnp.float64
        if gsa_dtype is not None and jnp.dtype(gsa_dtype) == jnp.float32:
            # same fast_V tier ladder as the single-output error path
            from romcomma_tpu.gsa.calibrators import f32_planes_safe
            meta['fast_V'] = ('f32' if f32_planes_safe(N, s2, noise)
                              else 'df')
        if intervals_mixed is None:
            intervals_mixed = 'ff' if on_accel else False
        meta['intervals_mixed'] = intervals_mixed
        meta['is_T_partial'] = bool(is_T_partial)
        use_device = (error_solver == 'device'
                      or (error_solver == 'auto'
                          and (on_accel or N >= self.PSI_SOLVER_MIN_N)))
        t_posterior = 0.0
        t_kcho = 0.0
        X64 = jnp.asarray(np.asarray(X), f64)
        cals = []
        for l in range(L_out):
            t0 = time.time()
            a_stored, L_post = self.posterior_alpha(ls[l], s2[l], noise[l],
                                                    x_dev, y_dev[:, l:l + 1])
            alpha = from_stored(self.plan, np.asarray(a_stored))
            # The factor is NOT kept for the psi solver (single-output path
            # reuses it): L resident (Npad, Npad) factors would OOM at
            # large N — the lazy factory refactorizes one at a time.
            del L_post
            t_posterior += time.time() - t0
            meta_l = dict(meta)
            t0 = time.time()
            if use_device:
                hyp = (np.asarray(ls[l]).copy(), float(s2[l]),
                       float(noise[l]))
                meta_l['psi_solver_factory'] = (
                    lambda h=hyp: self.make_psi_solver(h[0], h[1], h[2],
                                                       x_dev))
                K_cho = jnp.zeros((1, 1, 1), f64)
            else:
                from romcomma_tpu.ops.gram import rbf_gram
                from romcomma_tpu.ops.linalg import add_diag
                from romcomma_tpu.ops.linalg import cholesky as dense_cholesky
                cpu = jax.devices('cpu')[0]
                with jax.default_device(cpu):
                    K = rbf_gram(X64, X64, jnp.asarray(np.asarray(ls[l]), f64),
                                 jnp.asarray(float(s2[l]), f64))
                    K_cho = dense_cholesky(add_diag(
                        K, jnp.asarray(float(noise[l]), f64)))
                K_cho = jnp.asarray(np.asarray(K_cho), f64)
            t_kcho += time.time() - t0
            cals.append(dict(
                F=jnp.asarray([[float(s2[l])]], f64),
                K_cho=K_cho,
                K_inv_Y=jnp.asarray(alpha.T.reshape(1, 1, N), f64),
                Lambda=jnp.asarray(np.asarray(ls[l]), f64)[None, :],
                X=X64, is_F_diagonal=True, L=1, M=M, N=N, defer_V=True,
                **meta_l))

        def build_cals(kwargs_list):
            built = [ClosedSobolWithError.from_arrays(**kw)
                     for kw in kwargs_list]
            if self.mesh.devices.size > 1:
                # The stacked W/T sweep shards its q chunks over the ('n',)
                # mesh (gsa/mesh.py error_sweep, psi_rank=5); the stacked
                # base V pass is single-device (as _sobol_indices_multi).
                for c in built:
                    c.gsa_mesh = self.mesh
            return built

        cal_kwargs, cals = cals, build_cals(cals)
        family = {'first_order': [(m, m + 1) for m in range(M)],
                  'closed': [(0, m + 1) for m in range(M)],
                  'total': [(m + 1, M) for m in range(M)]}
        flat = [(0, M)] + [s for k in kinds for s in family[k]]
        t0 = time.time()
        outs = marginalize_intervals_error_stacked(cals, tuple(flat),
                                                   host_paced=True)
        # V-sanity of the opt-in fast_V tier (same second line of defense as
        # sobol_indices): an insane base V escalates the whole stacked pass
        # to all-f64 V planes and reruns once.
        if meta.get('fast_V'):
            V_cols = [np.asarray(o['V'])[0, 0] for o in outs]
            sane = all(np.all(np.isfinite(V)) and V[0] > 0
                       and np.all(V >= -0.02 * V[0])
                       and np.all(V <= 1.02 * V[0]) for V in V_cols)
            if not sane:
                import warnings
                warnings.warn(f'fast_V base pass produced invalid variances '
                              f'at N={N} — escalating to f64 V planes and '
                              f're-running.', RuntimeWarning)
                cals = build_cals([{k: v for k, v in kw.items()
                                    if k != 'fast_V'} for kw in cal_kwargs])
                outs = marginalize_intervals_error_stacked(cals, tuple(flat),
                                                           host_paced=True)
        self.last_gsa_timings = {'posterior_s': round(t_posterior, 1),
                                 'k_cho_s': round(t_kcho, 1),
                                 'intervals_s': round(time.time() - t0, 1),
                                 'args_fetch_s': round(
                                     getattr(self, '_t_args_fetch', 0.0), 1),
                                 'total_s': round(time.time() - t_start, 1),
                                 'outputs': L_out}
        self.last_gsa_timings.update(
            {f'iv_{k}': v for k, v in
             getattr(cals[0], 'last_interval_timings', {}).items()})
        results = []
        for o in outs:
            S_out = self._kinds_from_V(np.asarray(o['V'])[0, 0], kinds, M,
                                       kind)
            T_all = np.asarray(o['T'])[0, 0][1:]
            T_by_kind = {k: {m: float(T_all[i * M + m]) for m in range(M)}
                         for i, k in enumerate(kinds)}
            results.append({'S': S_out,
                            'T': (T_by_kind[kind] if isinstance(kind, str)
                                  else T_by_kind)})
        return results

    # -- calibration ---------------------------------------------------------- #

    def calibrate(self, X: np.ndarray, Y: np.ndarray, ls0, s2_0, noise0,
                  maxiter: int = 5000, gtol: float = 1e-16,
                  callback=None, max_linesearch_steps: int | None = None,
                  mask: tuple = (1.0, 1.0, 1.0)):
        """L-BFGS maximization of the distributed LML, host-paced: each
        iteration is one bounded device dispatch (a fused whole-descent
        program at N>=20k exceeds tunnelled-runtime execution limits and
        compiles slowly). ``mask`` = (lengthscales, signal-variance, noise)
        trainability as 0/1 floats; frozen groups stay at their initial
        values, matching the fused path's META trainability system.
        Returns (ls, s2, noise), final LML, iterations."""
        from romcomma_tpu.ops import lbfgs
        from romcomma_tpu.ops.transforms import positive, positive_inverse
        from romcomma_tpu.models.params import NOISE_LOWER_BOUND

        x_dev, y_dev = self.stage(X, Y)
        dt = x_dev.dtype
        raw0 = (jnp.asarray(positive_inverse(np.asarray(ls0, dtype=dt), 0.0)),
                jnp.asarray(positive_inverse(np.asarray(s2_0, dtype=dt), 0.0)),
                jnp.asarray(positive_inverse(np.asarray(noise0, dtype=dt),
                                             NOISE_LOWER_BOUND)))
        frozen0 = raw0
        mask_f = tuple(float(m) for m in mask)
        if all(m == 1.0 for m in mask_f):
            merge = lambda raw: raw       # identity: keep bit-exact descent
        else:
            def merge(raw):
                return tuple(fv + m * (rv - fv)
                             for rv, fv, m in zip(raw, frozen0, mask_f))

        if (self.mesh.devices.size == 1
                and self._engine not in ('upper', 'cyclic2')
                and len(X) <= self.DENSE_DIRECT_MAX_N):
            # Degenerate mesh WITHOUT dense kernels: the block-cyclic
            # engine's generality costs ~5x per objective eval vs one dense
            # fused builtin-kernel program (1.894 vs 0.4-2.06 s/val+grad at
            # N=20000/M=30 f32), so callers who did not opt into the upper
            # engine get the fused direct program. The upper engine
            # (dense_kernels=True) measured FASTER than this fused program
            # at every N (8192: 0.125 vs 0.164 s; 14000: 0.417 vs 0.724 s;
            # 20000: 1.099 vs 2.065 s/val+grad, with ~20-40 s compiles vs
            # 110-585 s) and skips this branch — it is the production
            # single-device route (models/gpr.py _calibrate_variant_large).
            # Identical transforms and stopping rules; f32 factorization
            # breakdown (non-finite result) falls through to the blocked
            # engine below, exactly as before.
            from romcomma_tpu.ops.gram import rbf_gram
            from romcomma_tpu.ops.linalg import add_diag, mvn_logpdf
            from romcomma_tpu.ops.linalg import cholesky as dense_cholesky
            xd = jnp.asarray(np.asarray(X, dtype=dt))
            yd = jnp.asarray(np.asarray(Y, dtype=dt).reshape(len(X), -1)[:, :1])

            def dense_objective(raw):
                rls, rs2, rnoise = merge(raw)
                K = rbf_gram(xd, xd, positive(rls, 0.0), positive(rs2, 0.0))
                ch = dense_cholesky(add_diag(K, positive(rnoise, NOISE_LOWER_BOUND)))
                value = -jnp.sum(mvn_logpdf(yd, jnp.zeros_like(yd), ch))
                return jnp.where(jnp.isfinite(value), value, jnp.inf)

            # scipy L-BFGS-B over the jitted value+grad: the fused-step
            # program SIGSEGVs the TPU compiler at N=20k; the val+grad
            # program alone compiles and runs in ~2 s there.
            res = lbfgs.minimize_scipy(dense_objective, raw0, maxiter=maxiter,
                                       gtol=gtol, callback=callback,
                                       max_linesearch_steps=max_linesearch_steps)
            if np.isfinite(float(res.value)):
                rls, rs2, rnoise = merge(res.params)
                return ((positive(rls, 0.0), positive(rs2, 0.0),
                         positive(rnoise, NOISE_LOWER_BOUND)),
                        -res.value, res.iterations)

        def objective(raw):
            rls, rs2, rnoise = merge(raw)
            return -self._lml(positive(rls, 0.0), positive(rs2, 0.0),
                              positive(rnoise, NOISE_LOWER_BOUND), x_dev, y_dev)

        itemsize = np.dtype(dt).itemsize
        if (self._engine in ('upper', 'cyclic2')
                or 3 * self.plan.Npad ** 2 * itemsize > self.GRADS_MEMORY_BUDGET_BYTES):
            # Streaming-gradient route: minimize_host's optax step fuses
            # value+grad into ONE program that holds the gram and the
            # factor carry live together — 2 (Npad,Npad) buffers, an HBM
            # OOM at N~50k. Drive scipy L-BFGS-B over the EAGER custom-VJP
            # chain instead: each piece is its own dispatch and donation
            # caps the peak at one (Npad,Npad) buffer. The upper engine
            # ALWAYS takes this route — donation of the in-place
            # factorization/inversion only applies at top-level dispatch,
            # and it is the configuration the streaming-v2 head-to-head
            # measured fastest (1.099 s/val+grad at N=20000/M=30 f32).
            res = lbfgs.minimize_scipy(objective, raw0, maxiter=maxiter,
                                       gtol=gtol, callback=callback,
                                       max_linesearch_steps=max_linesearch_steps,
                                       fuse=False)
        else:
            res = lbfgs.minimize_host(objective, raw0, maxiter=maxiter, gtol=gtol,
                                      callback=callback,
                                      max_linesearch_steps=max_linesearch_steps)
        rls, rs2, rnoise = merge(res.params)
        return ((positive(rls, 0.0), positive(rs2, 0.0),
                 positive(rnoise, NOISE_LOWER_BOUND)),
                -res.value, res.iterations)

    #: simultaneously-live vmapped gradient bytes (3 L (Npad,Npad) buffers)
    #: at/below which calibrate_multi batches all outputs into one descent.
    MULTI_MEMORY_BUDGET_BYTES: int = 12 * 2 ** 30

    def fits_multi(self, L: int) -> bool:
        """Whether a joint L-output descent's gradient working set fits HBM."""
        return (3 * L * self.plan.Npad ** 2 * self._itemsize()
                <= self.MULTI_MEMORY_BUDGET_BYTES)

    def calibrate_multi(self, X: np.ndarray, Y: np.ndarray, ls0, s2_0, noise0,
                        maxiter: int = 5000, gtol: float = 1e-16,
                        callback=None, max_linesearch_steps: int | None = None,
                        mask: tuple = (1.0, 1.0, 1.0)):
        """Joint host-paced calibration of L independent outputs sharing X:
        ONE vmapped custom-VJP LML evaluation per L-BFGS step instead of L
        sequential descents — the large-N analog of the fused small-N path's
        vmap over L (models/gp.py:63-101). The objective is the SUM of
        per-output LMLs; it is separable, so the joint minimizer matches the
        per-output minimizers (stopping couples outputs only through the
        shared gradient norm). Working set per evaluation is L (Npad,Npad)
        grams (plus 3L in the stored-gradient backward) — callers gate on
        :meth:`fits_multi` and fall back to per-output descents.

        ``ls0`` (L,M), ``s2_0`` (L,), ``noise0`` (L,), ``Y`` (N,L).
        Returns ((ls (L,M), s2 (L,), noise (L,)), lml (L,), iterations)."""
        from romcomma_tpu.ops import lbfgs
        from romcomma_tpu.ops.transforms import positive, positive_inverse
        from romcomma_tpu.models.params import NOISE_LOWER_BOUND

        x_dev, y_dev = self.stage(X, Y)                    # y_dev (Npad, L)
        dt = x_dev.dtype
        L_out = y_dev.shape[1]
        y_batch = jnp.moveaxis(y_dev, 1, 0)[:, :, None]    # (L, Npad, 1)
        raw0 = (jnp.asarray(positive_inverse(
                    np.broadcast_to(np.asarray(ls0, dtype=dt),
                                    (L_out, X.shape[1])), 0.0)),
                jnp.asarray(positive_inverse(
                    np.asarray(s2_0, dtype=dt).reshape(L_out), 0.0)),
                jnp.asarray(positive_inverse(
                    np.asarray(noise0, dtype=dt).reshape(L_out),
                    NOISE_LOWER_BOUND)))
        frozen0 = raw0
        mask_f = tuple(float(m) for m in mask)
        if all(m == 1.0 for m in mask_f):
            merge = lambda raw: raw
        else:
            def merge(raw):
                return tuple(fv + m * (rv - fv)
                             for rv, fv, m in zip(raw, frozen0, mask_f))

        lml_one = lambda rls, rs2, rnoise, y: self._lml(
            positive(rls, 0.0), positive(rs2, 0.0),
            positive(rnoise, NOISE_LOWER_BOUND), x_dev, y)
        lml_vmapped = jax.vmap(lml_one, in_axes=(0, 0, 0, 0))

        def objective(raw):
            rls, rs2, rnoise = merge(raw)
            return -jnp.sum(lml_vmapped(rls, rs2, rnoise, y_batch))

        res = lbfgs.minimize_host(objective, raw0, maxiter=maxiter, gtol=gtol,
                                  callback=callback,
                                  max_linesearch_steps=max_linesearch_steps)
        rls, rs2, rnoise = merge(res.params)
        lml = lml_vmapped(rls, rs2, rnoise, y_batch)       # per-output values
        return ((positive(rls, 0.0), positive(rs2, 0.0),
                 positive(rnoise, NOISE_LOWER_BOUND)),
                lml, res.iterations)
