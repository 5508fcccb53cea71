"""Device-mesh execution of the factorized GSA interval sweeps.

The O(N^2 M) V pass (calibrators._intervals_body) and W/T error sweep
(factorized_errors.run_chunk) are embarrassingly parallel over their
q-column chunks: every chunk's quadform contributions ADD into small
per-slice accumulators, and the psi error factors are per-COLUMN.  This
module wraps the existing single-device chunk bodies in a ``shard_map``
over the 1-D ('n',) device mesh (parallel.distributed.make_n_mesh):
chunks distribute contiguously over devices, quadform accumulators
``psum``, psi columns come back sharded along the q/N axis in original
column order.  The math is identical to the single-device loops — only
the across-chunk ADDITION ORDER changes (fp-level deltas, pinned by
tests/test_gsa_chunked.py mesh-parity tests).

Mirrors no reference code: the reference (romcomma/gsa/calibrators.py)
evaluates slices eagerly on one device; multi-device analytics is part of
this framework's TPU redesign.  Training has been mesh-sharded since round
1 (parallel/distributed.py); this closes the same gap for the analytics
phase, which dominates end-to-end time at large N (BASELINE.md round-3
summary: error-GSA 1604.9 s vs 150 s for everything else at N=50k).

Host-paced mode keeps its tunnel-bounded dispatch contract: each host
round-trip dispatches ONE slab of S chunks (one per device), so the
wall-clock per dispatch stays at the single-chunk cost while all S
devices run in parallel.

Chunk padding: the chunk axis is zero-padded to a multiple of S.  Zero
q-columns are exact no-ops of both sweeps — every emitted quadform
contracts against the zero-padded q-side weights (gq / gw / g0q), and
psi columns at padded positions are trimmed by the caller's ``[..., :N]``.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from romcomma_tpu.parallel.distributed import _shard_map


def _pad_chunks(tree, S: int):
    """Zero-pad the leading (chunk) axis of every array in ``tree`` to a
    multiple of S; returns (padded_tree, nc_padded)."""
    nc = jax.tree.leaves(tree)[0].shape[0]
    pad = (-nc) % S
    if pad == 0:
        return tree, nc
    f = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return jax.tree.map(f, tree), nc + pad


def _tree_add(a, b):
    return jax.tree.map(jnp.add, a, b)


def _tree_psum(t, axis_name: str = 'n'):
    return jax.tree.map(lambda x: lax.psum(x, axis_name), t)


# --------------------------------------------------------------------------- #
# V pass (ClosedSobol.marginalize_intervals)
# --------------------------------------------------------------------------- #

def intervals_sweep(mesh: Mesh, pack: Dict, chunk_body, zeros: Tuple,
                    host_paced: bool,
                    xs_keys: Tuple[str, ...] = ('Gq', 'gq')) -> Tuple:
    """Run the V-pass chunk loop over the mesh; returns the psum'd
    accumulator triple (replicated), drop-in for the single-device loop in
    ClosedSobol.marginalize_intervals. ``xs_keys`` names the chunk-stacked
    pack entries the body consumes per chunk (the df tier adds its
    pre-split q-side pair)."""
    S = mesh.devices.size
    xs, nc_pad = _pad_chunks(tuple(pack[k] for k in xs_keys), S)
    # the chunk stacks ride the sharded xs; everything else replicates
    pack_rep = {k: v for k, v in pack.items() if k not in xs_keys}

    if host_paced:
        def slab(pack_r, xs_s):
            out = chunk_body(pack_r, zeros, tuple(x[0] for x in xs_s))
            return _tree_psum(out)
        step = jax.jit(_shard_map(slab, mesh=mesh, in_specs=(P(), P('n')),
                                  out_specs=P()))
        acc = zeros
        for i in range(nc_pad // S):
            sl = slice(i * S, (i + 1) * S)
            acc = _tree_add(acc, step(pack_rep, tuple(x[sl] for x in xs)))
        return acc

    def local(pack_r, xs_l):
        out, _ = lax.scan(lambda a, x: (chunk_body(pack_r, a, x), None),
                          zeros, xs_l)
        return _tree_psum(out)

    fn = _shard_map(local, mesh=mesh, in_specs=(P(), P('n')),
                    out_specs=P())
    return fn(pack_rep, xs)


# --------------------------------------------------------------------------- #
# W/T error sweep (factorized_errors.error_scan)
# --------------------------------------------------------------------------- #

def error_sweep(mesh: Mesh, C: Dict, run_chunk, zero_acc, kinds: Tuple[str, ...],
                xs: Tuple, host_paced: bool, N: int, psi_rank: int = 4):
    """Run the error-sweep chunk loop over the mesh.

    ``xs`` = (Gq (nc, M, L, c), gw_c {kind: (nc, M, L, c)}, g0q_c (nc, L, c))
    chunk-stacked exactly as error_scan builds them.  Returns
    (quads {kind: tuple}, psi {kind: (Mk, l, i, N)}) — quads psum'd and
    replicated, psi trimmed to N and sharded along its last axis in
    original column order (device d of slab i holds chunk i*S + d).

    ``psi_rank``: rank of each per-chunk psi leaf — 4 (Mk, l, i, c) for the
    single-output sweep, 5 with the leading output axis of the stacked
    (vmapped-over-outputs) sweep, whose xs leaves carry the output axis
    SECOND (chunks stay leading for the 'n' sharding).
    """
    S = mesh.devices.size
    (Gq, gw_c, g0q_c), nc_pad = _pad_chunks(xs, S)
    psi_specs = {k: P(*([None] * (psi_rank - 1)), 'n') for k in kinds}

    if host_paced:
        def slab(C_a, Gq_s, gw_s, g0q_s):
            out = run_chunk(C_a, Gq_s[0], {k: gw_s[k][0] for k in kinds},
                            g0q_s[0])
            quads = {k: _tree_psum(out[k][0]) for k in kinds}
            return quads, {k: out[k][1] for k in kinds}
        step = jax.jit(_shard_map(
            slab, mesh=mesh, in_specs=(P(), P('n'), P('n'), P('n')),
            out_specs=(P(), psi_specs)))
        quads = zero_acc()
        psi_parts = {k: [] for k in kinds}
        for i in range(nc_pad // S):
            sl = slice(i * S, (i + 1) * S)
            q_i, psi_i = step(C, Gq[sl], {k: gw_c[k][sl] for k in kinds},
                              g0q_c[sl])
            quads = _tree_add(quads, q_i)
            for k in kinds:
                psi_parts[k].append(psi_i[k])
        psi = {k: jnp.concatenate(psi_parts[k], axis=-1)[..., :N]
               for k in kinds}
        return quads, psi

    def local(C_a, Gq_l, gw_l, g0q_l):
        def outer(acc, xs_i):
            Gq_i, gw_i, g0q_i = xs_i
            out = run_chunk(C_a, Gq_i, gw_i, g0q_i)
            acc = {k: tuple(q0 + q1 for q0, q1 in zip(acc[k], out[k][0]))
                   for k in kinds}
            return acc, {k: out[k][1] for k in kinds}
        quads_l, psi_stack = lax.scan(outer, zero_acc(), (Gq_l, gw_l, g0q_l))
        # (nc_loc, ..., c) -> (..., nc_loc*c): local columns stay
        # contiguous, so the sharded global axis is in original chunk order
        psi_l = {k: jnp.moveaxis(psi_stack[k], 0, -2
                                 ).reshape(psi_stack[k].shape[1:psi_rank]
                                           + (-1,)) for k in kinds}
        return _tree_psum(quads_l), psi_l

    fn = _shard_map(local, mesh=mesh, in_specs=(P(), P('n'), P('n'), P('n')),
                    out_specs=(P(), psi_specs))
    quads, psi = fn(C, Gq, gw_c, g0q_c)
    return quads, {k: psi[k][..., :N] for k in kinds}
