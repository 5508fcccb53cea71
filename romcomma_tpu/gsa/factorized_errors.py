"""TPU-native factorized standard-error (W/T) pass for ClosedSobolWithError.

Computes the Sobol' standard-error integrals of EVERY canonical interval
slice (single dim / prefix / suffix / empty) in one chunked ``lax.scan``
over input dims — the same program shape as ``ClosedSobol.
marginalize_intervals``'s V pass, which is the one GSA program known to
compile and run well on the TPU in emulated f64.  It replaces a
Python-unrolled per-dim "bundle product" formulation whose giant HLO
hard-failed the XLA TPU compiler at N>=4096.

Math (quantities defined in reference romcomma/gsa/calibrators.py:146-402;
the factorization itself is the TPU redesign):

Every error-family Gaussian — psi, the Upsilon and Omega families per rank
equation, and the G-divisor Gaussian — has diagonal variance over input
dims with *slice-independent per-dim parameters*, and its per-dim exponent
has the separable form

    e_m(p, q) = -(a_m[p-axes] - b_m[q-axes])^2 / (2 v_m[batch-axes])

with a batch-only Cholesky diagonal.  Exponents are therefore additive over
dims and sqrt-determinants multiplicative, so a forward scan over dims
yields every prefix slice (CLOSED kind), a reverse scan every suffix
(TOTAL), and the per-dim plane itself every single-dim slice (FIRST_ORDER)
— at O(N^2 M) total cost instead of O(N^2 M) *per slice*.  The Upsilon
(p-side-only) and G-divisor exponents carry no (p, q) cross term, so their
cumulative sums — and all determinant products — are precomputed outside
the scan as O(N M) arrays and folded in at emission time.

Because ``g0KY`` is centred (sums to zero per output), the empty-slice
error integrals vanish identically: W = 0, T = 0.

Only the diagonal-F case exists here: ``ClosedSobolWithError._calibrate``
rejects non-diagonal F (matching the reference's instability note).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from romcomma_tpu.ops.linalg import tri_solve
# shared with the calibrator module (calibrators lazily imports THIS module
# inside a method, so the module-level import back is cycle-free)
from romcomma_tpu.gsa.calibrators import _diag_part, _set_diag


def _cums(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-dim ('single'), forward-cumulative ('prefix') and
    reverse-cumulative ('suffix') views along the leading M axis."""
    return {'single': x, 'prefix': jnp.cumsum(x, axis=0),
            'suffix': jnp.cumsum(x[::-1], axis=0)[::-1]}


KINDS = ('single', 'prefix', 'suffix')


# --------------------------------------------------------------------------- #
# Per-dim family parameters (compact axes; asserts the diagonal-F layout)
# --------------------------------------------------------------------------- #

def _families_of(cal):
    return ((('DIAGONAL', cal.RANK_EQUATIONS.DIAGONAL),)
            if cal.meta['is_T_partial']
            else (('DIAGONAL', cal.RANK_EQUATIONS.DIAGONAL),
                  ('MIXED', cal.RANK_EQUATIONS.MIXED)))


def _member_layout(cal) -> List[Dict[str, Any]]:
    """STATIC per-member layout: the ``_mu_phi_mu`` branch of each
    (family, rank-equation) member — p-side index, output spec, MIXED flag.
    Kept separate from the traced arrays so the array precompute can run as
    one jitted program."""
    layout: List[Dict[str, Any]] = []
    for fam_name, rank_eqs in _families_of(cal):
        for rank_eq in rank_eqs:
            mixed = rank_eq in cal.RANK_EQUATIONS.MIXED
            diag_add = (not mixed) and rank_eq.l == 'k' and rank_eq.i == 'j'
            layout.append({'family': fam_name, 'p': 'k' if mixed else 'j',
                           'out': 'j' if diag_add else 'jk', 'mixed': mixed})
    return layout


def _member_arrays(cal, G, Phi, Upsilon) -> List[Dict[str, jnp.ndarray]]:
    """Traced per-member arrays, aligned with :func:`_member_layout`:
    Omega per-dim N-side mean ``a`` (M, j, k, N) and variance ``v``
    (M, j, k); the Upsilon per-dim (p-side-only) exponent ``e_up``
    (M, j, k, N); the combined per-dim sqrt-determinant ``d`` (M, j, k) of
    (Omega / G-divisor) * Upsilon.  ``G/Phi/Upsilon`` are passed explicitly
    (possibly as tracers) so the caller's jitted precompute does NOT bake
    them into the program as constants.

    N-carrying arrays keep N LAST: every big sweep plane is laid out with
    (N, chunk) as its trailing axes so the TPU's (8, 128) tiling of the two
    minor dims lands on the large axes — a (N, 1, 1, C) plane pads its
    second-minor singleton to 8 and measured ~8x slower per element
    (0.9/16.0 ms vs 0.4/2.0 ms for carry/'ff'-emission on (20000, 1118),
    /tmp layout probe, slope-timed)."""
    om_mean, om_var = cal._omega_mean_variance(cal.Ms, G, Phi, Upsilon)
    up_mean, up_var = cal._upsilon_mean_variance(G, Phi, Upsilon)
    dg = jnp.sqrt(Phi[:, 0, :])                           # (L, M) G-divisor cho

    def equate(tensor, rank_eq, insert_n_axis: bool):
        t = jnp.expand_dims(tensor, 3) if insert_n_axis else tensor
        return cal._equateRanks(t, rank_eq)[..., None, :]  # (L',N?,j,k,J,1,M)

    def compact(t, with_n: bool):
        assert t.shape[0] == 1 and t.shape[4] == 1 and t.shape[5] == 1, t.shape
        if with_n:
            return jnp.transpose(t[0, :, :, :, 0, 0, :], (3, 1, 2, 0))
        return jnp.moveaxis(t[0, 0, :, :, 0, 0, :], -1, 0)  # M leading

    arrays: List[Dict[str, jnp.ndarray]] = []
    for fam_name, rank_eqs in _families_of(cal):
        for rank_eq in rank_eqs:
            a = compact(equate(om_mean, rank_eq, False), True)     # (M,j,k,N)
            v = compact(equate(om_var, rank_eq, True), False)      # (M,j,k)
            a_u = equate(up_mean, rank_eq, False)
            v_u = equate(up_var, rank_eq, True)
            e_up = compact(-0.5 * (a_u * a_u / v_u), True)          # (M,j,k,N)
            d_u = compact(jnp.sqrt(v_u), False)                     # (M,j,k)
            assert a.shape[1] == dg.shape[0], (a.shape, dg.shape)   # j == L
            d = jnp.sqrt(v) * d_u / dg.T[:, :, None]                # GG on j
            arrays.append({'a': a, 'v': v, 'e_up': e_up, 'd': d})
    return arrays


def _chunk_size(cal, n_members: int, stack: int = 1) -> int:
    """q-axis chunk size: ~3 live (N, L, L, chunk) planes per member plus
    the psi plane, exp temporaries included.  meta['n_chunk'] overrides
    (0 = unchunked, the V-pass convention).  ``stack`` scales the live-plane
    count for the vmapped multi-output sweep (error_scan_stacked), keeping
    the same total budget as one output's pass."""
    explicit = cal.meta.get('n_chunk', None)
    if explicit is not None:
        return int(explicit) if explicit else cal.N
    L = cal.G.shape[0]
    budget = cal.V_MEMORY_BUDGET_BYTES // jnp.dtype(cal.X.dtype).itemsize
    per_col = cal.N * L * L * 3 * (n_members + 1) * stack
    return int(min(cal.N, max(64, budget // max(per_col, 1))))


# --------------------------------------------------------------------------- #
# The scan engine
# --------------------------------------------------------------------------- #

class _StaticSpec:
    """Array-free stand-in for the calibrator inside the memoized traced
    closures. The sweep programs consume every array as a FORMAL ARGUMENT
    (see prep's docstring), and the calibrator methods they call
    (_omega_mean_variance / _upsilon_mean_variance / _equateRanks) read only
    static attributes — so one traced + jitted program can serve every
    calibrator instance with the same static signature. Closing over the
    calibrator itself would (a) re-trace / re-lower / re-deserialize the
    programs on EVERY sobol_indices call (each call constructs a fresh
    calibrator — measured ~1.2 s per warm call on CPU at N=512, and tens of
    seconds through a tunnelled runtime's remote compile helper), and
    (b) pin the dead calibrator's arrays in the program cache."""

    def __init__(self, cal):
        cls = type(cal)
        self.Ms = cal.Ms
        self.RANK_EQUATIONS = cal.RANK_EQUATIONS
        self.meta = {k: cal.meta[k] for k in ('is_T_partial',)
                     if k in cal.meta}
        self.L, self.M, self.N = cal.L, cal.M, cal.N
        self._omega = cls._omega_mean_variance
        self._upsilon = cls._upsilon_mean_variance
        self._equate = cls._equateRanks

    def _omega_mean_variance(self, *a):
        return self._omega(self, *a)

    def _upsilon_mean_variance(self, *a):
        return self._upsilon(self, *a)

    def _equateRanks(self, *a):
        return self._equate(self, *a)


#: static signature -> {'prep', 'step', 'prep_jit', 'step_jit'}
_PROGRAMS: Dict[tuple, dict] = {}


def _make_programs(spec: _StaticSpec, kinds, prefix_full: bool, dedup: bool,
                   n_planes: int, R: int, layout, chunk: int, dt,
                   exp_mode, use_shift: bool, reduce_contract: bool):
    """The two traced programs of the error sweep — ``prep`` (every per-dim
    array the sweeps consume) and ``run_chunk`` (all sweeps for one q chunk)
    — as closures over ONLY the static configuration (:class:`_StaticSpec`;
    every array is a formal argument), so :func:`_error_scan_group` can
    memoize their jitted forms across calibrator instances."""
    from romcomma_tpu.gsa.base import shifted_exp
    L, M, N = spec.L, spec.M, spec.N
    nc = -(-N // chunk)
    Npad = nc * chunk
    scan_kinds = tuple(k for k in kinds if k != 'prefix' or prefix_full)
    fwd_kinds = tuple(k for k in ('single', 'prefix') if k in scan_kinds)
    do_bwd = 'suffix' in kinds

    def prep(G, Phi, Upsilon, g0, g0KY):
        """Every per-dim array the sweeps consume — member params, per-kind
        emission-time weights/cums/inverse-dets, and padded q chunks.  Runs
        as ONE jitted program in host-paced mode: dozens of eager emulated-
        f64 dispatches (each a fresh remote compile on tunnelled TPU
        runtimes) collapse into a single compilation.  The cal arrays are
        FORMAL ARGUMENTS, never closure captures: a captured concrete array
        is baked into the HLO as a constant, which (a) keys the persistent
        compile cache on the DATA — every new dataset/hyperparameters paid
        a full recompile — and (b) bloated the serialized executable to
        hundreds of MB at N=50k (~16 s to load per process through the
        tunnel's remote compile helper)."""
        g = g0KY[:, 0, :]                                  # (L, N)
        mem = _member_arrays(spec, G, Phi, Upsilon)
        g0q = g0[:, 0, :]                                  # (L, N) psi q side
        Gm = jnp.moveaxis(G[:, 0, :, :], -1, 0)            # (M, L, N)
        phi_m = jnp.moveaxis(Phi[:, 0, :], -1, 0)          # (M, L)
        # psi per-dim variance phi_l (1 - phi_l phi_i); G-divisor exponent.
        v_psi = phi_m[:, :, None] * (1.0 - phi_m[:, :, None] * phi_m[:, None, :])
        # Scaled-difference form of every sweep plane: the per-dim exponent
        # -(a - b)^2 / (2 v) is accumulated as sum of d*d with d = a*s - b*s,
        # s = sqrt(0.5 / v) folded into the means OUTSIDE the scan — the
        # emulated-f64 per-element divide and halving multiply (the two most
        # expensive plane ops on TPU) leave the O(N^2 M) body entirely.
        s_psi = jnp.sqrt(0.5 / v_psi)                      # (M, L, L)
        eg = _cums(-0.5 * Gm * Gm / phi_m[..., None])      # (M, L, N) per kind
        # Per-kind: q-side Omega weights g0KY * exp(-Egg) (the G-divisor
        # division, aligned on j), Upsilon exponent cums, inverse dets.
        gw = {k: g[None] * jnp.exp(-eg[k]) for k in kinds}  # (M, L, N)
        eup = {k: [] for k in kinds}
        invd = {k: [] for k in kinds}
        for i, m in enumerate(mem):
            dcum = _cums(jnp.log(m['d']))
            for k in kinds:
                invd[k].append(jnp.exp(-dcum[k]))          # per MEMBER
            if i >= n_planes:                              # dedup: planes of
                continue                                   # members > 0 alias
            ecum = _cums(m['e_up'])
            m['s'] = jnp.sqrt(0.5 / m['v'])                # (M, j, k)
            m['a_sc'] = m['a'] * m['s'][..., None]         # (M, j, k, N)
            for k in kinds:
                eup[k].append(ecum[k])
        invd_psi = {k: jnp.exp(-_cums(jnp.log(
            jnp.sqrt(v_psi) / jnp.sqrt(phi_m)[:, :, None]))[k]) for k in kinds}

        def pad_chunk(x):                      # (M, L, N) -> (nc, M, L, chunk)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, Npad - N)))
            return jnp.moveaxis(x.reshape(M, L, nc, chunk), 2, 0)

        out = {'a_sc': tuple(m['a_sc'] for m in mem[:n_planes]),
               's': tuple(m['s'] for m in mem[:n_planes]),
               'eup': {k: tuple(eup[k]) for k in kinds},
               'invd': {k: tuple(invd[k]) for k in kinds},
               'invd_psi': invd_psi, 'gw': gw, 'g': g,
               'Gm': Gm, 'phi_m': phi_m, 's_psi': s_psi,
               'Gq': pad_chunk(Gm),
               'gw_c': {k: pad_chunk(gw[k]) for k in kinds},
               'g0q_c': jnp.moveaxis(jnp.pad(g0q, ((0, 0), (0, Npad - N))
                                             ).reshape(L, nc, chunk), 1, 0)}
        # prefix-last mode narrows every prefix per-dim array to its final
        # (cumulative-over-all-dims) column HERE — inside the (possibly
        # vmapped) prep — so the emission-time folds/determinants keep one
        # shared code path with a dim axis of 1 under any output stacking.
        if not prefix_full:
            out['eup'] = {**out['eup'], 'prefix': tuple(
                e[M - 1:] for e in out['eup']['prefix'])}
            out['invd'] = {**out['invd'], 'prefix': tuple(
                d[M - 1:] for d in out['invd']['prefix'])}
            out['invd_psi'] = {**invd_psi,
                               'prefix': invd_psi['prefix'][M - 1:]}
            out['gw_prefix_last'] = gw['prefix'][M - 1]
        return out

    def run_chunk(C, Gq_i, gw_i, g0q_i):
        """All sweeps for one q chunk.  Returns
        {kind: ([member quads (Mk, ...)], psi contribs (Mk, l, i, c))} with
        Mk = 1 for 'prefix' in prefix-last mode.

        Every big plane is laid out (j, k, N, C) / (l, i, N, C): the TPU
        tiles the two MINOR axes to (8, 128), so singleton trailing axes —
        the previous (N, j, k, C) layout at L=1 put (k=1, C) minor — pad
        8x in memory AND compute (measured 16.0 vs 2.0 ms per 'ff'
        emission, 0.9 vs 0.4 ms per carry op on (20000, 1118) planes)."""

        def member_quad(spec_r, Eplane, gq_m):
            """Quadform of exp(Eplane) — Eplane (j, k, N, C); contraction
            covers N and C always, plus k when the member reduces to 'j'.

            On accelerators the N contraction is an elementwise g-multiply
            + reduce, NOT an einsum: an emulated-f64 dot_general runs off
            the MXU at ~10.5 ms per (8192, 2048) plane where mul + reduce
            costs ~0.3 ms (benchmarks/egsa_ops.py, slope-timed) — the
            contraction, not the transcendental, dominated the sweep. The
            tiny surviving (j, k, C) tensor then contracts C (and k for
            'j' members) at O(L^2 C) cost. On the host CPU the einsum is
            native-f64 BLAS and wins ~10x the other way."""
            def quad(eplane):
                if not reduce_contract:
                    eq = f"{spec_r['p']}N, jkNC, jC -> {spec_r['out']}"
                    return jnp.einsum(eq, C['g'], eplane, gq_m)
                g = C['g']                                    # (L, N)
                gal = (g[:, None, :, None] if spec_r['p'] == 'j'
                       else g[None, :, :, None])              # align j or k
                col = jnp.sum(eplane * gal, axis=2)           # (j, k, C)
                return jnp.einsum(f"jkC, jC -> {spec_r['out']}", col, gq_m)

            if not use_shift:
                return quad(jnp.exp(Eplane))
            out_jk = spec_r['out'] == 'jk'
            # the shift must be constant over every CONTRACTED axis of the
            # output (a per-k scale cannot be factored out of a k-sum)
            plane, c_max = shifted_exp(Eplane,
                                       (2, 3) if out_jk else (1, 2, 3),
                                       exp_mode)
            q = quad(plane)
            return q * (jnp.exp(c_max[:, :, 0, 0]) if out_jk
                        else jnp.exp(c_max[:, 0, 0, 0]))

        # dedup emission: one 'jk' contraction of the shared plane serves
        # every member at L=1 (all output specs are the same scalar; 'j'
        # members sum the singleton k axis)
        _JK = {'p': 'j', 'out': 'jk'}

        def member_quads(oms, eup_cols, gq):
            """Per-MEMBER quads (tuple of R) from per-PLANE accumulations
            (tuple of n_planes) and per-plane eup columns (N, j, k)."""
            if dedup:
                q_jk = member_quad(_JK, eup_cols[0][..., None] - oms[0], gq)
                return tuple(q_jk if layout[r]['out'] == 'jk' else q_jk[:, 0]
                             for r in range(R))
            return tuple(member_quad(layout[r],
                                     eup_cols[r][..., None] - oms[r], gq)
                         for r in range(R))

        def psi_quad(pw, g0q_i, P_psi):
            """liC psi contribution from the POSITIVE quadratic plane P_psi
            (l,i,N,C) — the exponent is ``-P_psi`` (scaled-difference form).
            Only the N axis (2) is contracted; the C axis survives, so the
            shift keeps it.  On accelerators the contraction is an
            elementwise pw-multiply + reduce over N, not an einsum — same
            emulated-f64 dot_general avoidance as member_quad (~10x,
            benchmarks/egsa_ops.py); the host CPU keeps the BLAS einsum."""
            def quad(plane):
                if not reduce_contract:
                    return jnp.einsum('lN, iC, liNC -> liC', pw, g0q_i,
                                      plane)
                t = jnp.sum(plane * pw[:, None, :, None], axis=2)
                return t * g0q_i[None]                        # (l, i, C)

            if not use_shift:
                return quad(jnp.exp(-P_psi))
            plane, c_max = shifted_exp(P_psi, (2,), exp_mode, negate=True)
            return quad(plane) * jnp.exp(c_max[:, :, 0, :])

        xs = (Gq_i,                                         # (M, L, c)
              C['a_sc'],                                    # (M, j, k, N)
              C['s'],                                       # (M, j, k)
              {k: gw_i[k] for k in scan_kinds},             # (M, L, c)
              C['gw_p'],                                    # (M, L, N) p-side
              C['eup_scan'],                                # (M, j, k, N)
              C['Gm'], C['phi_m'], C['s_psi'])

        def init():
            E_oms = tuple(jnp.zeros(C['s'][r].shape[1:] + (N, chunk), dt)
                          for r in range(n_planes))
            return (E_oms, jnp.zeros((L, L, N, chunk), dt))

        def step(carry, xs_m, emit_kinds, accumulated):
            # Carries are POSITIVE quadratic accumulations (sum of d*d, the
            # exponent is their negation): 3 cheap plane ops per dim per
            # member (sub, mul, add) — the divide and halving multiply are
            # pre-folded into the scaled means (prep), the negation into
            # the emission's existing eup fold / shifted_exp(negate=True).
            E_oms, E_psi = carry
            Gq_m, a_s, s_s, gq_s, pw_s, eup_s, Gm_m, phim, sps = xs_m
            e_oms = []
            for r in range(n_planes):
                d = a_s[r][..., None] \
                    - (Gq_m[:, None, None, :] * s_s[r][..., None, None])
                e_oms.append(d * d)                         # (j, k, N, c)
            e_oms = tuple(e_oms)
            E_oms = tuple(E + e for E, e in zip(E_oms, e_oms))
            bp = (phim[:, None, None] * Gq_m[None, :, :]) * sps[..., None]
            Gp = Gm_m[:, None, :] * sps[..., None]          # (l, i, N)
            d_psi = Gp[..., None] - bp[:, :, None, :]       # (l, i, N, c)
            e_psi = d_psi * d_psi
            E_psi = E_psi + e_psi
            ys = {}
            for k in emit_kinds:
                oms = E_oms if accumulated[k] else e_oms
                psi = E_psi if accumulated[k] else e_psi
                ys[k] = (member_quads(oms, eup_s[k], gq_s[k]),
                         psi_quad(pw_s[k], g0q_i, psi))
            return (E_oms, E_psi), ys

        def prefix_last(carry, out):
            # prefix-last emission: the scan carry after ALL dims IS the
            # full-interval accumulation (forward or reverse — addition
            # order only); one plane exp + contraction replaces M of them.
            E_oms, E_psi = carry
            qp = member_quads(E_oms, tuple(e[0] for e in C['eup_prefix']),
                              gw_i['prefix'][M - 1])
            pp = psi_quad(C['gw_prefix_last'], g0q_i, E_psi)
            return out | {'prefix': (tuple(q[None] for q in qp), pp[None])}

        if do_bwd and not prefix_full:
            # Single-sweep mode (the production first_order+total config):
            # 'single' emissions are carry-free, so the reverse (suffix)
            # scan emits them too, and its final carry is the full-interval
            # accumulation for the prefix-last column — the forward sweep's
            # whole accumulation (d*d rebuilds included) is deleted.
            emit = tuple(k for k in ('single', 'suffix') if k in scan_kinds)
            carry, out = lax.scan(lambda c, x: step(c, x, emit,
                                                    {'single': False,
                                                     'suffix': True}),
                                  init(), xs, reverse=True)
            return prefix_last(carry, out)
        carry, out = lax.scan(lambda c, x: step(c, x, fwd_kinds,
                                                {'single': False,
                                                 'prefix': True}),
                              init(), xs)
        if not prefix_full:
            out = prefix_last(carry, out)
        if do_bwd:
            _, out_b = lax.scan(lambda c, x: step(c, x, ('suffix',),
                                                  {'suffix': True}),
                                init(), xs, reverse=True)
            out = out | out_b
        return out

    return prep, run_chunk


def error_scan(cal, need: Dict[str, bool], host_paced: bool = False):
    """Run the factorized error sweep.

    ``need`` flags which kinds to emit ('single'/'suffix'; 'prefix' always
    runs — its (0, M) column is the full-interval psi factor and MIXED-W
    source).  Returns {'layout', 'quads': {kind: [(M, j[, k]) per member]},
    'psi': {kind: (M, l, i, N)}} with determinants applied and the psi
    factors K-solved (reference calibrators.py:290-322 semantics).
    """
    return _error_scan_group((cal,), need, host_paced)[0]


def error_scan_stacked(cals, need: Dict[str, bool], host_paced: bool = False):
    """ONE factorized error sweep for SEVERAL independent single-output
    calibrators sharing X: the chunk step is vmapped over the output axis so
    all outputs stream each q chunk together — the multi-output analog of
    calibrators.marginalize_intervals_stacked for the W/T error engine.
    All calibrators must share (L=1, N, M), dtype and the meta flags that
    shape the program (is_T_partial, intervals_mixed, n_chunk).  Returns one
    ``error_scan`` result dict per calibrator, numerically identical to
    per-calibrator sweeps (the vmapped math is the same ops)."""
    return _error_scan_group(tuple(cals), need, host_paced)


def _error_scan_group(cals, need: Dict[str, bool], host_paced: bool):
    cal = cals[0]
    O = len(cals)
    stacked = O > 1
    if stacked:
        for c in cals[1:]:
            assert c.G.shape == cal.G.shape and c.G.dtype == cal.G.dtype, \
                'stacked error sweeps must share (L, N, M) and dtype'
            assert bool(c.meta['is_T_partial']) == bool(cal.meta['is_T_partial'])
            assert c.meta.get('intervals_mixed', False) == \
                cal.meta.get('intervals_mixed', False)
    kinds = tuple(k for k in KINDS if need.get(k) or k == 'prefix')
    # 'prefix' always participates (its (0, M) column is the full-interval
    # psi factor and MIXED-W source) but per-dim prefix COLUMNS are consumed
    # only by CLOSED-kind slices.  When none are requested, emit prefix
    # once — from the forward scan's final carry — instead of paying an
    # exp + contraction of the (N, j, k, C) plane at EVERY dim: ~1/3 of all
    # emission work in the standard first_order+total configuration.
    prefix_full = bool(need.get('prefix'))
    layout = _member_layout(cal)
    R = len(layout)
    L, _, N, M = cal.G.shape
    # At L=1 EVERY member's per-dim planes coincide (all rank
    # diagonalizations collapse onto the single output — verified
    # numerically for both T modes): accumulate and exponentiate ONE shared
    # plane and derive each member's quad from the 'jk' contraction, whose
    # output specs are all the same scalar at L=1.  R=2 (partial) / R=3
    # (non-partial) plane sweeps become 1 in the production single-output
    # path; XLA cannot CSE the duplicates itself — they live in separate
    # lax.scan carries.
    dedup = (L == 1)
    assert L == 1 or not stacked, 'stacked error sweeps require L=1 outputs'
    n_planes = 1 if dedup else R
    dt = cal.G.dtype
    chunk = _chunk_size(cal, n_planes, stack=O)
    nc = -(-N // chunk)
    Npad = nc * chunk
    # Same mixed-precision policy as ClosedSobol.marginalize_intervals:
    # exponent accumulation and reductions stay f64, the pointwise exp of
    # the big sweep planes goes through a log-sum-exp-shifted fast
    # transcendental (gsa.base.shifted_exp), the per-plane max undone on
    # the reduced output by a tiny f64 exp — the emulated-f64
    # transcendental dominates this pass on TPU. The error path's
    # accelerator DEFAULT is the 'ff' (float-float, ~3e-11) tier: T is the
    # sqrt of a near-cancelling quadform difference that amplifies plane
    # noise ~1e3, so f32's ~6e-8 floors near-zero T at ~3e-3 while 'ff'
    # keeps every T within ~1e-7 of the f64 oracle (tests/test_gsa_chunked
    # .py::test_error_intervals_ff_precision).
    from romcomma_tpu.gsa.base import exp_mode_of, contract_by_reduce
    exp_mode = exp_mode_of(
        getattr(cal, 'meta', {}).get('intervals_mixed', False), dt)
    use_shift = exp_mode is not None
    # f64 plane contractions: multiply + reduce on accelerators (emulated-
    # f64 dot_general is ~10x slower off the MXU), einsum on the host CPU
    # (native-f64 BLAS is ~10x faster than the reduction) — measured both
    # ways, benchmarks/egsa_ops.py and gsa/base.contract_by_reduce.
    reduce_contract = contract_by_reduce(cal.G)
    # Memoized programs: one traced + jitted (prep, step) pair per static
    # signature, shared across calibrator instances — every sobol_indices
    # call constructs a fresh calibrator, and rebuilding the closures paid
    # a full retrace + lower (+ executable re-deserialization through the
    # tunnel's remote compile helper) PER CALL.
    key = (type(cal).__qualname__, O, L, N, M, str(dt), chunk, kinds,
           prefix_full, bool(cal.meta['is_T_partial']), exp_mode,
           reduce_contract)
    progs = _PROGRAMS.get(key)
    if progs is None:
        prep, run_chunk = _make_programs(
            _StaticSpec(cal), kinds, prefix_full, dedup, n_planes, R,
            layout, chunk, dt, exp_mode, use_shift, reduce_contract)
        prep_fn = jax.vmap(prep) if stacked else prep
        step_fn = jax.vmap(run_chunk) if stacked else run_chunk
        progs = {'prep': prep_fn, 'step': step_fn,
                 'prep_jit': jax.jit(prep_fn), 'step_jit': jax.jit(step_fn)}
        _PROGRAMS[key] = progs

    import time as _time
    _sweep_t = {}
    _t0 = _time.time()
    if stacked:
        args = tuple(jnp.stack([getattr(c, a) for c in cals])
                     for a in ('G', 'Phi', 'Upsilon', 'g0', 'g0KY'))
    else:
        args = (cal.G, cal.Phi, cal.Upsilon, cal.g0, cal.g0KY)
    pre = progs['prep_jit' if host_paced else 'prep'](*args)
    if host_paced:
        jax.block_until_ready(pre)
    _sweep_t['prep_s'] = round(_time.time() - _t0, 2)
    Gq, gw_c, g0q_c = pre['Gq'], pre['gw_c'], pre['g0q_c']
    eup, invd, invd_psi = pre['eup'], pre['invd'], pre['invd_psi']

    # kinds emitted inside the scans ('prefix' only in full-prefix mode)
    scan_kinds = tuple(k for k in kinds if k != 'prefix' or prefix_full)

    # Everything run_chunk consumes besides the per-chunk xs, as ONE pytree
    # ARGUMENT of the jitted step — closure-captured concrete arrays would be
    # baked into the HLO as constants (data-keyed compile cache + a multi-
    # hundred-MB executable at N=50k; see prep's docstring).
    C = {'a_sc': pre['a_sc'], 's': pre['s'], 'g': pre['g'],
         'gw_p': {k: pre['gw'][k] for k in scan_kinds},
         'eup_scan': {k: eup[k] for k in scan_kinds},
         'Gm': pre['Gm'], 'phi_m': pre['phi_m'], 's_psi': pre['s_psi']}
    if not prefix_full:
        C['eup_prefix'] = eup['prefix']
        C['gw_prefix_last'] = pre['gw_prefix_last']

    def zero_acc():
        def s_of(r):
            s = pre['s'][0 if dedup else r]
            return s[0] if stacked else s
        lead = (O,) if stacked else ()
        return {k: tuple(jnp.zeros(lead + (M if k in scan_kinds else 1,)
                                   + (s_of(r).shape[1],)
                                   + (() if layout[r]['out'] == 'j'
                                      else s_of(r).shape[2:]), dt)
                         for r in range(R)) for k in kinds}

    # The stacked sweep vmaps the UNCHANGED chunk step over the output axis
    # (axis 0 of every leaf of C and of the per-chunk xs); the single-output
    # program keeps its exact round-2 HLO (compile-cache continuity).
    step_fn = progs['step']
    chunk_leading = ((lambda t: jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), t))
                     if stacked else (lambda t: t))

    def _psi_of_stack(pk):
        # (nc[, O], Mk, l, i, c) -> ([O,] Mk, l, i, nc*c), original order
        moved = jnp.moveaxis(pk, 0, -2)
        return moved.reshape(moved.shape[:-2] + (-1,))

    mesh = getattr(cal, 'gsa_mesh', None)
    if mesh is not None and mesh.devices.size > 1:
        # Multi-device: q chunks shard over the ('n',) mesh — member quads
        # psum, psi columns come back sharded in original order; host-paced
        # dispatches one slab of S chunks per host round-trip (gsa/mesh.py).
        from romcomma_tpu.gsa.mesh import error_sweep
        quads, psi = error_sweep(mesh, C, step_fn, zero_acc, kinds,
                                 chunk_leading((Gq, gw_c, g0q_c)),
                                 host_paced, N, psi_rank=5 if stacked else 4)
    elif host_paced:
        _t0 = _time.time()
        stepped = progs['step_jit']
        quads = zero_acc()
        psi_parts = {k: [] for k in kinds}
        ix = (lambda x, i: x[:, i]) if stacked else (lambda x, i: x[i])
        for i in range(int(nc)):
            out = stepped(C, ix(Gq, i), {k: ix(gw_c[k], i) for k in kinds},
                          ix(g0q_c, i))
            quads = {k: tuple(q0 + q1 for q0, q1 in zip(quads[k], out[k][0]))
                     for k in kinds}
            for k in kinds:
                psi_parts[k].append(out[k][1])
        psi = {k: jnp.concatenate(psi_parts[k], axis=-1)[..., :N] for k in kinds}
        jax.block_until_ready(psi)
        _sweep_t.update(chunks=int(nc),
                        loop_s=round(_time.time() - _t0, 2))
    else:
        def outer(acc, xs_i):
            Gq_i, gw_i, g0q_i = xs_i
            out = step_fn(C, Gq_i, gw_i, g0q_i)
            acc = {k: tuple(q0 + q1 for q0, q1 in zip(acc[k], out[k][0]))
                   for k in kinds}
            return acc, {k: out[k][1] for k in kinds}
        quads, psi_stack = lax.scan(
            outer, zero_acc(),
            chunk_leading((Gq, {k: gw_c[k] for k in kinds}, g0q_c)))
        psi = {k: _psi_of_stack(psi_stack[k])[..., :N] for k in kinds}

    # Determinants, then the K_cho solve of the psi factors.  In host-paced
    # mode the solve runs on the host CPU in native f64: a (M,l,i)-batched
    # f64 TRSM on the TPU broadcasts a full (N,N) K_cho copy PER BATCH
    # ELEMENT (measured 16.9 GB HBM at N=8192, M=30 — an OOM), and the
    # factors are tiny (M L^2 N) to move.
    _t0 = _time.time()
    cpu = None
    if host_paced:
        from romcomma_tpu.base.definitions import host_cpu_device
        cpu = host_cpu_device(True)
        if cpu is not None:
            move = lambda t: jax.device_put(t, cpu)
            quads = {k: tuple(move(q) for q in quads[k]) for k in kinds}
            psi = {k: move(psi[k]) for k in kinds}
            invd = {k: [move(x) for x in invd[k]] for k in kinds}
            invd_psi = {k: move(invd_psi[k]) for k in kinds}
    quads = {k: tuple(q * (invd[k][r] if layout[r]['out'] == 'jk'
                           else invd[k][r][..., 0])
                      for r, q in enumerate(quads[k])) for k in kinds}
    psi_raw = {k: psi[k] * invd_psi[k][..., None] for k in kinds}

    sweeps = []
    for o, cal_o in enumerate(cals):
        sel = ((lambda t: jax.tree.map(lambda x: x[o], t)) if stacked
               else (lambda t: t))
        quads_o, psi_raw_o = sel(quads), sel(psi_raw)
        solver = cal_o.meta.get('psi_solver', None)
        if solver is None:
            # Lazy factory: builds the (factor-holding) solver only when its
            # output's factors are ready, and releases it before the next
            # output's build — N resident engine factors at once would be
            # an HBM OOM at large N (one is ~10 GB at N=50k f32).
            factory = cal_o.meta.get('psi_solver_factory', None)
            solver = factory() if factory is not None else None
        if solver is None:
            K_cho_o = cal_o.K_cho
            if cpu is not None:
                K_cho_o = jax.device_put(K_cho_o, cpu)
            psi_solved = {k: _psi_solve(K_cho_o, psi_raw_o[k]) for k in kinds}
            sweeps.append({'layout': layout, 'quads': quads_o,
                           'psi': psi_solved})
            continue
        # psi_solver mode (large N — no dense f64 K_cho anywhere): ONE
        # refined FULL K-solve for every kind's factors at once; K^{-1} f
        # replaces the half-solve L^{-1} f, and the assembly pairs
        # (raw, solved) factors so every quadform is still exactly
        # f1ᵀ K⁻¹ f2.  Kinds concatenate along the dim axis (ragged in
        # prefix-last mode) and split back by size.
        sizes = [psi_raw_o[k].shape[0] for k in kinds]
        solved = solver(jnp.concatenate([psi_raw_o[k] for k in kinds],
                                        axis=0))
        del solver                       # drop the factor before the next o
        offs = np.concatenate([[0], np.cumsum(sizes)])
        sweeps.append({'layout': layout, 'quads': quads_o,
                       'psi': {k: solved[offs[i]:offs[i + 1]]
                               for i, k in enumerate(kinds)},
                       'psi_raw': psi_raw_o})
    if host_paced:
        jax.block_until_ready([s['psi'] for s in sweeps])
    _sweep_t['solve_s'] = round(_time.time() - _t0, 2)
    cal.last_error_sweep_timings = _sweep_t
    return sweeps


def _psi_solve(K_cho: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    """tri_solve(K_cho, factor (M, l, i, N)) with the original broadcast
    semantics (_psi_contract: K_cho's batch axis aligns with ``i``), but
    reshaped so each K_cho[i] sees ONE multi-RHS solve — the (M, l)-batched
    form tiles a full (N, N) matrix copy per batch element on TPU."""
    Mm, l, i, N = factor.shape
    if K_cho.ndim == 2:
        sol = tri_solve(K_cho, factor.reshape(Mm * l * i, N).T)   # (N, R)
        return sol.T.reshape(Mm, l, i, N)
    rhs = jnp.transpose(factor, (2, 3, 0, 1)).reshape(i, N, Mm * l)
    sol = tri_solve(K_cho, rhs)                                    # batch i
    return jnp.transpose(sol.reshape(i, N, Mm, l), (2, 3, 0, 1))


# --------------------------------------------------------------------------- #
# Assembly: W (and T) per slice from the sweep outputs
# --------------------------------------------------------------------------- #

def _mu_phi(cal, layout, quads_m) -> Dict[str, jnp.ndarray]:
    """mu_phi_mu per family from one slice's member quads — the branch rules
    of ClosedSobolWithError._mu_phi_mu (reference calibrators.py:259-288)."""
    pref = cal.mu_phi_mu['pre-factor']
    out: Dict[str, jnp.ndarray] = {}
    for spec, quad in zip(layout, quads_m):
        if spec['mixed']:
            mu = jnp.einsum('k, jk -> jk', pref, quad)
            mu = _set_diag(mu, 2.0 * _diag_part(mu))
        elif spec['out'] == 'j':
            mu = jnp.diag(jnp.einsum('j, j -> j', pref, quad))
        else:
            mu = jnp.einsum('k, jk -> jk', pref, quad)
        out[spec['family']] = out.get(spec['family'], 0.0) + mu
    return out


def _mu_psi(first: jnp.ndarray, second: jnp.ndarray, mixed: bool) -> jnp.ndarray:
    """mu_psi_mu for one slice (reference calibrators.py:311-322): the
    quadform f1ᵀ K⁻¹ f2 from a (first, second) factor pair — both
    K_cho-half-solved in the default mode, (raw, K⁻¹-full-solved) in
    psi_solver mode.  ``first`` is the slice's own factor (DIAGONAL) or the
    full-interval factor taken on its output diagonal (MIXED)."""
    ein = 'iin, lin -> li' if mixed else 'lin, lin -> li'
    r = jnp.einsum(ein, first, second)
    return _set_diag(r, 2.0 * _diag_part(r))


def _psi_pair(sweep, kind: str, m: int):
    """(first, second) factor pair of one slice: (half, half) in K_cho mode,
    (raw, solved) in psi_solver mode."""
    solved = sweep['psi'][kind][m]
    raw = sweep.get('psi_raw')
    return (raw[kind][m] if raw is not None else solved, solved)


def _w_of(cal, layout, quads_m, pair_m, full_first) -> Dict[str, jnp.ndarray]:
    first_m, second_m = pair_m
    out = {}
    for fam, mu in _mu_phi(cal, layout, quads_m).items():
        mixed = fam == 'MIXED'
        W = mu - _mu_psi(full_first if mixed else first_m, second_m, mixed)
        out[fam] = W + W.T
    return out


def _full_first(cal, sweep) -> jnp.ndarray:
    """The MIXED-family first factor: the full-interval (0, M) prefix column
    (the LAST emitted prefix column — index M-1 in a full prefix sweep, 0 in
    prefix-last mode) — raw in psi_solver mode, half-solved otherwise."""
    raw = sweep.get('psi_raw')
    return (raw['prefix'][-1] if raw is not None
            else sweep['psi']['prefix'][-1])


def _full_cache(cal, sweep) -> Dict[str, Any]:
    """The full-interval (0, M) error quantities from a sweep's prefix
    column: psi_factor, W per family, and Q/T in non-partial mode."""
    pair_full = _psi_pair(sweep, 'prefix', -1)
    full_W = _w_of(cal, sweep['layout'],
                   [q[-1] for q in sweep['quads']['prefix']],
                   pair_full, _full_first(cal, sweep))
    cache = {'psi_factor': sweep['psi']['prefix'][-1], 'W': full_W}
    if not cal.meta['is_T_partial']:
        Q = _diag_part(full_W['MIXED']) / (4.0 * cal.V[1] * cal.V[1])
        cache['Q'] = Q[None, ...] + Q[..., None] + 2.0 * jnp.diag(Q)
        cache['T'] = cal._T_from(full_W['DIAGONAL'], cache['Q'],
                                 full_W['MIXED'], cal.V[0])
    return cache


def full_interval(cal) -> Dict[str, Any]:
    """Lazy backing of ClosedSobolWithError.psi_factor/W/Q/T."""
    return _full_cache(cal, error_scan(cal, {}))


def intervals(cal, slices, kinds_idx, V_cols, host_paced: bool = False):
    """W and T columns for classified canonical slices.

    ``kinds_idx`` = [('single'|'prefix'|'suffix'|'empty', idx)] aligned with
    ``slices``; ``V_cols`` are the V columns of the base pass (slice axis
    last), used by the non-partial T correction.  Populates the
    calibrator's full-interval error cache as a side effect.
    """
    need = _need_of(cal, kinds_idx)
    sweep = error_scan(cal, need, host_paced)
    return _assemble(cal, sweep, need, kinds_idx, V_cols)


def intervals_stacked(cals, slices, kinds_idx, V_cols_list,
                      host_paced: bool = False):
    """Multi-output :func:`intervals`: ONE stacked (vmapped-over-outputs)
    error sweep for independent single-output calibrators sharing X, then
    per-output W/T assembly.  ``V_cols_list`` holds each calibrator's base-
    pass V columns, aligned with ``slices``.  Returns one {'W','T'} dict per
    calibrator."""
    need = _need_of(cals[0], kinds_idx)
    sweeps = error_scan_stacked(cals, need, host_paced)
    return [_assemble(c, s, need, kinds_idx, V)
            for c, s, V in zip(cals, sweeps, V_cols_list)]


def _need_of(cal, kinds_idx) -> Dict[str, bool]:
    need = {k: any(s[0] == k for s in kinds_idx) for k in KINDS}
    # A (0, M) full-interval slice classifies as ('prefix', M) — the
    # defer_V path appends one on every call — but it is served by the
    # prefix-LAST column; per-dim prefix emission is only needed for
    # PROPER closed slices (idx < M).
    need['prefix'] = any(k == 'prefix' and idx < cal.M for k, idx in kinds_idx)
    return need


def _assemble(cal, sweep, need, kinds_idx, V_cols) -> Dict[str, jnp.ndarray]:
    """W and T columns of one output from its sweep result; populates the
    calibrator's full-interval error cache as a side effect."""
    cache = _full_cache(cal, sweep)
    cal._full_error_cache = cache
    full_first = _full_first(cal, sweep)

    L_out = cal.g0KY.shape[0]
    zero = jnp.zeros((L_out, L_out), dtype=cal.G.dtype)
    W_cols, T_cols = [], []
    for i, (kind, idx) in enumerate(kinds_idx):
        if kind == 'empty':
            W_cols.append(zero)
            T_cols.append(zero)
            continue
        if kind == 'prefix':
            m = idx - 1 if need['prefix'] else 0   # prefix-last: one column
        else:
            m = idx
        Ws = _w_of(cal, sweep['layout'],
                   [q[m] for q in sweep['quads'][kind]],
                   _psi_pair(sweep, kind, m), full_first)
        W_cols.append(Ws['DIAGONAL'])
        if cal.meta['is_T_partial']:
            T_cols.append(cal._T(Ws['DIAGONAL']))
        else:
            T_cols.append(cal._T_from(Ws['DIAGONAL'], cache['Q'], Ws['MIXED'],
                                      V_cols[..., i]))
    return {'W': jnp.stack(W_cols, axis=-1), 'T': jnp.stack(T_cols, axis=-1)}
