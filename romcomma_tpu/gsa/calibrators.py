"""Closed-form Sobol' index calibrators.

TPU-native rebuild of ``romcomma/gsa/calibrators.py``: the conditional-
variance integrals of the GP posterior evaluate to products/ratios of
Gaussian pdfs contracted through einsum chains of effective rank 8. Under
XLA there is no rank-6 einsum limit, so the reference's ``_equateRanks``
reshape-merge workaround (calibrators.py:172-191) is preserved only where it
defines *semantics* (which axes are diagonalized/summed), not as a
performance device.

Math summary (diagonal signal variance F, the supported error path):
  g0[l,n]   = F_l * prod_m (lam2_l+1)^-1/2 * exp(-x_n^2/(2(lam2_l+1)))  — the
              kernel expectation E_z k_l(z, x_n) under z ~ N(0, I)
  g0KY      = g0 * K^-1 Y, centred
  G, Phi    = (lam2_l+1)^-1 x_n, (lam2_l+1)^-1
  V_m       = g0KY . H_m . g0KY  with H_m a ratio of Gaussians over the
              slice [m0:m1] of input axes              (reference _V)
  S_m       = V_m / V_M
with first-order/closed/total selected by the slice (gsa/models.py:77-90).
"""

from __future__ import annotations

import copy
from typing import Any, Dict, List, NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from romcomma_tpu.base.definitions import FLOAT
from romcomma_tpu.gsa.base import (Calibrator, Gaussian, diag_det, mean, rms,
                                   sos, sym_check)
from romcomma_tpu.models.gpr import GPR
from romcomma_tpu.ops.linalg import cho_solve, tri_solve


def _set_diag(x: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    L = x.shape[-1]
    idx = jnp.arange(L)
    return x.at[..., idx, idx].set(d)


def _diag_part(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.diagonal(x, axis1=-2, axis2=-1)


class ClosedSobol(Calibrator):
    """Closed Sobol' indices from a trained GP posterior
    (reference calibrators.py:31-143)."""

    META: Dict[str, Any] = {}

    def __init__(self, gp: GPR, **kwargs: Any):
        meta = dict(self.META) | kwargs
        is_F_diagonal = meta.pop('is_F_diagonal', None)
        if is_F_diagonal is None:
            # F-diagonality is inferred from the *GP's* meta.json kernel
            # options (reference calibrators.py:129-132).
            gp_options = gp.read_meta() if gp._meta_json.exists() else dict(gp.META)
            is_F_diagonal = not gp_options.pop('kernel', {}).pop('covariance', False)
        arrays = self.gather_arrays(gp)
        self._setup(is_F_diagonal=is_F_diagonal, L=gp.L, M=gp.M, N=gp.N,
                    meta=meta, **arrays)

    @staticmethod
    def gather_arrays(gp: GPR, need_K_cho: bool = True) -> Dict[str, jnp.ndarray]:
        """Host-side gathering of the traced inputs — everything device-side
        downstream is pure jnp and therefore jittable.

        Everything is float64: the Gaussian-ratio contractions cancel N^2
        large alternating terms, so GSA runs at full precision regardless of
        the training dtype (its O(N^2) cost is minor next to training).

        ``need_K_cho=False`` (the plain no-error calibrator): the factor is
        consumed ONLY by the error path's psi solves, and its f64 copy is
        the single O(N^2) buffer of the gather — 20 GB at N=50k/L=1. A
        (1,1,1) placeholder keeps the no-error pass O(N M)-sized (the same
        convention DistributedGP.sobol_indices uses)."""
        K_cho, K_inv_Y = gp.posterior_factors
        return {'F': jnp.asarray(np.asarray(gp.kernel.data.variance.np, dtype=np.float64)),
                'K_cho': (jnp.asarray(K_cho, jnp.float64) if need_K_cho
                          else jnp.zeros((1, 1, 1), jnp.float64)),
                'K_inv_Y': jnp.asarray(K_inv_Y, jnp.float64),
                'Lambda': jnp.asarray(np.asarray(gp.kernel.data.lengthscales.np,
                                                 dtype=np.float64)),
                'X': jnp.asarray(np.asarray(gp.X, dtype=np.float64))}

    @classmethod
    def from_arrays(cls, F, K_cho, K_inv_Y, Lambda, X, *, is_F_diagonal: bool,
                    L: int, M: int, N: int, **meta) -> 'ClosedSobol':
        """Construct (and pre-calibrate) from raw arrays — the traced
        constructor used under jit."""
        self = cls.__new__(cls)
        meta = dict(cls.META) | meta
        meta.pop('is_F_diagonal', None)
        self._setup(F=F, K_cho=K_cho, K_inv_Y=K_inv_Y, Lambda=Lambda, X=X,
                    is_F_diagonal=is_F_diagonal, L=L, M=M, N=N, meta=meta)
        return self

    def _setup(self, F, K_cho, K_inv_Y, Lambda, X, is_F_diagonal: bool,
               L: int, M: int, N: int, meta: Dict[str, Any]):
        self.meta = meta
        self.L, self.M, self.N = L, M, N
        self.Ms = (0, self.M)
        self.F_input = F          # pre-reshape copy (fast_V twin construction)
        self.F, self.K_cho, self.K_inv_Y = F, K_cho, K_inv_Y
        self.is_F_diagonal = is_F_diagonal
        if self.is_F_diagonal:
            self.F = self.F if self.F.shape[0] == 1 else _diag_part(self.F)
            self.F = self.F.reshape(self.L, 1)
        else:
            self.K_inv_Y = jnp.transpose(self.K_inv_Y, (1, 0, 2))
        self.Lambda = jnp.broadcast_to(Lambda, (self.L, self.M))
        self.Lambda2 = self._Lambda2()
        self.X = X
        self._calibrate()

    def _Lambda2(self) -> Dict[int, Tuple[jnp.ndarray, ...]]:
        """Powers of <Lambda^2 + J> for J in {0,1,2} (calibrators.py:99-109)."""
        if self.is_F_diagonal:
            result = jnp.einsum('lM, lM -> lM', self.Lambda, self.Lambda)[:, None, :]
        else:
            result = jnp.einsum('lM, LM -> lLM', self.Lambda, self.Lambda)
        result = tuple(result + j for j in range(3))
        return {1: result, -1: tuple(value ** (-1) for value in result)}

    def _V(self, G: jnp.ndarray, Phi: jnp.ndarray) -> jnp.ndarray:
        """Conditional variance (L,L) for the current marginalization slice
        (reference calibrators.py:60-80). When the O(L^4 N^2) H tensor would
        exceed the memory budget, the jJn axis is processed in chunks under a
        lax.scan (same math, bounded memory) — the blocking strategy
        SURVEY.md §7 hard-part 4 calls for."""
        n_chunk = self._auto_n_chunk()
        if n_chunk is not None:
            return self._V_chunked(G, Phi, n_chunk)
        Gamma = 1 - Phi
        Psi = (jnp.expand_dims(jnp.expand_dims(Gamma, axis=2), axis=2)
               + Gamma[None, None, ...])
        Psi = Psi - jnp.einsum('lLM, jJM -> lLjJM', Gamma, Gamma)
        PsiPhi = jnp.einsum('lLjJM, lLM -> lLjJM', Psi, Phi)
        PhiG = jnp.expand_dims(jnp.einsum('lLM, jJnM -> lLjJnM', Phi, G), axis=2)
        PhiGauss = Gaussian(mean=G, variance=Phi, is_variance_diagonal=True, LBunch=2)
        H = Gaussian(mean=PhiG, variance=PsiPhi,
                     ordinate=G[..., None, None, None, :], is_variance_diagonal=True, LBunch=2)
        H = H / PhiGauss.expand_dims([-1, -2, -3])
        return jnp.einsum('lLN, lLNjJn, jJn -> lj', self.g0KY, H.pdf, self.g0KY)

    #: bytes of H-tensor buffer above which _V switches to chunked evaluation.
    V_MEMORY_BUDGET_BYTES: int = 2 ** 30

    def _auto_n_chunk(self) -> 'int | None':
        """Chunk size for the jJn axis, or None to evaluate in one piece.
        Settable explicitly via meta['n_chunk']; 0 forces unchunked.

        The budget must count the trailing M axis: evaluated eagerly, the
        Gaussian exponent materializes an O(L^4 N^2 M) difference tensor
        before its M-reduction (inside the chunked lax.scan the whole chain
        compiles as one program and XLA fuses that axis away, but the
        unchunked path runs op-by-op)."""
        explicit = self.meta.get('n_chunk', None)
        if explicit is not None:
            return int(explicit) if explicit else None
        lb = self.g0KY.shape[0] * self.g0KY.shape[1]        # l*L bunch size
        budget = self.V_MEMORY_BUDGET_BYTES // jnp.dtype(self.X.dtype).itemsize
        h_elements = (lb * self.N) ** 2 * (self.M + 1)
        if h_elements <= budget:
            return None
        return max(128, int(budget) // (lb * lb * self.N * (self.M + 1)))

    def _V_chunked(self, G: jnp.ndarray, Phi: jnp.ndarray, chunk: int) -> jnp.ndarray:
        """Identical math to _V, scanning the jJn axis in chunks of ``chunk``
        so peak memory is O(L^4 N chunk) instead of O(L^4 N^2)."""
        import jax
        from jax import lax
        l, L, N, Mslice = G.shape
        Gamma = 1 - Phi
        Psi = (jnp.expand_dims(jnp.expand_dims(Gamma, axis=2), axis=2)
               + Gamma[None, None, ...])
        Psi = Psi - jnp.einsum('lLM, jJM -> lLjJM', Gamma, Gamma)
        PsiPhi = jnp.einsum('lLjJM, lLM -> lLjJM', Psi, Phi)
        PhiGauss = Gaussian(mean=G, variance=Phi, is_variance_diagonal=True, LBunch=2)
        nc = -(-N // chunk)
        Npad = nc * chunk
        Gp = jnp.pad(G, ((0, 0), (0, 0), (0, Npad - N), (0, 0)))
        gp = jnp.pad(self.g0KY, ((0, 0), (0, 0), (0, Npad - N)))   # zero pad: no contribution
        G_ch = jnp.moveaxis(Gp.reshape(l, L, nc, chunk, Mslice), 2, 0)   # (nc,l,L,c,M)
        g_ch = jnp.moveaxis(gp.reshape(l, L, nc, chunk), 2, 0)           # (nc,l,L,c)
        ordinate = G[..., None, None, None, :]
        phi_div = PhiGauss.expand_dims([-1, -2, -3])

        def body(acc, xs):
            G_c, g_c = xs
            PhiG = jnp.expand_dims(jnp.einsum('lLM, jJcM -> lLjJcM', Phi, G_c), axis=2)
            H = Gaussian(mean=PhiG, variance=PsiPhi, ordinate=ordinate,
                         is_variance_diagonal=True, LBunch=2)
            H = H / phi_div
            acc = acc + jnp.einsum('lLN, lLNjJc, jJc -> lj', self.g0KY, H.pdf, g_c)
            return acc, None

        # Carry dtype must match the body einsum's promotion: g0KY arrives
        # float64 from posterior_factors_* even when the planes (G, Phi) are
        # float32 (the declared fast path), and the quadform accumulates at
        # the promoted dtype — a G.dtype carry then fails the scan typecheck.
        V0 = jnp.zeros((l, l), dtype=jnp.result_type(G.dtype, self.g0KY.dtype))
        V, _ = lax.scan(body, V0, (G_ch, g_ch))
        return V

    def _calibrate(self):
        """Pre-compute everything independent of the marginalization slice
        (reference calibrators.py:82-97)."""
        pre_factor = jnp.sqrt(diag_det(self.Lambda2[1][0] * self.Lambda2[-1][1])) * self.F
        self.g0 = jnp.exp(Gaussian(mean=self.X[None, None, ...], variance=self.Lambda2[1][1],
                                   is_variance_diagonal=True, LBunch=2).exponent)
        self.g0 = self.g0 * pre_factor[..., None]
        self.g0KY = self.g0 * self.K_inv_Y
        self.g0KY = self.g0KY - (jnp.einsum('lLN -> l', self.g0KY)[..., None, None]
                                 / float(np.prod(self.g0KY.shape[1:])))
        self.G = jnp.einsum('lLM, NM -> lLNM', self.Lambda2[-1][1], self.X)
        self.Phi = self.Lambda2[-1][1]
        if self.meta.get('defer_V', False):
            # Skip the full-interval O(N^2 M) V pass: the caller will obtain
            # V0 from marginalize_intervals' (0, M) slice instead (one fused
            # dispatch saved — and at large N, one tunnel-kill risk less).
            # Only valid for plain ClosedSobol driven through canonical
            # intervals; marginalize()/the error path need self.V.
            return
        self.V = {0: self._V(self.G, self.Phi)}
        self.V |= {1: _diag_part(self.V[0])}
        V = jnp.sqrt(self.V[1])
        self.V |= {2: jnp.einsum('l, i -> li', V, V)}
        self.S = self.V[0] / self.V[2]
        if self.meta.get('debug', False):
            # Opt-in diagnostics (meta['debug']=True): the reference's debug
            # reductions (gsa/base.py:126-150) applied to the calibration
            # invariants — V is an (L,L) Gram of conditional variances and
            # must be symmetric; the residual is the f.p. asymmetry of the
            # einsum contraction order. jnp scalars (no host sync) so the
            # traced constructor (from_arrays under jit) stays jittable.
            self.debug = {
                'V_sym': sym_check(self.V[0], (1, 0)),
                'V_sym_relative': sym_check(self.V[0], (1, 0)) / sos(self.V[0]),
                'S_rms': rms(self.S),
                'g0KY_mean': mean(self.g0KY),
                'g0KY_rms': rms(self.g0KY),
            }

    #: padding value for masked dims in width-padded slices: contributes
    #: exponent 0 and cho_diag ratio sqrt(2g-g^2)->1 with g=1-PAD_PHI.
    PAD_PHI: float = 1e-20

    def _padded_slice(self, m: Tuple[int, int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Slice [m0:m1] of (G, Phi), zero/PAD_PHI-padded back to width M so
        every slice of every kind shares ONE compiled shape (the closed/total
        kinds otherwise compile M distinct widths — minutes of XLA time at
        large N). Padded dims are exactly neutral in the Gaussian-ratio
        algebra: G=0 gives zero exponent, Phi=PAD_PHI gives a unit
        determinant-ratio factor."""
        width = m[1] - m[0]
        pad = self.M - width
        G = jnp.pad(self.G[..., m[0]:m[1]], ((0, 0), (0, 0), (0, 0), (0, pad)))
        Phi = jnp.pad(self.Phi[..., m[0]:m[1]], ((0, 0), (0, 0), (0, pad)),
                      constant_values=self.PAD_PHI)
        return G, Phi

    def marginalize(self, m: Tuple[int, int]) -> Dict[str, jnp.ndarray]:
        """Sobol' V and S of the slice [m[0]:m[1]] (calibrators.py:49-58)."""
        G, Phi = self._padded_slice(m)
        result = {'V': self._V(G, Phi)}
        result['S'] = result['V'] / self.V[2]
        return result

    # -- factorized all-interval evaluation ----------------------------------- #
    #
    # The Gaussian-ratio pdf of an interval slice has DIAGONAL variance over
    # input dims, so it factorizes exactly per dim m:
    #   pdf_[a:b)(p,q) = prod_{m in [a,b)} exp(e_m(p,q)) / d_m
    #   e_m(p,q) = -(G_pm - Phi_m G_qm)^2/(2 PsiPhi_m) + G_pm^2/(2 Phi_m)
    #   d_m      = sqrt(PsiPhi_m / Phi_m)
    # Exponents are additive over m, so ONE prefix/suffix pass over dims
    # yields every canonical slice family at once: FIRST_ORDER needs e_m,
    # CLOSED needs E_{<=m} (prefix), TOTAL needs E_{>=m} (suffix). The padded
    # per-slice path (marginalize) pays O(N^2 M) PER SLICE; this pays
    # O(N^2 M) for ALL slices of ALL kinds — the M-fold flop reduction that
    # makes the N=20k GSA tractable.

    @staticmethod
    def _classify_interval(m: Tuple[int, int], M: int) -> Tuple[str, int]:
        a, b = int(m[0]), int(m[1])
        if a == b:
            return ('empty', 0)
        if b == a + 1:
            return ('single', a)
        if a == 0:
            return ('prefix', b)
        if b == M:
            return ('suffix', a)
        return ('general', 0)

    @staticmethod
    def _interval_specs(slices: 'Tuple[Tuple[int, int], ...]', M: int):
        """(specs, need) of the factorized pass, with the FULL (0, M) slice
        served by whichever cumulative sweep already runs: it is both
        families' end state (E_{<=M} == E_{>=0}), so when no PROPER prefix
        (0, b<M) is requested it reclassifies to ('suffix', 0) and the
        forward scan is skipped entirely. The production first_order+total
        pass then runs ONE reverse scan — one e_step and two quadforms per
        dim instead of two scans with two e_steps (measured ~25% of the
        interval sweep at N=20000)."""
        specs = [ClosedSobol._classify_interval(m, M) for m in slices]
        proper_prefix = any(k == 'prefix' and idx < M for k, idx in specs)
        if not proper_prefix:
            specs = [('suffix', 0) if (k == 'prefix' and idx == M) else (k, idx)
                     for k, idx in specs]
        need = {k: any(s[0] == k for s in specs)
                for k in ('single', 'prefix', 'suffix')}
        return specs, need

    def _intervals_chunk(self) -> int:
        """Column-chunk size for the factorized pass: ~5 live
        (l,L,N,j,J,chunk) planes inside the scan."""
        explicit = self.meta.get('n_chunk', None)
        if explicit is not None:
            # Same convention as _auto_n_chunk: 0 means unchunked, i.e. the
            # whole N as one chunk.
            return int(explicit) if explicit else self.N
        lb = self.g0KY.shape[0] * self.g0KY.shape[1]
        budget = self.V_MEMORY_BUDGET_BYTES // jnp.dtype(self.X.dtype).itemsize
        return int(min(self.N, max(128, budget // (lb * lb * self.N * 5))))

    def _intervals_pack(self, chunk: int, pairs: bool = False
                        ) -> Dict[str, jnp.ndarray]:
        """The traced per-OUTPUT tensors of the factorized interval pass, as
        one flat pytree — so independent single-output calibrators sharing X
        can be stacked along a leading axis and the chunk step vmapped over
        outputs (:func:`marginalize_intervals_stacked`).

        ``pairs`` (the 'df' tier) adds double-f32 (hi, lo) splits of every
        e-plane input. The splits MUST happen here, in the eagerly-built
        pack, never inside the compiled chunk body: fused with consuming
        f32 arithmetic, the XLA CPU emitter elides the f64->f32 convert and
        computes the consuming add at f64 — a non-IEEE 1-ulp divergence
        (verified against a host IEEE add) that silently defeats the
        two_sum error capture the whole tier is built on."""
        l, L, N, M = self.G.shape
        g = self.g0KY                                             # (l,L,N)
        Gamma = 1 - self.Phi
        Psi = (Gamma[:, :, None, None, :] + Gamma[None, None, :, :, :]
               - jnp.einsum('lLM, jJM -> lLjJM', Gamma, Gamma))
        PsiPhi = jnp.einsum('lLjJM, lLM -> lLjJM', Psi, self.Phi)  # (l,L,j,J,M)
        d = jnp.sqrt(PsiPhi / self.Phi[:, :, None, None, :])       # per-dim det
        nc = -(-N // chunk)
        Npad = nc * chunk
        # q side: zero-padded (g_q = 0 kills padding contributions exactly)
        Gq = jnp.pad(self.G, ((0, 0), (0, 0), (0, Npad - N), (0, 0)))
        Gq = jnp.moveaxis(Gq.reshape(l, L, nc, chunk, M), 2, 0)    # (nc,j,J,c,M)
        gq = jnp.moveaxis(jnp.pad(g, ((0, 0), (0, 0), (0, Npad - N))
                                  ).reshape(l, L, nc, chunk), 2, 0)  # (nc,j,J,c)
        out = {'g': g,
               'Gq': Gq, 'gq': gq,
               'Gp_m': jnp.moveaxis(self.G, -1, 0),               # (M,l,L,N)
               'Phi_m': jnp.moveaxis(self.Phi, -1, 0),            # (M,l,L)
               'PsiPhi_m': jnp.moveaxis(PsiPhi, -1, 0),           # (M,l,L,j,J)
               'inv_single': 1.0 / d,
               'inv_prefix': 1.0 / jnp.cumprod(d, axis=-1),       # 1/D_{<=m+1}
               'inv_suffix': 1.0 / jnp.cumprod(d[..., ::-1], axis=-1)[..., ::-1]}
        if pairs:
            from romcomma_tpu.ops import fastmath as fm
            sh = 0.5 * self.G ** 2 / self.Phi[:, :, None, :]       # (l,L,N,M)
            w = -0.5 / PsiPhi                                      # (l,L,j,J,M)
            for key, val in (('Gp_m', out['Gp_m']),
                             ('sh_m', jnp.moveaxis(sh, -1, 0)),
                             ('Phi_m', out['Phi_m']),
                             ('w_m', jnp.moveaxis(w, -1, 0)),
                             ('Gq', Gq)):
                out[key + '_hi'], out[key + '_lo'] = fm.split_f64(val)
            # runtime-opaque 1.0 for fastmath._seal — MUST reach the body
            # as a traced argument (never a closed-over literal), so every
            # chunk-loop passes the pack as a jit parameter.
            out['one'] = jnp.ones((), jnp.float32)
        return out

    #: chunk-stacked pack keys sliced per chunk step as the body's ``xs``
    #: (the df tier adds the pre-split q-side pair).
    @staticmethod
    def _intervals_xs_keys(exp_mode) -> Tuple[str, ...]:
        return (('Gq', 'gq', 'Gq_hi', 'Gq_lo') if exp_mode == 'df'
                else ('Gq', 'gq'))

    def _intervals_exp_mode(self):
        """The shifted_exp tier of the interval planes: None (pure f64 exp),
        'f32' or 'ff' (gsa.base.exp_mode_of on meta ``intervals_mixed``).

        'mixed' interval precision keeps the exponent accumulation and the
        quadform REDUCTIONS in float64 (the N^2-cancellation-sensitive
        parts) but takes the pointwise exp of each plane through a shifted
        fast transcendental — f32 (relative error ~1e-7, cannot overflow)
        or float-float 'ff' (~3e-11 at a few emulated-f64 elementwise ops);
        the per-plane max shift is undone on the REDUCED quadform by a tiny
        f64 exp. On TPU f64 is emulated and the transcendental dominates
        this pass (measured: BASELINE.md N=50k GSA row). The f32 fast mode
        (gsa_dtype=float32) reaches the same E > 88 overflow regime a naive
        f32 exp dies in — always shifted too."""
        from romcomma_tpu.gsa.base import exp_mode_of
        return exp_mode_of(self.meta.get('intervals_mixed', False),
                           self.G.dtype)

    def _intervals_finalize(self, pack, acc, specs, slices
                            ) -> 'Tuple[list, jnp.ndarray]':
        """V columns (list aligned with ``slices``) from accumulated chunk
        quadforms, with the per-slice inverse determinants applied. Under
        the f64-accumulation tier (``intervals_acc_f64``) the quadforms
        arrive float64 and everything from here on promotes to f64."""
        qf_s, qf_p, qf_f = acc
        adt = qf_s.dtype
        V_single = jnp.einsum('mlLjJ, lLjJm -> mlj', qf_s, pack['inv_single'])
        V_prefix = jnp.einsum('mlLjJ, lLjJm -> mlj', qf_p, pack['inv_prefix'])
        V_suffix = jnp.einsum('mlLjJ, lLjJm -> mlj', qf_f, pack['inv_suffix'])
        s_sum = jnp.einsum('lLN -> l', pack['g'].astype(adt))
        V_empty = jnp.einsum('l, j -> lj', s_sum, s_sum)
        columns = []
        for spec, m in zip(specs, slices):
            kindname, idx = spec
            if kindname == 'single':
                columns.append(V_single[idx])
            elif kindname == 'prefix':
                columns.append(V_prefix[idx - 1])
            elif kindname == 'suffix':
                columns.append(V_suffix[idx])
            elif kindname == 'empty':
                columns.append(V_empty)
            else:                                   # exotic: per-slice fallback
                columns.append(self.marginalize(m)['V'])
        return columns

    def marginalize_intervals(self, slices: 'Tuple[Tuple[int, int], ...]',
                              host_paced: bool = False) -> Dict[str, jnp.ndarray]:
        """V and S for MANY interval slices in one O(N^2 M) factorized pass.

        Every slice any GSA kind produces (gsa/models.py:77-90) is a single
        dim, a prefix, a suffix, or empty; exotic intervals fall back to
        :meth:`marginalize`. Returns {'V','S'} with the slice axis LAST,
        ordered as ``slices``.

        ``host_paced`` drives the column-chunk loop from Python (one bounded
        device dispatch per chunk) instead of a fused lax.scan — required on
        tunnelled TPU runtimes that kill long single executions; only valid
        outside jit.
        """
        from jax import lax
        specs, need = self._interval_specs(slices, self.M)
        if self.meta.get('defer_V', False) and any(k == 'general' for k, _ in specs):
            # The general-slice fallback goes through marginalize(), whose S
            # normalization reads self.V[2] — skipped under defer_V.
            raise ValueError('defer_V mode supports only canonical interval '
                             'slices (single dim / prefix / suffix / empty); '
                             f'got a general slice in {tuple(slices)}.')
        l, L, N, M = self.G.shape
        import time as _time
        _t_pack = _time.time()
        exp_mode = self._intervals_exp_mode()
        chunk = self._intervals_chunk()
        pack = self._intervals_pack(chunk, pairs=exp_mode == 'df')
        pack_device = self.meta.get('pack_device', None)
        if pack_device is not None:
            # setup ran on the host CPU (native f64, no per-op tunnel
            # round-trips — distributed.sobol_indices); the chunk loop runs
            # on the accelerator: ONE batched transfer of the whole pack.
            import jax
            pack = jax.device_put(pack, pack_device)
            jax.block_until_ready(pack)
        _t_pack = _time.time() - _t_pack
        nc = pack['Gq'].shape[0]
        xs_keys = self._intervals_xs_keys(exp_mode)
        acc_dtype = (jnp.float64 if self.meta.get('intervals_acc_f64', False)
                     else self.G.dtype)
        from romcomma_tpu.gsa.base import contract_by_reduce
        # the contraction form follows where the chunk loop EXECUTES (the
        # moved pack), not where the calibrator was built
        chunk_body, chunk_body_jit = _intervals_programs(
            need, exp_mode, (l, L, N, M), self.G.dtype,
            acc_dtype, contract_by_reduce(pack['g']))
        zero_qf = jnp.zeros((M, l, L, l, L), dtype=acc_dtype)

        mesh = getattr(self, 'gsa_mesh', None)
        if mesh is not None and mesh.devices.size > 1:
            # Multi-device: the q-chunk loop shards over the ('n',) mesh —
            # quadform accumulators psum; host-paced dispatches one slab of
            # S chunks per host round-trip (gsa/mesh.py).
            from romcomma_tpu.gsa.mesh import intervals_sweep
            acc = intervals_sweep(mesh, pack, chunk_body,
                                  (zero_qf, zero_qf, zero_qf), host_paced,
                                  xs_keys=xs_keys)
        elif host_paced:
            import jax
            import time as _time
            t0 = _time.time()
            step = chunk_body_jit
            acc = (zero_qf, zero_qf, zero_qf)
            for i in range(int(nc)):
                acc = step(pack, acc, tuple(pack[k][i] for k in xs_keys))
            jax.block_until_ready(acc)
            self.last_v_sweep_timings = {
                'chunks': int(nc), 'loop_s': round(_time.time() - t0, 2)}
        else:
            import jax

            def _sweep(pack_a, xs_stack, acc0):
                # pack rides as an ARGUMENT (not a closure constant) so the
                # df tier's runtime-opaque one cannot be constant-folded
                return lax.scan(lambda a, xs: (chunk_body(pack_a, a, xs),
                                               None), acc0, xs_stack)[0]
            acc = jax.jit(_sweep)(pack, tuple(pack[k] for k in xs_keys),
                                  (zero_qf, zero_qf, zero_qf))
        _t_fin = _time.time()
        columns = self._intervals_finalize(pack, acc, specs, slices)
        V = jnp.stack(columns, axis=-1)
        if hasattr(self, 'last_v_sweep_timings'):
            self.last_v_sweep_timings['pack_s'] = round(_t_pack, 2)
            self.last_v_sweep_timings['finalize_s'] = round(
                _time.time() - _t_fin, 2)
        if not hasattr(self, 'V'):           # defer_V mode: caller normalizes
            return {'V': V}
        return {'V': V, 'S': V / self.V[2][..., None]}


#: static signature -> (raw body, jitted body) of the interval chunk step
_INTERVALS_PROGRAMS: Dict[tuple, tuple] = {}


def _intervals_programs(need: Dict[str, bool], exp_mode, dims, dtype,
                        acc_dtype, reduce_contract: bool,
                        vmapped: bool = False) -> tuple:
    """Memoized (raw, jitted) chunk step of the factorized interval pass.

    The body is a pure function of this static signature; rebuilding and
    re-jitting it per ``marginalize_intervals`` call re-traced, re-lowered
    and (on tunnelled runtimes) re-deserialized the executable EVERY call —
    each sobol_indices/GSA invocation constructs a fresh calibrator, so the
    per-call cost never amortized (measured ~1 s per warm call on CPU and
    tens of seconds through the remote compile helper at large N). One
    program serves every calibrator instance with the same signature."""
    import jax
    key = (tuple(sorted((k, bool(v)) for k, v in need.items())), exp_mode,
           tuple(dims), str(dtype), str(acc_dtype), reduce_contract, vmapped)
    progs = _INTERVALS_PROGRAMS.get(key)
    if progs is None:
        body = _intervals_body(need, exp_mode, dims, dtype,
                               acc_dtype=acc_dtype,
                               reduce_contract=reduce_contract)
        if vmapped:
            body = jax.vmap(body)
        progs = (body, jax.jit(body))
        _INTERVALS_PROGRAMS[key] = progs
    return progs


def _intervals_body(need: Dict[str, bool], exp_mode,
                    dims: Tuple[int, int, int, int], dtype, acc_dtype=None,
                    reduce_contract: bool = False):
    """The factorized interval pass's chunk step as a PURE function
    ``body(pack, acc, xs) -> acc`` of the per-output tensor pack
    (:meth:`ClosedSobol._intervals_pack`) — so independent outputs stack on
    a leading axis and the step vmaps over it. ``dims`` = (l, L, N, M).

    ``acc_dtype`` (default: the plane dtype) is the dtype of the reduced
    per-chunk quadforms and their across-chunk accumulation — the f32-planes
    fast tier keeps the O(N*c) plane arithmetic float32 (full-rate on TPU,
    where f64 is emulated) but accumulates the (M,l,L,l,L) quadforms in
    float64, protecting the cancellation-sensitive across-chunk sums and
    the shift-undo exp at negligible cost."""
    from jax import lax
    from romcomma_tpu.gsa.base import shifted_exp
    l, L, N, M = dims
    is_df = exp_mode == 'df'
    if is_df:
        assert dtype == jnp.float64, 'the df tier splits float64 inputs'
        acc_dtype = jnp.float64
    acc_dtype = dtype if acc_dtype is None else acc_dtype

    def e_step(Gp1, Phi1, PsiPhi1, Gq1):
        """Per-dim exponent plane (l,L,j,J,N,c) — the big (N, c) axes stay
        LAST so the TPU's (8, 128) tiling of the two minor dims lands on
        them; the previous (l,L,N,j,J,c) layout put (J, c) minor, which at
        J=1 (the production variant path) pads 8x in memory and compute
        (measured 16.0 vs 2.0 ms per 'ff' emission on (20000, 1118))."""
        bq = (Phi1[:, :, None, None, None] * Gq1[None, None])  # (l,L,j,J,c)
        diff = Gp1[:, :, None, None, :, None] - bq[:, :, :, :, None, :]
        e = -0.5 * diff * diff / PsiPhi1[:, :, :, :, None, None]
        return e + 0.5 * (Gp1 * Gp1 / Phi1[..., None])[:, :, None, None, :, None]

    def e_step_df(Gp, sh, Phi, w, Gq):
        """The 'df' tier's exponent plane as a double-f32 (hi, lo) pair —
        the same math as :func:`e_step` carried in error-free-transformed
        f32 pairs (ops/fastmath.py) at native f32 VPU rate, ~2e-12 plane
        accuracy vs the 'ff' tier's 3e-11 at a fraction of its
        emulated-f64 cost. EVERY argument arrives as an already-split pair
        from the EAGERLY-built pack: inside a compiled body an f64->f32
        convert feeding f32 arithmetic is not reliably rounded (the XLA
        CPU emitter fuses the convert away and computes the consuming add
        at f64, a 1-ulp non-IEEE divergence that defeats the two_sum error
        capture — measured, see _intervals_pack), so the body must be
        pure-f32."""
        from romcomma_tpu.ops import fastmath as fm
        bq = fm.df_mul(tuple(t[:, :, None, None, None] for t in Phi),
                       tuple(t[None, None] for t in Gq))       # (l,L,j,J,c)
        GpB = tuple(t[:, :, None, None, :, None] for t in Gp)
        d = fm.df_add_norm(GpB, fm.df_neg(
            tuple(t[:, :, :, :, None, :] for t in bq)))
        q = fm.df_mul(fm.df_square(d),
                      tuple(t[:, :, :, :, None, None] for t in w))
        return fm.df_add_norm(
            q, tuple(t[:, :, None, None, :, None] for t in sh))

    def body(pack, acc, xs):
        g = pack['g']                                          # (l,L,N)
        Gq_c, gq_c = xs[0], xs[1]                              # (j,J,c,M), (j,J,c)
        acc_s, acc_p, acc_f = acc
        if is_df:
            pair = lambda k: (pack[k + '_hi'], pack[k + '_lo'])
            dims_m = (pair('Gp_m'), pair('sh_m'), pair('Phi_m'), pair('w_m'),
                      (jnp.moveaxis(xs[2], -1, 0), jnp.moveaxis(xs[3], -1, 0)))
        else:
            Gq_cm = jnp.moveaxis(Gq_c, -1, 0)                  # (M,j,J,c)
            dims_m = (pack['Gp_m'], pack['Phi_m'], pack['PsiPhi_m'], Gq_cm)

        def contract(plane):
            """g- and gq-weighted contraction of a plane over (N, c).

            float64 planes (the pure-f64 oracle and 'mixed'/'ff' tiers) on
            ACCELERATORS contract as elementwise multiply + reduce: an
            emulated-f64 dot_general runs off the MXU at ~10x the cost of
            mul + reduce (benchmarks/egsa_ops.py, slope-timed on the TPU).
            On the host CPU — and for float32 planes (the fast tier, an
            MXU matmul) — the einsum wins ~10x the other way (native BLAS
            / systolic array), so the form follows ``reduce_contract``."""
            if reduce_contract and plane.dtype == jnp.float64:
                col = jnp.sum(plane * g[:, :, None, None, :, None], axis=4)
                return jnp.einsum('lLjJc, jJc -> lLjJ', col, gq_c)
            return jnp.einsum('lLN, lLjJNc, jJc -> lLjJ', g, plane, gq_c)

        def qf(E):
            """Quadform of exp(E) over (N, c) — plane axes 4 and 5."""
            if exp_mode is None:
                return contract(jnp.exp(E)).astype(acc_dtype)
            plane, c_max = shifted_exp(E, (4, 5), exp_mode)
            return (contract(plane).astype(acc_dtype)
                    * jnp.exp(c_max[:, :, :, :, 0, 0].astype(acc_dtype)))

        def qf_df(Epair):
            """df-tier quadform: shift by the plane max (the shift rounding
            captured into the lo part), double-f32 exp, then the SAME f64
            contraction as the f64-plane tiers on the pair collapsed to f64
            (2 cheap f64 ops per element). The contraction CANNOT run in
            f32 — the quadform cancellation is joint over (N, c), so an
            f32 MXU sum against the alpha-weighted gq reintroduces the
            amplification the pair pipeline just removed (measured: ~2e-7
            tier error at benign conditioning and O(1) breakage at the
            converged optimum, vs ~1e-11 with the f64 contraction)."""
            from romcomma_tpu.ops import fastmath as fm
            E_hi, E_lo = Epair
            c_max = jnp.max(E_hi, axis=(4, 5), keepdims=True)
            r_hi, e_r = fm.two_sum(E_hi, -c_max)
            p_hi, p_lo = fm.df_exp_nonpos(r_hi, e_r + E_lo)
            plane = p_hi.astype(jnp.float64) + p_lo.astype(jnp.float64)
            return (contract(plane)
                    * jnp.exp(c_max[:, :, :, :, 0, 0].astype(jnp.float64)))

        E0_shape = (l, L) + Gq_c.shape[:2] + (N, Gq_c.shape[2])
        zero = jnp.zeros((l, L, l, L), dtype=acc_dtype)
        if is_df:
            import contextlib
            from romcomma_tpu.ops import fastmath as fm
            e_fn, qf_fn = e_step_df, qf_df
            eacc = fm.df_add_norm
            # the runtime-opaque one rides the pack (a traced argument) —
            # required on backends whose emitter rewrites f32 arithmetic
            # inside fusions (XLA:CPU; the TPU backend measured IEEE-clean)
            seal_ctx = fm.opaque_one(pack['one'])

            def make_E0():
                z = jnp.zeros(E0_shape, dtype=jnp.float32)
                return (z, z)
        else:
            import contextlib
            e_fn, qf_fn = e_step, qf
            seal_ctx = contextlib.nullcontext()

            def eacc(E, e):
                return E + e

            def make_E0():
                return jnp.zeros(E0_shape, dtype=dtype)
        # The single-dim quadform rides whichever cumulative scan already
        # runs (its plane e_m is bitwise the same either way); only when
        # neither family is requested does it get a carry-less scan of its
        # own. Production (first_order+total via _interval_specs) is the
        # suffix branch alone: one e_step + two quadforms per dim.
        single_on_bwd = need['suffix']
        with seal_ctx:
            if need['prefix']:
                def fwd(E, xs_m):
                    e = e_fn(*xs_m)
                    E = eacc(E, e)
                    ys = (qf_fn(e) if need['single'] and not single_on_bwd
                          else zero, qf_fn(E))
                    return E, ys
                _, (ys_s, ys_p) = lax.scan(fwd, make_E0(), dims_m)
                acc_p = acc_p + ys_p
                if need['single'] and not single_on_bwd:
                    acc_s = acc_s + ys_s
            elif need['single'] and not single_on_bwd:
                def fwd(carry, xs_m):
                    return carry, qf_fn(e_fn(*xs_m))
                _, ys_s = lax.scan(fwd, jnp.zeros((), dtype=dtype), dims_m)
                acc_s = acc_s + ys_s
            if need['suffix']:
                def bwd(E, xs_m):
                    e = e_fn(*xs_m)
                    E = eacc(E, e)
                    ys = (qf_fn(e) if need['single'] else zero, qf_fn(E))
                    return E, ys
                _, (ys_s, ys_f) = lax.scan(bwd, make_E0(), dims_m,
                                           reverse=True)
                acc_f = acc_f + ys_f
                if need['single']:
                    acc_s = acc_s + ys_s
        return (acc_s, acc_p, acc_f)

    return body


def marginalize_intervals_stacked(cals: 'List[ClosedSobol]',
                                  slices: 'Tuple[Tuple[int, int], ...]',
                                  host_paced: bool = False) -> List[Dict[str, jnp.ndarray]]:
    """ONE factorized interval pass for SEVERAL independent single-output
    calibrators sharing X: the chunk step is vmapped over the output axis,
    so all outputs stream each q chunk together instead of re-running the
    whole O(N^2 M) pass per output (the reference's per-latent loop,
    gpr/models.py:340-342, this framework exists to collapse).

    All calibrators must share N, M, dtype and canonical slices (single dim
    / prefix / suffix / empty). Returns one {'V': (l, j, n_slices)} dict per
    calibrator, numerically identical to per-calibrator
    ``marginalize_intervals`` (the vmapped math is the same ops).
    """
    import jax
    from jax import lax
    first = cals[0]
    O = len(cals)
    specs, need = first._interval_specs(slices, first.M)
    if any(k == 'general' for k, _ in specs):
        raise ValueError('stacked interval passes support only canonical '
                         f'interval slices; got {tuple(slices)}.')
    l, L, N, M = first.G.shape
    exp_mode = first._intervals_exp_mode()
    for c in cals:
        assert c.G.shape == first.G.shape and c.G.dtype == first.G.dtype, \
            'stacked outputs must share (l, L, N, M) and dtype'
        assert c._intervals_exp_mode() == exp_mode
    # the vmapped step holds O live plane sets — shrink the AUTO chunk to
    # keep the same total budget as one output's pass; an EXPLICIT
    # meta['n_chunk'] stays what the caller set (so e.g. n_chunk=0 keeps
    # the stacked and per-output routes on identical chunk partitions —
    # bit-level parity instead of summation-reorder deltas)
    chunk = (first._intervals_chunk()
             if first.meta.get('n_chunk', None) is not None
             else max(64, first._intervals_chunk() // O))
    packs = [c._intervals_pack(chunk, pairs=exp_mode == 'df') for c in cals]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *packs)
    nc = packs[0]['Gq'].shape[0]
    xs_keys = first._intervals_xs_keys(exp_mode)
    acc_dtype = (jnp.float64 if first.meta.get('intervals_acc_f64', False)
                 else first.G.dtype)
    from romcomma_tpu.gsa.base import contract_by_reduce
    vbody, vbody_jit = _intervals_programs(
        need, exp_mode, (l, L, N, M), first.G.dtype, acc_dtype,
        contract_by_reduce(first.G), vmapped=True)
    zero = jnp.zeros((O, M, l, L, l, L), dtype=acc_dtype)
    acc = (zero, zero, zero)
    if host_paced:
        step = vbody_jit
        for i in range(int(nc)):
            acc = step(stacked, acc,
                       tuple(stacked[k][:, i] for k in xs_keys))
    else:
        xs = tuple(jnp.moveaxis(stacked[k], 1, 0) for k in xs_keys)

        def _sweep(stacked_a, xs_stack, acc0):
            # argument, not closure — see marginalize_intervals
            return lax.scan(lambda a, x: (vbody(stacked_a, a, x), None),
                            acc0, xs_stack)[0]
        acc = jax.jit(_sweep)(stacked, xs, acc)
    out = []
    for o, cal in enumerate(cals):
        cols = cal._intervals_finalize(packs[o], tuple(a[o] for a in acc),
                                       specs, slices)
        out.append({'V': jnp.stack(cols, axis=-1)})
    return out


class ClosedSobolWithError(ClosedSobol):
    """Closed Sobol' indices with standard errors
    (reference calibrators.py:146-402)."""

    META: Dict[str, Any] = {'is_T_partial': True}

    class RankEquation(NamedTuple):
        l: str
        i: str
        j: str
        k: str

    class RankEquations(NamedTuple):
        DIAGONAL: Any
        MIXED: Any

    RANK_EQUATIONS = RankEquations(
        DIAGONAL=(RankEquation(l='j', i='k', j='l', k='i'),
                  RankEquation(l='k', i='j', j='i', k='l')),
        MIXED=(RankEquation(l='k', i='k', j='j', k='i'),))

    def _equateRanks(self, liLNjkJM: jnp.ndarray, rank_eq: 'RankEquation') -> jnp.ndarray:
        """Diagonalize/sum tensor ranks per rank_eq (calibrators.py:172-191).
        The reference's reshape-merge of the last two axes (TF's rank-6 einsum
        limit) is kept verbatim since the axis bookkeeping depends on it."""
        shape = list(liLNjkJM.shape)
        eqRanks_j = 'j' if shape[4] == 1 else rank_eq.j
        eqRanks_k = 'k' if shape[5] == 1 else rank_eq.k
        t = liLNjkJM.reshape(shape[:-2] + [-1])
        if rank_eq in self.RANK_EQUATIONS.MIXED:
            result = jnp.einsum('iiLNjkS -> LNjiS', t)
        else:
            result = jnp.einsum(f'liLN{eqRanks_j}{eqRanks_k}S -> LN{rank_eq.j}{rank_eq.k}S', t)
        result = result.reshape(list(result.shape[:-1]) + shape[-2:])
        return (jnp.einsum('LNjjJM -> LNjJM', result)[..., None, :, :]
                if rank_eq.j == 'i' else result)

    def _equatedRanksGaussian(self, mean: jnp.ndarray, variance: jnp.ndarray,
                              ordinate, rank_eqs) -> List[Gaussian]:
        """(calibrators.py:193-212)"""
        result = []
        N_axis = 3
        ordinate = jnp.asarray(ordinate)
        for rank_eq in rank_eqs:
            eq_ranks_variance = self._equateRanks(jnp.expand_dims(variance, N_axis), rank_eq)[..., None, :]
            eq_ranks_mean = self._equateRanks(mean, rank_eq)[..., None, :]
            shape = (tuple(eq_ranks_mean.shape[:-2]) + tuple(ordinate.shape[-2:])
                     if ordinate.ndim > 2 else None)
            eq_ranks_mean = (eq_ranks_mean if shape is None
                             else jnp.broadcast_to(eq_ranks_mean, shape)) - ordinate
            result += [Gaussian(mean=eq_ranks_mean, variance=eq_ranks_variance,
                                is_variance_diagonal=True, LBunch=10000)]
        return result

    def _omega_mean_variance(self, mp, G: jnp.ndarray, Phi: jnp.ndarray,
                             Upsilon: jnp.ndarray):
        """Omega-family mean/variance tensors (reference calibrators.py:
        214-242), elementwise in the trailing M axis, before rank-equating.
        Sliced to ``mp`` when it is not the full interval."""
        Gamma = 1 - Phi
        Gamma_inv = 1 / Gamma
        Pi = 1 + Phi + jnp.einsum('ikM, ikM, ikM -> ikM', Phi, Gamma_inv, Phi)
        Pi = 1 / Pi
        B = jnp.einsum('jJM, jJM -> jJM', Gamma, Phi)[None, :, None, ...]
        B = B + jnp.einsum('jJM, ikM, jJM -> ijkJM', Phi, Pi, Phi)
        Gamma_reshape = Gamma[:, None, :, None, :]
        C = Gamma_reshape / (1 - jnp.einsum('lLM, ikM -> liLkM', Phi, Upsilon))
        C = jnp.einsum('ikM, liLkM -> liLkM', (1 - Upsilon), C)
        Omega = jnp.einsum('ikM, ikM, ikM -> ikM', Pi, Phi, Gamma_inv)
        Omega = jnp.einsum('jJM, ikM -> ijkJM', Phi, Omega)
        mean = jnp.einsum('ijkJM, liLkM, lLM, lLNM -> liLNjkJM', Omega, C, Gamma_inv, G)
        variance = (B[None, :, None, ...]
                    + jnp.einsum('ijkJM, liLkM, ijkJM -> liLjkJM', Omega, C, Omega))
        if mp is not self.Ms:
            variance = variance[..., mp[0]:mp[1]]
            mean = mean[..., mp[0]:mp[1]]
        return mean, variance

    def _OmegaGaussian(self, mp, G: jnp.ndarray, Phi: jnp.ndarray, Upsilon: jnp.ndarray,
                       rank_eqs) -> List[Gaussian]:
        """The Omega integral family (calibrators.py:214-242)."""
        mean, variance = self._omega_mean_variance(mp, G, Phi, Upsilon)
        if mp is not self.Ms:
            G = G[..., mp[0]:mp[1]]
        return self._equatedRanksGaussian(mean, variance, G[:, None, ...], rank_eqs)

    def _upsilon_mean_variance(self, G: jnp.ndarray, Phi: jnp.ndarray,
                               Upsilon: jnp.ndarray):
        """Upsilon-family mean/variance tensors (reference calibrators.py:
        244-257), elementwise in the trailing M axis, before rank-equating."""
        Upsilon_cho = jnp.sqrt(Upsilon)
        mean = jnp.einsum('ikM, lLNM -> liLNkM', Upsilon_cho, G)[..., None, :, None, :]
        variance = 1 - jnp.einsum('ikM, lLM, ikM -> liLkM', Upsilon_cho, Phi,
                                  Upsilon_cho)[..., None, :, None, :]
        return mean, variance

    def _UpsilonGaussian(self, G: jnp.ndarray, Phi: jnp.ndarray, Upsilon: jnp.ndarray,
                         rank_eqs) -> List[Gaussian]:
        """The Upsilon integral family (calibrators.py:244-257)."""
        mean, variance = self._upsilon_mean_variance(G, Phi, Upsilon)
        return self._equatedRanksGaussian(mean, variance,
                                          jnp.asarray(0.0, dtype=FLOAT()), rank_eqs)

    def _mu_phi_mu(self, GGaussian: Gaussian, UpsilonGaussians: List[Gaussian],
                   OmegaGaussians: List[Gaussian], rank_eqs) -> jnp.ndarray:
        """E_m E_mp (mu[m] phi[m][mp] mu[mp])  (calibrators.py:259-288)."""
        GGaussian = GGaussian.expand_dims([2])
        mu_phi_mu = 0.0
        for i, rank_eq in enumerate(rank_eqs):
            OmegaGaussians[i] = OmegaGaussians[i] / GGaussian
            OmegaGaussians[i].exponent = (OmegaGaussians[i].exponent
                                          + UpsilonGaussians[i].exponent)
            if UpsilonGaussians[i].cho_diag.shape[-1] == GGaussian.cho_diag.shape[-1]:
                OmegaGaussians[i].cho_diag = (OmegaGaussians[i].cho_diag
                                              * UpsilonGaussians[i].cho_diag)
            else:
                OmegaGaussians[i].cho_diag = (diag_det(OmegaGaussians[i].cho_diag)
                                              * diag_det(UpsilonGaussians[i].cho_diag))[..., None]
            if rank_eq in self.RANK_EQUATIONS.MIXED:
                result = jnp.einsum('kLN, LNjkJn, jJn -> jk', self.g0KY,
                                    OmegaGaussians[i].pdf, self.g0KY)
                mu_phi_mu = mu_phi_mu + jnp.einsum('k, jk -> jk',
                                                   self.mu_phi_mu['pre-factor'], result)
                mu_phi_mu = _set_diag(mu_phi_mu, 2 * _diag_part(mu_phi_mu))
            elif rank_eq.l == 'k' and rank_eq.i == 'j':
                result = jnp.einsum('jLN, LNjkJn, jJn -> j', self.g0KY,
                                    OmegaGaussians[i].pdf, self.g0KY)
                mu_phi_mu = mu_phi_mu + jnp.diag(jnp.einsum('j, j -> j',
                                                            self.mu_phi_mu['pre-factor'], result))
            else:
                result = jnp.einsum('jLN, LNjkJn, jJn -> jk', self.g0KY,
                                    OmegaGaussians[i].pdf, self.g0KY)
                mu_phi_mu = mu_phi_mu + jnp.einsum('k, jk -> jk',
                                                   self.mu_phi_mu['pre-factor'], result)
        return mu_phi_mu

    def _psi_ratio(self, G: jnp.ndarray, Phi: jnp.ndarray, GGaussian: Gaussian) -> Gaussian:
        """The psi Gaussian RATIO of a slice — the pdf whose contraction
        (:meth:`_psi_contract`) yields the psi factor. Split out so the
        factorized interval pass can accumulate it per input dim."""
        D = Phi[..., None, None, :] - jnp.einsum('lLM, iIM, lLM -> lLiIM', Phi, Phi, Phi)
        mean = jnp.einsum('lLM, iInM -> lLiInM', Phi, G)
        mean = mean[:, :, None, ...] - G[..., None, None, None, :]
        gaussian = Gaussian(mean=mean, variance=D, is_variance_diagonal=True, LBunch=2)
        return gaussian / GGaussian.expand_dims([-1, -2, -3])

    def _psi_factor(self, G: jnp.ndarray, Phi: jnp.ndarray, GGaussian: Gaussian) -> jnp.ndarray:
        """The psi factor of E_m E_mp (mu psi mu) (calibrators.py:290-309)."""
        return self._psi_contract(self._psi_ratio(G, Phi, GGaussian))

    def _psi_contract(self, gaussian: Gaussian) -> jnp.ndarray:
        """Contract the psi Gaussian ratio with g0KY/g0 and solve vs K_cho."""
        factor = jnp.einsum('lLN, iIn, lLNiIn -> liIn', self.g0KY, self.g0, gaussian.pdf)
        if self.K_cho.ndim == 2 and factor.shape[-2] == 1:
            inner = jnp.einsum('liIN -> lNi', factor)
            diag = jnp.zeros(inner.shape + (inner.shape[-1],), dtype=inner.dtype)
            idx = jnp.arange(inner.shape[-1])
            diag = diag.at[..., idx, idx].set(inner)
            factor = jnp.einsum('lNiI -> liIN', diag)
        factor = factor.reshape(list(factor.shape[:-2]) + [-1, 1])
        factor = jnp.squeeze(tri_solve(self.K_cho, factor), axis=-1)
        return factor

    def _mu_psi_mu(self, psi_factor: jnp.ndarray, rank_eqs) -> jnp.ndarray:
        """(calibrators.py:311-322)"""
        first_psi_factor = (self.psi_factor if rank_eqs is self.RANK_EQUATIONS.MIXED
                            else psi_factor)
        first_ein = 'liS' if rank_eqs is self.RANK_EQUATIONS.DIAGONAL else 'iiS'
        result = jnp.einsum(f'{first_ein}, liS -> li', first_psi_factor, psi_factor)
        return _set_diag(result, 2 * _diag_part(result))

    def _W(self, mu_phi_mu: jnp.ndarray, mu_psi_mu: jnp.ndarray) -> jnp.ndarray:
        W = mu_phi_mu - mu_psi_mu
        W = W + W.T
        return W

    def _T(self, Wmm: jnp.ndarray, WMm: jnp.ndarray = None, Vm: jnp.ndarray = None) -> jnp.ndarray:
        if self.meta['is_T_partial']:
            return jnp.sqrt(jnp.abs(Wmm) / self.V[4])
        return self._T_from(Wmm, self.Q, WMm, Vm)

    def _T_from(self, Wmm: jnp.ndarray, Q: jnp.ndarray, WMm: jnp.ndarray,
                Vm: jnp.ndarray) -> jnp.ndarray:
        """Non-partial T with ``Q`` passed explicitly (the factorized engine
        computes Q itself before the lazy full-interval cache exists)."""
        Qs = Wmm - 2 * Vm * WMm / self.V[1] + Vm * Vm * Q
        return jnp.sqrt(jnp.abs(Qs) / self.V[4])

    def _families(self, m: Tuple[int, int]):
        """The error-integral families of slice ``m``: (GGaussian,
        psi ratio, Upsilon Gaussians per rank family, Omega Gaussians per
        rank family, rank families) — the per-slice evaluation path (used
        for exotic/general slices; canonical intervals go through the
        factorized scan engine in gsa/factorized_errors.py)."""
        G, Phi, Upsilon = tuple(tensor[..., m[0]:m[1]]
                                for tensor in (self.G, self.Phi, self.Upsilon))
        GGaussian = Gaussian(G, Phi, is_variance_diagonal=True, LBunch=2)
        psi_ratio = self._psi_ratio(G, Phi, GGaussian)
        families = ((self.RANK_EQUATIONS.DIAGONAL,) if self.meta['is_T_partial']
                    else tuple(self.RANK_EQUATIONS))
        ups = tuple(self._UpsilonGaussian(G, Phi, Upsilon, req) for req in families)
        oms = tuple(self._OmegaGaussian(m, self.G, self.Phi, self.Upsilon, req)
                    for req in families)
        return (GGaussian, psi_ratio, ups, oms, families)

    def _error_results(self, bundle, Vm) -> Dict[str, jnp.ndarray]:
        """W and T from a family bundle (the tail of reference
        calibrators.py:348-373). ``Vm`` is only used when is_T_partial is
        False (the V-dependent T correction)."""
        GGaussian, psi_ratio, ups_fams, oms_fams, families = bundle
        psi_factor = self._psi_contract(psi_ratio)
        Ws = [self._W(self._mu_phi_mu(GGaussian, list(ups), [copy.copy(o) for o in oms],
                                      req),
                      self._mu_psi_mu(psi_factor, req))
              for ups, oms, req in zip(ups_fams, oms_fams, families)]
        if self.meta['is_T_partial']:
            return {'W': Ws[0], 'T': self._T(Ws[0])}
        Wmm, WMm = Ws                              # (DIAGONAL, MIXED) order
        return {'W': Wmm, 'T': self._T(Wmm, WMm, Vm)}

    def marginalize(self, m: Tuple[int, int]) -> Dict[str, jnp.ndarray]:
        """(calibrators.py:348-373)"""
        result = super().marginalize(m)
        result |= self._error_results(self._families(m), result['V'])
        return result

    def marginalize_intervals(self, slices: 'Tuple[Tuple[int, int], ...]',
                              host_paced: bool = False) -> Dict[str, jnp.ndarray]:
        """Factorized all-interval pass INCLUDING standard errors.

        V/S come from the parent's O(N^2 M) scan. The W/T error integrals
        factorize the same way and are computed by the chunked-lax.scan
        engine in :mod:`romcomma_tpu.gsa.factorized_errors` — the TPU-native
        program shape (one compact scan over dims) that replaces both the
        O(N^2 M) *per slice* padded path and a Python-unrolled bundle
        formulation whose HLO broke the XLA TPU compiler at N>=4096.
        Exotic (non-canonical) slices fall back to per-slice evaluation.
        """
        slices = tuple(slices)
        specs = [self._classify_interval(m, self.M) for m in slices]
        if any(k == 'general' for k, _ in specs):
            if not hasattr(self, 'V'):
                raise ValueError('defer_V mode supports only canonical '
                                 'interval slices (single dim / prefix / '
                                 f'suffix / empty); got {slices}.')
            outs = [self.marginalize(s) for s in slices]
            return {k: jnp.stack([o[k] for o in outs], axis=-1) for k in outs[0]}
        import time as _time
        from romcomma_tpu.gsa import factorized_errors
        timings = {}
        t0 = _time.time()
        # defer_V: derive the V family from the (0, M) column of the base
        # pass (appending that slice if the caller did not request it).
        extra = not hasattr(self, 'V') and (0, self.M) not in slices
        eff = slices + ((0, self.M),) if extra else slices
        eff_specs = specs + [('prefix', self.M)] if extra else specs
        if self.meta.get('fast_V', False) and self.is_F_diagonal:
            # fast_V: the base V pass runs on a reduced-precision throwaway
            # twin while the error sweep below stays f64 — V only feeds the
            # S ratios and the T normalizers (V[1]/V[4]/per-slice Vm),
            # where the tier error lands as \|dT\| ~ 1.4e-5 against the
            # all-f64 oracle (measured N=2048/M=10; near-zero T unaffected
            # at ~1e-12). fast_V='f32' (or legacy True): the f32-planes +
            # f64-accumulation tier — INSIDE its conditioning gate only.
            # fast_V='df': the double-f32 tier, the safe fast rung at
            # converged conditioning (callers pick by f32_planes_safe; the
            # f32 twin there would only trip the sanity rerun and pay the
            # pass twice). On TPU either removes the emulated-f64 V pass —
            # 167 s of a 740 s N=20000 error run.
            twin_meta = {k: self.meta[k] for k in ('n_chunk',)
                         if k in self.meta}
            if self.meta['fast_V'] == 'df':
                twin = ClosedSobol.from_arrays(
                    F=self.F_input, K_cho=jnp.zeros((1, 1, 1), jnp.float64),
                    K_inv_Y=self.K_inv_Y, Lambda=self.Lambda, X=self.X,
                    is_F_diagonal=True, L=self.L, M=self.M, N=self.N,
                    defer_V=True, intervals_mixed='df', **twin_meta)
            else:
                f32 = jnp.float32
                twin = ClosedSobol.from_arrays(
                    F=jnp.asarray(self.F_input, f32),
                    K_cho=jnp.zeros((1, 1, 1), f32),
                    K_inv_Y=jnp.asarray(self.K_inv_Y, f32),
                    Lambda=jnp.asarray(self.Lambda, f32),
                    X=jnp.asarray(self.X, f32),
                    is_F_diagonal=True, L=self.L, M=self.M, N=self.N,
                    defer_V=True, intervals_acc_f64=True, **twin_meta)
            base = {k: jnp.asarray(v, jnp.float64) for k, v in
                    twin.marginalize_intervals(eff, host_paced).items()}
            v_detail = getattr(twin, 'last_v_sweep_timings', None)
        else:
            base = super().marginalize_intervals(eff, host_paced)
            v_detail = getattr(self, 'last_v_sweep_timings', None)
        if not hasattr(self, 'V'):
            self._adopt_V(base['V'][..., eff.index((0, self.M))])
        timings['v_pass_s'] = round(_time.time() - t0, 1)
        if v_detail:
            timings.update({f'v_{k}': v for k, v in v_detail.items()})
        t0 = _time.time()
        base |= factorized_errors.intervals(self, eff, eff_specs,
                                            base['V'], host_paced)
        timings['wt_sweep_s'] = round(_time.time() - t0, 1)
        timings.update({f'e_{k}': v for k, v in
                        getattr(self, 'last_error_sweep_timings',
                                {}).items()})
        self.last_interval_timings = timings
        if extra:
            base = {k: v[..., :-1] for k, v in base.items()}
        if 'S' not in base:      # defer_V base returns V only; normalize now
            base['S'] = base['V'] / self.V[2][..., None]
        return base

    def _calibrate(self):
        """(calibrators.py:375-402). The full-interval error integrals
        (psi_factor, W, Q, T) are computed lazily on first access by the
        factorized scan engine (gsa/factorized_errors.py) — the eager
        full-M evaluation materializes O(L^3 N^2 M) broadcast tensors,
        which is both the memory bomb and the compiler killer at scale."""
        super()._calibrate()
        if not self.is_F_diagonal:
            raise NotImplementedError('If the MOGP kernel covariance is not diagonal, '
                                      'the Sobol error calculation is unstable.')
        self.Upsilon = self.Lambda2[-1][2]
        if hasattr(self, 'V'):
            # Under defer_V the V family is derived later, from the base
            # interval pass's (0, M) column (_adopt_V).
            self.V |= {4: jnp.einsum('li, li -> li', self.V[2], self.V[2])}
        self.mu_phi_mu = {'pre-factor': jnp.reshape(
            jnp.sqrt(jnp.prod(self.Lambda2[1][0] * self.Lambda2[-1][2], axis=-1)) * self.F, [-1])}
        self._full_error_cache = None

    def _adopt_V(self, V0: jnp.ndarray) -> None:
        """Install the V family from a full-interval V column — the defer_V
        complement: large-N drivers (DistributedGP.sobol_indices) skip the
        constructor's separate O(N^2 M) V dispatch and feed the (0, M)
        column of the factorized interval pass back in instead."""
        V1 = _diag_part(V0)
        Vr = jnp.sqrt(V1)
        self.V = {0: V0, 1: V1, 2: jnp.einsum('l, i -> li', Vr, Vr)}
        self.V |= {4: jnp.einsum('li, li -> li', self.V[2], self.V[2])}
        self.S = self.V[0] / self.V[2]

    def _full_error(self) -> Dict[str, Any]:
        if self._full_error_cache is None:
            from romcomma_tpu.gsa import factorized_errors
            self._full_error_cache = factorized_errors.full_interval(self)
        return self._full_error_cache

    @property
    def psi_factor(self) -> jnp.ndarray:
        return self._full_error()['psi_factor']

    @property
    def W(self):
        w = self._full_error()['W']
        return (w['DIAGONAL'] if self.meta['is_T_partial']
                else self.RankEquations(DIAGONAL=w['DIAGONAL'], MIXED=w['MIXED']))

    @property
    def Q(self) -> jnp.ndarray:
        return self._full_error()['Q']

    @property
    def T(self) -> jnp.ndarray:
        return self._full_error()['T']


def marginalize_intervals_error_stacked(
        cals: 'List[ClosedSobolWithError]',
        slices: 'Tuple[Tuple[int, int], ...]',
        host_paced: bool = False) -> 'List[Dict[str, jnp.ndarray]]':
    """Multi-output ``ClosedSobolWithError.marginalize_intervals``: ONE
    stacked base V pass (:func:`marginalize_intervals_stacked`) plus ONE
    stacked W/T error sweep (factorized_errors.intervals_stacked, vmapped
    over the output axis) for independent single-output calibrators sharing
    X — instead of re-running both O(N^2 M) passes per output (the
    reference's eager per-latent loop, gpr/models.py:340-342).

    All calibrators must share (L=1, N, M), dtype, defer_V state and the
    program-shaping meta flags; per-output psi solvers/K_cho factors are
    applied per calibrator after the shared sweep.  Returns one
    {'V','S','W','T'} dict per calibrator, numerically identical to
    per-calibrator ``marginalize_intervals`` calls."""
    import time as _time
    from romcomma_tpu.gsa import factorized_errors
    first = cals[0]
    slices = tuple(slices)
    specs = [first._classify_interval(m, first.M) for m in slices]
    if any(k == 'general' for k, _ in specs):
        raise ValueError('stacked error interval passes support only '
                         f'canonical interval slices; got {slices}.')
    deferred = [not hasattr(c, 'V') for c in cals]
    assert all(deferred) or not any(deferred), \
        'stacked outputs must share defer_V state'
    timings = {}
    t0 = _time.time()
    extra = deferred[0] and (0, first.M) not in slices
    eff = slices + ((0, first.M),) if extra else slices
    if first.meta.get('fast_V', False) and first.is_F_diagonal:
        # Same fast_V tier ladder as the single-output path: the base V
        # pass runs on reduced-precision throwaway twins while the error
        # sweep stays f64 — 'f32'/True = f32 planes + f64 accumulation,
        # 'df' = the double-f32 tier (converged-conditioning safe;
        # precision notes at ClosedSobolWithError.marginalize_intervals).
        if first.meta['fast_V'] == 'df':
            twins = [ClosedSobol.from_arrays(
                F=c.F_input, K_cho=jnp.zeros((1, 1, 1), jnp.float64),
                K_inv_Y=c.K_inv_Y, Lambda=c.Lambda, X=c.X,
                is_F_diagonal=True, L=c.L, M=c.M, N=c.N,
                defer_V=True, intervals_mixed='df',
                **{k: c.meta[k] for k in ('n_chunk',) if k in c.meta})
                for c in cals]
        else:
            f32 = jnp.float32
            twins = [ClosedSobol.from_arrays(
                F=jnp.asarray(c.F_input, f32),
                K_cho=jnp.zeros((1, 1, 1), f32),
                K_inv_Y=jnp.asarray(c.K_inv_Y, f32),
                Lambda=jnp.asarray(c.Lambda, f32),
                X=jnp.asarray(c.X, f32),
                is_F_diagonal=True, L=c.L, M=c.M, N=c.N,
                defer_V=True, intervals_acc_f64=True,
                **{k: c.meta[k] for k in ('n_chunk',) if k in c.meta})
                for c in cals]
        bases = [{k: jnp.asarray(v, jnp.float64) for k, v in b.items()}
                 for b in marginalize_intervals_stacked(twins, eff,
                                                        host_paced)]
    else:
        bases = marginalize_intervals_stacked(cals, eff, host_paced)
    for c, b in zip(cals, bases):
        if not hasattr(c, 'V'):
            c._adopt_V(b['V'][..., eff.index((0, first.M))])
    timings['v_pass_s'] = round(_time.time() - t0, 1)
    t0 = _time.time()
    eff_specs = [first._classify_interval(m, first.M) for m in eff]
    errs = factorized_errors.intervals_stacked(
        cals, eff, eff_specs, [b['V'] for b in bases], host_paced)
    timings['wt_sweep_s'] = round(_time.time() - t0, 1)
    outs = []
    for c, b, e in zip(cals, bases, errs):
        base = dict(b) | e
        if extra:
            base = {k: v[..., :-1] for k, v in base.items()}
        if 'S' not in base:
            base['S'] = base['V'] / c.V[2][..., None]
        c.last_interval_timings = dict(timings)
        outs.append(base)
    return outs


_MARGINALIZE_ALL_CACHE: Dict[Any, Any] = {}

#: N below which the whole GSA computation is routed to the host CPU backend
#: when the default backend is an accelerator (shared constant — GSA always
#: runs in float64, see gather_arrays; rationale at
#: base.definitions.HOST_F64_BELOW_N). Overridable via meta['gsa_on_cpu'].
from romcomma_tpu.base.definitions import HOST_F64_BELOW_N as GSA_ON_CPU_BELOW_N

#: N at/above which an accelerator-backend whole-kind GSA drives the
#: interval pass host-paced (bounded per-chunk dispatches) instead of one
#: fused jit program — tunnelled runtimes kill multi-minute single
#: executions, and at this scale the fused program IS multi-minute.
#: Override per call with meta['host_paced'].
GSA_HOST_PACED_AT_N: int = 16384
from romcomma_tpu.base.definitions import host_cpu_device as _host_cpu_device


#: conditioning ceiling of the f32-planes + f64-accumulation interval tier.
#: The tier's failure mode (measured, round 4): the V quadforms contract
#: alpha = K^{-1}y against positive plane products, and alpha's norm grows
#: like the gram's conditioning ~ N*s2/noise — at a CONVERGED optimum the
#: noise lands at the data's true noise floor and the cancellation inside
#: the quadform amplifies the f32 plane error past the result. Measured on
#: the north-star posterior (N=20000, s2=1.08, noise=0.0102, cond~2.1e6):
#: V_M came out NEGATIVE and S in [-3.3, 2.4] under f32 planes with BOTH an
#: exact-f64 and an engine alpha, while f64 planes were exact to ~1e-4
#: (benchmarks/converged_diag.py + the 2x2 isolation). Measured SAFE:
#: |dS| 4.9e-6 at cond 4e5 (N=20000, noise 0.05) and 1.9e-5 at cond 1e6
#: (N=50000, noise 0.05). The gate escalates the DEFAULT tier selection to
#: f64 planes above this; the post-pass sanity check in
#: DistributedGP.sobol_indices is the second line of defense.
F32_PLANES_COND_LIMIT: float = 1.2e6

#: conditioning ceiling of the 'df' double-f32 interval tier (the rung above
#: the f32 gate). Measured on the converged-hypers fixture at N=4096
#: (benchmarks via /tmp/converged_diag.npz hypers, noise scaled to the
#: target conditioning): |dS| vs the pure-f64 oracle 1.9e-7 at cond 2.1e6,
#: 5.8e-6 at 1e7 — inside the 1e-5 acceptance — and 4e-4 at 1e8, where the
#: ~2e-12 pair-plane error's amplification breaks through (the 'ff' tier
#: breaks identically there: 3e-4). Above this the default routes to pure
#: f64 planes + native f64 exp, the exact rung.
DF_PLANES_COND_LIMIT: float = 1e7


def f32_planes_safe(N: int, s2, noise) -> bool:
    """Whether the f32-planes interval tier is inside its measured-safe
    conditioning envelope for a gram with signal variance ``s2`` and noise
    ``noise`` (worst output: callers pass max(s2)/min(noise))."""
    noise = float(np.min(np.asarray(noise, dtype=np.float64)))
    s2 = float(np.max(np.asarray(s2, dtype=np.float64)))
    return N * s2 / max(noise, 1e-300) <= F32_PLANES_COND_LIMIT


def _gsa_cpu_device(meta: Dict[str, Any], N: int):
    """The CPU device to run GSA on, or None to stay on the default backend.
    Pops meta['gsa_on_cpu'] (True/False override; None = auto).

    Auto policy: below GSA_ON_CPU_BELOW_N always host (dispatch-bound; native
    f64 compiles in seconds). At scale BOTH the no-error V pass and the
    standard-error W/T pass run on the accelerator: each is one compact
    chunked lax.scan over dims (gsa/factorized_errors.py for W/T), the
    program shape the XLA TPU compiler handles in emulated f64."""
    explicit = meta.pop('gsa_on_cpu', None)
    if explicit is None:
        route = N < GSA_ON_CPU_BELOW_N
    else:
        route = bool(explicit)
    return _host_cpu_device(route)


def marginalize_all(gp: GPR, slices: Tuple[Tuple[int, int], ...],
                    is_error_calculated: bool, **meta):
    """Run a whole GSA kind — calibrator construction plus every m-slice
    marginalization — as ONE jitted XLA computation. See
    :func:`marginalize_all_kinds`, of which this is the single-kind case.

    Returns (results, extras): results[key] has the slice axis last;
    extras = {'V0','S'[,'T']} — the quantities _post_calibrate needs.
    """
    by_kind, extras = marginalize_all_kinds(gp, {'_only': tuple(slices)},
                                            is_error_calculated, **meta)
    return by_kind['_only'], extras


def marginalize_all_kinds(gp: GPR, kind_slices: 'Dict[str, Tuple[Tuple[int, int], ...]]',
                          is_error_calculated: bool, **meta):
    """Run EVERY requested GSA kind — one calibrator precompute plus all
    m-slice marginalizations of all kinds — as ONE jitted XLA computation.

    The reference drives each slice through a Python/TF loop of eager ops
    (gsa/models.py:124-134) and rebuilds the calibrator per kind; on TPU that
    is hundreds of small dispatches and three redundant posterior setups.
    Here the calibrator precompute is shared and the full einsum chain for
    all kinds fuses into a single program, compiled once per shape signature
    (slices are width-padded, so all kinds share inner shapes).

    Returns ({kind: results}, extras).
    """
    cls = ClosedSobolWithError if is_error_calculated else ClosedSobol
    meta = {k: v for k, v in meta.items() if k not in ('folder', 'm', 'M')}
    is_F_diagonal = meta.pop('is_F_diagonal', None)
    if is_F_diagonal is None:
        gp_options = gp.read_meta() if gp._meta_json.exists() else dict(gp.META)
        is_F_diagonal = not gp_options.pop('kernel', {}).pop('covariance', False)
    arrays = ClosedSobol.gather_arrays(gp, need_K_cho=is_error_calculated)
    cpu_dev = _gsa_cpu_device(meta, gp.N)
    if cpu_dev is not None:
        # Committed CPU inputs steer the jitted computation onto the host
        # backend (native f64): fast compiles, no accelerator round-trips.
        import jax
        arrays = {k: jax.device_put(np.asarray(v), cpu_dev) for k, v in arrays.items()}
    else:
        import jax
        host_paced = bool(meta.pop(
            'host_paced', gp.N >= GSA_HOST_PACED_AT_N
            and jax.default_backend() != 'cpu'))
        if host_paced:
            # At scale on a tunnelled accelerator one fused whole-kind
            # program is a multi-minute single execution the runtime kills;
            # drive the interval pass's chunk loop from the host instead
            # (bounded dispatches — the same route DistributedGP.
            # sobol_indices takes) and apply the same precision policy:
            # NO-ERROR passes run f32 planes + f64 quadform accumulation
            # (the emulated-f64 exponent arithmetic dominates on TPU —
            # measured 29 s vs 921 s f64 at N=50k/M=30, |dS| 1.9e-5,
            # benchmarks/gsa_intervals.py); ERROR passes stay f64 planes
            # with the float-float 'ff' exp tier (~3e-11 — near-zero T
            # floors at ~3e-3 under f32 planes).
            if jax.default_backend() != 'cpu':
                if is_error_calculated:
                    meta.setdefault('intervals_mixed', 'ff')
                else:
                    noise_floor = np.asarray(
                        gp.likelihood.data.variance.np, dtype=np.float64)
                    if 'intervals_acc_f64' in meta:
                        meta.setdefault('intervals_mixed', False)
                    elif f32_planes_safe(gp.N, np.asarray(arrays['F']),
                                         noise_floor):
                        meta['intervals_acc_f64'] = True
                        arrays = {k: v.astype(jnp.float32)
                                  for k, v in arrays.items()}
                        # f32 planes need no exp tier (same policy as
                        # DistributedGP.sobol_indices) — the shifted-f32 exp
                        # only matters when the EXPONENTS are f64.
                        meta.setdefault('intervals_mixed', False)
                    else:
                        # past the f32-tier conditioning envelope (see
                        # F32_PLANES_COND_LIMIT): f64 planes + float-float
                        # exp (a shifted-f32 exp's ~1e-7 breaks under the
                        # same amplification that breaks f32 planes)
                        meta.setdefault('intervals_mixed', 'ff')
            else:
                meta.setdefault('intervals_mixed', False)
            cal = cls.from_arrays(is_F_diagonal=is_F_diagonal,
                                  L=gp.L, M=gp.M, N=gp.N, **meta, **arrays)
            flat = [s for slices in kind_slices.values() for s in slices]
            out = cal.marginalize_intervals(tuple(flat), host_paced=True)
            by_kind, start = {}, 0
            for kind, slices in kind_slices.items():
                stop = start + len(slices)
                by_kind[kind] = {k: v[..., start:stop] for k, v in out.items()}
                start = stop
            extras = {'V0': cal.V[0], 'S': cal.S}
            if is_error_calculated and not cal.meta['is_T_partial']:
                extras['T'] = cal.T
            return by_kind, extras
    shapes = tuple((k, v.shape, str(v.dtype)) for k, v in sorted(arrays.items()))
    kind_slices = {k: tuple(v) for k, v in kind_slices.items()}
    key = (cls.__name__, tuple(sorted(kind_slices.items())), bool(is_F_diagonal),
           gp.L, gp.M, gp.N, tuple(sorted(meta.items())), shapes)

    if key not in _MARGINALIZE_ALL_CACHE:
        import jax

        def _run(F, K_cho, K_inv_Y, Lambda, X):
            cal = cls.from_arrays(F, K_cho, K_inv_Y, Lambda, X,
                                  is_F_diagonal=is_F_diagonal,
                                  L=gp.L, M=gp.M, N=gp.N, **meta)
            by_kind = {}
            # ONE factorized O(N^2 M) pass over all slices of ALL kinds
            # (ClosedSobolWithError's override adds the W/T error integrals)
            flat = [s for slices in kind_slices.values() for s in slices]
            out = cal.marginalize_intervals(tuple(flat))
            start = 0
            for kind, slices in kind_slices.items():
                stop = start + len(slices)
                by_kind[kind] = {k: v[..., start:stop] for k, v in out.items()}
                start = stop
            extras = {'V0': cal.V[0], 'S': cal.S}
            if is_error_calculated and not cal.meta['is_T_partial']:
                extras['T'] = cal.T
            return by_kind, extras

        _MARGINALIZE_ALL_CACHE[key] = jax.jit(_run)
    try:
        return _MARGINALIZE_ALL_CACHE[key](**arrays)
    except Exception as original:
        # Last-resort fallback: an accelerator-side failure (typically the
        # XLA TPU compiler giving up on a large emulated-f64 program) is
        # retried on the host CPU backend, where every GSA program is known
        # to compile. Never fails the user's run on a compiler limitation.
        # Re-raises the ORIGINAL failure when the computation already ran on
        # host (cpu_dev routing) or no CPU backend exists.
        import jax
        if cpu_dev is not None or jax.default_backend() == 'cpu':
            raise
        try:
            cpu = jax.devices('cpu')[0]
        except RuntimeError:
            raise original
        arrays = {k: jax.device_put(np.asarray(v), cpu) for k, v in arrays.items()}
        return _MARGINALIZE_ALL_CACHE[key](**arrays)


def marginalize_all_kinds_folds(gps, kind_slices, is_error_calculated,
                                **meta):
    """Fold-batched :func:`marginalize_all_kinds`: every equal-shape fold's
    full GSA (all kinds, all slices, optionally the W/T error integrals)
    runs as ONE vmapped jitted program — the analytics analog of
    user.run._gpr_fold_batched (VERDICT r3 #5: run.gsa's per-fold Python
    loop was its own dispatch chain per fold). Returns a list of
    (by_kind, extras) pairs, one per gp, each identical in structure to the
    single-fold function's return.

    Callers gate on equal (N, M, L) and small/medium N — the batched
    program is the fused one, so the host-paced at-scale route
    (GSA_HOST_PACED_AT_N) stays per-fold."""
    import jax

    cls = ClosedSobolWithError if is_error_calculated else ClosedSobol
    meta = {k: v for k, v in meta.items() if k not in ('folder', 'm', 'M')}
    is_F_diagonal = meta.pop('is_F_diagonal', None)
    gp0 = gps[0]
    if is_F_diagonal is None:
        gp_options = (gp0.read_meta() if gp0._meta_json.exists()
                      else dict(gp0.META))
        is_F_diagonal = not gp_options.pop('kernel', {}).pop('covariance',
                                                             False)
    arrays_list = [ClosedSobol.gather_arrays(gp, need_K_cho=is_error_calculated)
                   for gp in gps]
    stacked = {k: jnp.stack([a[k] for a in arrays_list])
               for k in arrays_list[0]}
    cpu_dev = _gsa_cpu_device(meta, gp0.N)
    if cpu_dev is not None:
        stacked = {k: jax.device_put(np.asarray(v), cpu_dev)
                   for k, v in stacked.items()}
    meta.pop('host_paced', None)
    kind_slices = {k: tuple(v) for k, v in kind_slices.items()}
    shapes = tuple((k, v.shape, str(v.dtype)) for k, v in sorted(stacked.items()))
    key = ('folds', cls.__name__, tuple(sorted(kind_slices.items())),
           bool(is_F_diagonal), gp0.L, gp0.M, gp0.N,
           tuple(sorted(meta.items())), shapes)

    if key not in _MARGINALIZE_ALL_CACHE:

        def _run(F, K_cho, K_inv_Y, Lambda, X):
            cal = cls.from_arrays(F, K_cho, K_inv_Y, Lambda, X,
                                  is_F_diagonal=is_F_diagonal,
                                  L=gp0.L, M=gp0.M, N=gp0.N, **meta)
            flat = [s for slices in kind_slices.values() for s in slices]
            out = cal.marginalize_intervals(tuple(flat))
            by_kind, start = {}, 0
            for kind, slices in kind_slices.items():
                stop = start + len(slices)
                by_kind[kind] = {k: v[..., start:stop] for k, v in out.items()}
                start = stop
            extras = {'V0': cal.V[0], 'S': cal.S}
            if is_error_calculated and not cal.meta['is_T_partial']:
                extras['T'] = cal.T
            return by_kind, extras

        _MARGINALIZE_ALL_CACHE[key] = jax.jit(jax.vmap(_run))
    by_kind_b, extras_b = _MARGINALIZE_ALL_CACHE[key](**stacked)
    take = lambda tree, i: jax.tree_util.tree_map(lambda v: v[i], tree)
    return [(take(by_kind_b, i), take(extras_b, i)) for i in range(len(gps))]


class ClosedSobolWithRotation(ClosedSobol):
    """Closed Sobol' indices under an input-basis rotation u = Theta x — the
    ROM hook (reference calibrators.py:405-423; intended use rom/old.py:
    59-74, 200-214).

    The reference left this class as an inert ``_matrix_inverse`` stub. Here
    the rotated closed index is implemented in full-matrix Gaussian algebra:
    with orthonormal rows P = Theta[:Mu] and x ~ N(0, I),

        V[u_{1:Mu}] = Cov_u( E[f_l | Px], E[f_j | Px] )

    closes over the RBF posterior mean exactly.  Conditioning gives
    x | Px=u ~ N(P^T u, Sigma_c), Sigma_c = I - P^T P; with B_l =
    (Lambda_l^2 + Sigma_c)^{-1} and C_lj = P^T (P (B_l+B_j) P^T + I)^{-1} P,

        E_u[g^l_n g^j_n'] ∝ exp(-q_l(x_n)/2 - q_j(x_n')/2 + x_n^T B_l C_lj B_j x_n')

    so ALL N^2 pair integrals are ONE (N,M)@(M,M)@(M,N) MXU matmul plus an
    elementwise exp per output pair — and the whole map is DIFFERENTIABLE in
    Theta.  The ROM rotation is therefore chosen by gradient ascent of the
    leading closed index through a Cayley parameterization of SO(M)
    (:meth:`optimize_theta`), replacing the reference's dormant
    random-exploration heuristic (rom/old.py ``N_explore``).

    **Standard errors under rotation**: this class computes V/S only — it is
    the in-optimization objective.  The W/T error analog in a rotated basis
    is obtained BY COMPOSITION, not by full-matrix re-derivation of the
    Omega/Upsilon/psi error families: the ROM loop persists Theta into the
    fold (cumulative ``Fold.X_rotation``) and retrains, after which the
    rotated basis IS the axis-aligned basis of the new model, so
    :class:`ClosedSobolWithError` applies exactly
    (``ROM.calibrate(is_error_calculated=True)``;
    tests/test_rom.py::test_rom_error_gsa_in_rotated_basis).
    """

    def V_rotated(self, P: jnp.ndarray) -> jnp.ndarray:
        """The (L, L) conditional-variance matrix of the rotated slice
        u_{1:Mu} = P x (P: (Mu, M), orthonormal rows).  At P = I[:Mu] this
        equals ``marginalize((0, Mu))['V']`` (oracle-tested).  Jittable and
        differentiable in P.

        Matches the reference's V *estimator* exactly: the centred ``g0KY``
        weights contracted through the Gaussian pdf RATIO
        H = E_u[g^l_n g^j_n'] / (g0_ln g0_jn') — the rotated-basis
        generalization of :meth:`ClosedSobol._V`, where the diagonal per-dim
        ratio algebra becomes full-matrix algebra in Sigma_c = I - P^T P."""
        if not self.is_F_diagonal:
            raise NotImplementedError('Rotated Sobol indices require a '
                                      'diagonal kernel covariance F.')
        X = self.X                                        # (N, M)
        dt = X.dtype
        Lam2 = (self.Lambda ** 2).astype(dt)              # (L, M)
        g = self.g0KY[:, 0, :].astype(dt)                 # (L, N) centred
        L, M, Mu = self.L, self.M, P.shape[0]
        I_M = jnp.eye(M, dtype=dt)
        I_Mu = jnp.eye(Mu, dtype=dt)
        Sig_c = I_M - P.T @ P
        B, logc1, lc0, q0 = [], [], [], []
        for l in range(L):
            A = jnp.diag(Lam2[l]) + Sig_c                 # Lambda^2 + Sigma_c
            cho = jnp.linalg.cholesky(A)
            B.append(cho_solve(cho, I_M))
            logc1.append(0.5 * jnp.sum(jnp.log(Lam2[l]))
                         - jnp.sum(jnp.log(jnp.diagonal(cho))))
            # The g0 divisor's log-constant and per-point exponent (the
            # unconditional integral, Sigma_c -> I).
            lc0.append(0.5 * jnp.sum(jnp.log(Lam2[l] / (Lam2[l] + 1.0))))
            q0.append(jnp.sum(X * X / (Lam2[l] + 1.0), axis=-1))   # (N,)
        rows = []
        for l in range(L):
            cols = []
            for j in range(L):
                S = B[l] + B[j]
                cho_m = jnp.linalg.cholesky(P @ S @ P.T + I_Mu)
                C = P.T @ cho_solve(cho_m, I_Mu) @ P      # (M, M)
                q_l = jnp.einsum('nM, MK, nK -> n', X, B[l] - B[l] @ C @ B[l], X)
                q_j = jnp.einsum('nM, MK, nK -> n', X, B[j] - B[j] @ C @ B[j], X)
                cross = X @ (B[l] @ C @ B[j]) @ X.T       # (N, N) one MXU matmul
                log_H = (cross - 0.5 * (q_l - q0[l])[:, None]
                         - 0.5 * (q_j - q0[j])[None, :]
                         + (logc1[l] + logc1[j] - lc0[l] - lc0[j]
                            - jnp.sum(jnp.log(jnp.diagonal(cho_m)))))
                cols.append(g[l] @ jnp.exp(log_H) @ g[j])
            rows.append(jnp.stack(cols))
        return jnp.stack(rows)

    def S_rotated(self, P: jnp.ndarray) -> jnp.ndarray:
        """Closed Sobol' index matrix of the rotated slice, normalized by the
        total variance exactly like :meth:`ClosedSobol.marginalize`."""
        return self.V_rotated(P) / self.V[2]

    @staticmethod
    def _cayley(A_flat: jnp.ndarray, M: int) -> jnp.ndarray:
        """Theta in SO(M) from M(M-1)/2 free parameters via the Cayley
        transform Theta = (I + A)^{-1} (I - A), A skew-symmetric."""
        import jax
        idx = jnp.tril_indices(M, -1)
        A = jnp.zeros((M, M), dtype=A_flat.dtype).at[idx].set(A_flat)
        A = A - A.T
        I = jnp.eye(M, dtype=A_flat.dtype)
        lhs, rhs = I + A, I - A
        if A_flat.dtype == jnp.float64 and jax.default_backend() != 'cpu':
            # TPU LuDecomposition implements only F32/C64 (AOT compile
            # error on f64[10,10], measured round 5): factor the tiny
            # (M, M) system in f32 and recover f64-grade accuracy with two
            # refinement steps against the f64 residual (each is one more
            # f32 solve + f64 matmuls — all TPU-supported and
            # differentiable through jnp ops).
            f32, f64 = jnp.float32, jnp.float64
            lhs32 = lhs.astype(f32)
            X = jnp.linalg.solve(lhs32, rhs.astype(f32)).astype(f64)
            for _ in range(2):
                R = rhs - lhs @ X
                X = X + jnp.linalg.solve(lhs32, R.astype(f32)).astype(f64)
            return X
        return jnp.linalg.solve(lhs, rhs)

    def optimize_theta(self, Mu: int, maxiter: int = 200, n_starts: int = 4,
                       seed: int = 0, scale: float = 0.5):
        """Gradient-ascend the mean (over outputs) leading closed index
        S[u_{1:Mu}] over Theta in SO(M).  Multi-start (identity + random
        Cayley generators) guards the non-convex landscape — the gradient
        replaces the reference's N_explore random sampling.  Returns
        (Theta (M, M), best S scalar)."""
        from romcomma_tpu.ops import lbfgs
        M = self.M
        n_free = (M * (M - 1)) // 2
        dt = self.X.dtype

        def objective(A_flat):
            P = self._cayley(A_flat, M)[:Mu]
            return -jnp.mean(jnp.diagonal(self.S_rotated(P)))

        rng = np.random.default_rng(seed)
        starts = [jnp.zeros((n_free,), dtype=dt)]
        starts += [jnp.asarray(rng.normal(scale=scale, size=n_free), dtype=dt)
                   for _ in range(max(0, n_starts - 1))]
        best = None
        # The fused Cayley-descent executable is the one program known to
        # SEGFAULT the XLA executable serializer (round 4) — compile it
        # with the persistent cache bypassed so production runs keep the
        # cache for everything else (base/definitions.no_compile_cache).
        from romcomma_tpu.base.definitions import no_compile_cache
        with no_compile_cache():
            for x0 in starts:
                res = lbfgs.minimize(objective, x0, maxiter=maxiter)
                if best is None or float(res.value) < float(best.value):
                    best = res
        theta = np.asarray(self._cayley(best.params, M))
        # Deterministic signs (leading entry of each row positive) keep the
        # persisted rotation reproducible; row sign flips leave S invariant.
        signs = np.sign(theta[np.arange(M), np.abs(theta).argmax(axis=1)])
        theta = theta * signs[:, None]
        if np.linalg.det(theta) < 0:
            theta[-1] *= -1.0
        return theta, -float(best.value)
