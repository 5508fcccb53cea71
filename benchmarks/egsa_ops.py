"""Op-level cost split of the factorized W/T error-sweep body on the
current backend.

The sweep (gsa/factorized_errors.py run_chunk) is a per-dim loop of
emulated-f64 elementwise work on (N, c) planes: carry updates (sum of
d*d), per-kind emissions (log-sum-exp shift + fast exp) and f64
contractions.  Emulated-f64 op costs on TPU are wildly non-uniform (the
scaled-difference rewrite removed one divide + one multiply per element
and measured 1.2-1.6x end-to-end), so optimization must be driven by a
measured split, not op counting.  This benchmark times each primitive at
production plane shapes, amortized over a fori_loop with a data-dependent
carry (nothing can be hoisted or DCE'd).

All arrays enter the jitted loop as FORMAL ARGUMENTS — a closure-captured
concrete plane is baked into the HLO as a constant, and two 128 MB
constants exceed the tunnel's remote-compile request limit (HTTP 413).

Timing is SLOPE-BASED: each op runs at two reps counts and the reported
cost is (t_hi - t_lo) / (reps_hi - reps_lo), with the result fetched via
``device_get`` of a scalar reduction.  On the tunnelled runtime
``block_until_ready`` does not reliably await remote execution and every
dispatch carries a ~60 ms round-trip — absolute one-shot timings measure
the tunnel, not the op.

Usage:  python benchmarks/egsa_ops.py [N] [c] [reps]
Prints one JSON line per op: seconds per plane-pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('ROMCOMMA_X64', '0')

import numpy as np


def main(N: int = 8192, c: int = 2048, reps: int = 30):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from romcomma_tpu.gsa.base import shifted_exp

    f64 = jnp.float64
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((N, 1)), f64)        # p-side mean
    b = jnp.asarray(rng.standard_normal((1, c)), f64)        # q-side mean
    E0 = jnp.asarray(-np.abs(rng.standard_normal((N, c))) * 5.0, f64)
    P0 = -E0                                                  # positive quad
    g = jnp.asarray(rng.standard_normal(N), f64)
    gq = jnp.asarray(rng.standard_normal(c), f64)
    W = g[:, None] * gq[None, :]                              # (N, c) weight

    def timed(name, body, carry0, *arrs):
        """body: (i, carry, *arrs) -> carry, applied under jit at two reps
        counts; the carry dependence defeats hoisting/DCE.  Arrays pass as
        jit arguments.  Reports the reps-slope of device_get-fetched wall
        time (fixed dispatch/round-trip costs cancel)."""
        def make(r):
            return jax.jit(lambda c0, *xs: jnp.sum(lax.fori_loop(
                0, r, lambda i, s: body(i, s, *xs), c0)))
        lo, hi = max(2, reps // 5), reps
        fns = {r: make(r) for r in (lo, hi)}
        for fn in fns.values():                               # compile+warm
            jax.device_get(fn(carry0, *arrs))
        ts = {}
        for r, fn in fns.items():
            best = float('inf')
            for _ in range(3):
                t0 = time.time()
                jax.device_get(fn(carry0, *arrs))
                best = min(best, time.time() - t0)
            ts[r] = best
        dt = (ts[hi] - ts[lo]) / (hi - lo)
        print(json.dumps({'op': name, 's_per_pass': round(dt, 6),
                          't_lo': round(ts[lo], 4), 't_hi': round(ts[hi], 4),
                          'N': N, 'c': c}), flush=True)
        return dt

    # loop-carried plane accumulations (the scan-carry patterns) ---------
    jitter = lambda i: (1.0 + 1e-12 * i)                      # loop-variant
    timed('carry_dd  E+=(a-b)^2',
          lambda i, E, a, b: E + (a * jitter(i) - b) ** 2, E0, a, b)
    timed('carry_cross E+=a*b   ',
          lambda i, E, a, b: E + (a * jitter(i)) * b, E0, a, b)
    timed('carry_add  E+=p      ',
          lambda i, E, P: E + P * jitter(i), E0, P0)

    # emissions: plane -> (tiny) reduced output; scalar carry ------------
    def emit(name, f, *arrs):
        timed(name,
              lambda i, s, E, *xs: s + f(E + s * 0.0, *xs)[()] * 1e-30,
              jnp.asarray(0.0, f64), E0, *arrs)

    emit('exp_f64 + sum        ', lambda E: jnp.sum(jnp.exp(E)))
    emit('shift_f32 + contract ',
         lambda E, g, gq: _shifted_contract(E, 'f32', g, gq, shifted_exp, jnp),
         g, gq)
    emit('shift_ff + contract  ',
         lambda E, g, gq: _shifted_contract(E, 'ff', g, gq, shifted_exp, jnp),
         g, gq)
    emit('contract_f64 gNc->   ',
         lambda E, g, gq: jnp.einsum('N,NC,C->', g, E, gq), g, gq)
    emit('reduce_max           ', lambda E: jnp.max(E))
    emit('reduce_sum           ', lambda E: jnp.sum(E))
    emit('exp_f32cast + sum    ',
         lambda E: jnp.sum(jnp.exp(E.astype(jnp.float32))).astype(f64))

    # candidate contraction rewrites: multiply + reduce instead of an
    # emulated-f64 dot_general ----------------------------------------
    emit('w_mul + reduce_all   ', lambda E, W: jnp.sum(E * W), W)
    emit('mulg + redN + dot_gq ',
         lambda E, g, gq: jnp.einsum('C,C->', jnp.sum(g[:, None] * E, axis=0),
                                     gq), g, gq)
    emit('mul + reduce_N (psi) ',
         lambda E, g: jnp.sum(jnp.sum(g[:, None] * E, axis=0) * 1e-30), g)
    emit('fused shift+exp+wsum ',
         lambda E, W: _fused_emission(E, W, shifted_exp, jnp), W)
    emit('fused ff+mulg+redN   ',
         lambda E, g, gq: _fused_redN(E, g, gq, shifted_exp, jnp), g, gq)
    emit('fused f64exp + wsum  ', lambda E, W: jnp.sum(jnp.exp(E) * W), W)


def _fused_emission(E, W, shifted_exp, jnp):
    plane, c_max = shifted_exp(E, (0, 1), 'ff')
    return jnp.sum(plane * W) * jnp.exp(c_max[0, 0])


def _fused_redN(E, g, gq, shifted_exp, jnp):
    """The member_quad rewrite: ff plane, fold g over N, reduce N, then a
    tiny dot over the surviving C axis."""
    plane, c_max = shifted_exp(E, (0, 1), 'ff')
    col = jnp.sum(g[:, None] * plane, axis=0)                 # (C,)
    return jnp.einsum('C,C->', col, gq) * jnp.exp(c_max[0, 0])


def _shifted_contract(E, mode, g, gq, shifted_exp, jnp):
    plane, c_max = shifted_exp(E, (0, 1), mode)
    return jnp.einsum('N,NC,C->', g, plane, gq) * jnp.exp(c_max[0, 0])


if __name__ == '__main__':
    args = [int(x) for x in sys.argv[1:4]]
    main(*args)
