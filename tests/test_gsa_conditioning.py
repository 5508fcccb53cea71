"""Round-4 conditioning guards: the f32-planes interval tier breaks past
cond(K) ~ N s2/noise ~ 2e6 (measured: negative V_M at the converged
north-star optimum — benchmarks/converged_diag.py), so the default tier
selection gates on f32_planes_safe and the engines sanity-check V."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from romcomma_tpu.gsa.calibrators import (F32_PLANES_COND_LIMIT,
                                          f32_planes_safe)
from romcomma_tpu.parallel import distributed as dist


def test_f32_planes_safe_anchors():
    # measured-safe configs stay on the fast tier
    assert f32_planes_safe(8192, 1.0, 0.05)          # cond 1.6e5
    assert f32_planes_safe(20000, 1.0, 0.05)         # cond 4e5, |dS| 4.9e-6
    assert f32_planes_safe(50000, 1.0, 0.05)         # cond 1e6, |dS| 1.9e-5
    # the measured-broken converged optimum escalates
    assert not f32_planes_safe(20000, 1.0833, 0.010164)   # cond 2.1e6
    # worst-output semantics: max(s2), min(noise)
    assert not f32_planes_safe(20000, [0.5, 1.1], [0.05, 0.01])
    assert not f32_planes_safe(int(2 * F32_PLANES_COND_LIMIT), 1.0, 1.0)


def test_sobol_default_tier_escalates_on_accelerator(monkeypatch):
    """With the backend reported as an accelerator, the DEFAULT no-error
    tier picks f32 planes inside the envelope and f64 planes outside it —
    and both produce sane indices (the pass itself runs on CPU here)."""
    rng = np.random.default_rng(2)
    N, M = 300, 3
    X = rng.uniform(-1, 1, (N, M))
    Y = np.sin(3 * X[:, :1]) + 0.05 * rng.standard_normal((N, 1))
    dgp = dist.DistributedGP(N, dist.make_n_mesh(1), block=32,
                             dense_kernels=True)
    x_dev, y_dev = dgp.stage(X, Y)
    ls = jnp.asarray(np.full(M, 1.0))
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    # safe conditioning: N*s2/noise = 6e3 -> f32 tier
    S_safe = dgp.sobol_indices(ls, jnp.asarray(1.0), jnp.asarray(0.05),
                               x_dev, y_dev, X, kind='first_order')
    # unsafe conditioning (tiny noise): the gate must route to the 'df'
    # double-f32 tier (round 5 — f64 planes with the float-float exp before
    # it); at this small N the f32 tier would not be catastrophic, so
    # assert the ROUTE by matching the forced-df result to fp accuracy
    # (the gated run ships its pack through pack_device; same programs).
    tiny = jnp.asarray(N * 1.0 / (2 * F32_PLANES_COND_LIMIT))  # cond 2x limit
    S_gate = dgp.sobol_indices(ls, jnp.asarray(1.0), tiny, x_dev, y_dev, X,
                               kind='first_order')
    monkeypatch.undo()
    S_df = dgp.sobol_indices(ls, jnp.asarray(1.0), tiny, x_dev, y_dev, X,
                             kind='first_order', gsa_dtype=np.float64,
                             intervals_mixed='df')
    S_exact = dgp.sobol_indices(ls, jnp.asarray(1.0), tiny, x_dev, y_dev, X,
                                kind='first_order', gsa_dtype=np.float64,
                                intervals_mixed=False)
    for m in range(M):
        np.testing.assert_allclose(S_gate[m], S_df[m], rtol=1e-12)
        # and the df tier agrees with the EXACT f64 rung at its design
        # accuracy (the 'ff' rung's own ~3e-11-plane error amplifies to
        # ~3e-6 at this fixture's cond 2.4e6 — df sits well below it)
        np.testing.assert_allclose(S_df[m], S_exact[m], atol=5e-6)
    assert 0.5 < S_safe[0] <= 1.01 and abs(S_safe[1]) < 0.1


def test_fast_v_sanity_rerun_wiring(monkeypatch):
    """The stacked error path's fast_V sanity check: an invalid base V from
    the reduced tier triggers ONE rebuild without fast_V and a rerun."""
    from romcomma_tpu.gsa import calibrators as cal_mod
    rng = np.random.default_rng(6)
    N, M, L = 200, 3, 2
    X = rng.uniform(-1, 1, (N, M))
    Y = np.stack([np.sin(3 * X[:, 0]), X[:, 1] ** 2], axis=-1) \
        + 0.05 * rng.standard_normal((N, L))
    dgp = dist.DistributedGP(N, dist.make_n_mesh(1), block=32,
                             dense_kernels=True)
    x_dev, y_dev = dgp.stage(X, Y)
    ls = np.full((L, M), 1.0)
    s2 = np.full(L, 1.0)
    nz = np.full(L, 0.05)
    real = cal_mod.marginalize_intervals_error_stacked
    calls = []

    def flaky(cals, flat, host_paced=True):
        out = real(cals, flat, host_paced=host_paced)
        calls.append(len(cals))
        if len(calls) == 1:
            # corrupt the first pass's V to trip the sanity check
            import jax
            return [dict(o, V=jnp.asarray(np.asarray(o['V']) * -1.0))
                    for o in out]
        return out

    monkeypatch.setattr(dist, 'marginalize_intervals_error_stacked', flaky,
                        raising=False)
    import romcomma_tpu.gsa.calibrators as c2
    monkeypatch.setattr(c2, 'marginalize_intervals_error_stacked', flaky)
    import warnings
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter('always')
        res = dgp.sobol_indices(ls, s2, nz, x_dev, y_dev, X,
                                kind='first_order', error=True,
                                is_T_partial=False, gsa_dtype=np.float32,
                                error_solver='host')
    assert len(calls) == 2, calls            # rerun happened
    assert any('fast_V' in str(w.message) for w in caught
               if w.category is RuntimeWarning)
    for out in res:
        for m in range(M):
            assert 0.0 <= out['S'][m] <= 1.01 or abs(out['S'][m]) < 0.02


def test_alpha_quality_escalation_hook(monkeypatch):
    """A refinement stall above ALPHA_QUALITY_RTOL triggers ONE
    HIGHEST-precision refactorization (observable via _chol_precise)."""
    rng = np.random.default_rng(4)
    N, M = 300, 3
    X = rng.uniform(-1, 1, (N, M))
    Y = np.sin(3 * X[:, :1]) + 0.05 * rng.standard_normal((N, 1))
    # float32 engine: the refinement loop is dead on the f64 test default
    dgp = dist.DistributedGP(N, dist.make_n_mesh(1), block=32,
                             dense_kernels=True, dtype=np.float32)
    x_dev, y_dev = dgp.stage(X, Y)
    ls = jnp.asarray(np.full(M, 1.0), jnp.float32)
    calls = []
    real = dist.DistributedGP._chol_precise

    def spy(self):
        calls.append(1)
        return real(self)

    monkeypatch.setattr(dist.DistributedGP, '_chol_precise', spy)
    # healthy solve: refinement reaches quality, no escalation probe needed
    alpha, _ = dgp.posterior_alpha(ls, jnp.asarray(1.0, jnp.float32),
                                   jnp.asarray(0.05, jnp.float32),
                                   x_dev, y_dev)
    assert calls == []
    # force a stall: quality floor impossible -> escalation path runs (on
    # CPU the HIGH factor already equals HIGHEST so the result only gets
    # better or stays equal — the hook firing is the contract under test)
    monkeypatch.setattr(dist.DistributedGP, 'ALPHA_QUALITY_RTOL', 0.0)
    alpha2, _ = dgp.posterior_alpha(ls, jnp.asarray(1.0, jnp.float32),
                                    jnp.asarray(0.05, jnp.float32),
                                    x_dev, y_dev)
    assert calls, 'escalation probe did not fire'
    # the oracle sees the same f32-cast inputs the staged engine does (the
    # f64 refinement residual is computed against f64(f32(X)))
    X32 = X.astype(np.float32).astype(np.float64)
    Y32 = Y.astype(np.float32).astype(np.float64)
    K = np.exp(-0.5 * np.sum((X32[:, None, :] - X32[None, :, :]) ** 2,
                             axis=-1)) + np.float64(np.float32(0.05)) * np.eye(N)
    a_o = np.linalg.solve(K, Y32)
    np.testing.assert_allclose(dist.from_stored(dgp.plan, np.asarray(alpha2)),
                               a_o, atol=1e-8)


def test_df_tier_matches_f64_oracle():
    """The 'df' double-f32 interval tier (round 5) matches the pure-f64
    pass to ~1e-10 on all canonical slice families — the design point that
    replaces the 'ff' tier above the f32 conditioning gate at a fraction
    of its emulated-f64 cost (measured max rel 1.5e-11 at N=256)."""
    from romcomma_tpu.gsa.calibrators import ClosedSobol
    rng = np.random.default_rng(0)
    N, M = 256, 5
    X = rng.standard_normal((N, M))
    alpha = rng.standard_normal((N, 1))
    ls = np.full(M, 1.5)
    slices = tuple([(m, m + 1) for m in range(M)]
                   + [(m + 1, M) for m in range(M)] + [(0, M)]
                   + [(0, m + 1) for m in range(M)])
    out = {}
    for tier, kw in (('f64', dict(intervals_mixed=False)),
                     ('df', dict(intervals_mixed='df'))):
        cal = ClosedSobol.from_arrays(
            F=jnp.asarray([[1.0]]), K_cho=jnp.zeros((1, 1, 1)),
            K_inv_Y=jnp.asarray(alpha.T[None]),
            Lambda=jnp.asarray(ls[None, :]), X=jnp.asarray(X),
            is_F_diagonal=True, L=1, M=M, N=N, defer_V=True, n_chunk=64,
            **kw)
        out[tier] = np.asarray(cal.marginalize_intervals(slices)['V'])[0, 0]
    ok = np.abs(out['f64']) > 1e-20
    rel = np.abs(out['df'] / out['f64'] - 1)[ok]
    assert rel.max() < 1e-9, rel.max()
