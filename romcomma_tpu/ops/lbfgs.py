"""On-device L-BFGS minimization.

The reference optimizes GP hyperparameters with gpflow's Scipy wrapper around
Fortran L-BFGS-B (gpr/models.py:359-361), paying a host<->device round trip
per iteration. Here the whole descent is one jitted lax.while_loop over
optax.lbfgs with zoom linesearch — zero host traffic until convergence.

Stopping rules mirror scipy.optimize.minimize(method='L-BFGS-B'):
  - maxiter      (reference META: 5000, gpr/models.py:330)
  - gtol         max|grad| <= gtol (reference META: 1e-16, i.e. never binding)
  - ftol         (f_prev - f) / max(|f_prev|, |f|, 1) <= ftol
                 (scipy default 2.22e-9 — the rule that actually terminates
                 the reference's runs)
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Any

import jax
import jax.numpy as jnp
import optax

#: scipy's default ftol for L-BFGS-B = 2.220446049250313e-09.
SCIPY_FTOL = 2.220446049250313e-09


class MinimizeResult(NamedTuple):
    params: Any
    value: jnp.ndarray
    grad_norm: jnp.ndarray
    iterations: jnp.ndarray
    converged: jnp.ndarray     # True if stopped on ftol/gtol rather than maxiter


def _tree_inf_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.asarray(0.0)
    return jnp.max(jnp.stack([jnp.max(jnp.abs(leaf)) for leaf in leaves]))




def _pin_dtypes(fun: Callable, params):
    """Wrap fun so it always sees the initial params' dtypes AND returns the
    params' working dtype: optax's zoom linesearch evaluates fun at
    params + (f64 stepsize) * direction under x64, silently promoting the
    whole objective to f64 — and an objective that promotes internally (e.g.
    f64 data with f32 params) would otherwise make the stored-value dtype in
    the linesearch state disagree with fresh evaluations (lax.cond branches
    must match inside optax.value_and_grad_from_state)."""
    dtypes = jax.tree_util.tree_map(lambda a: jnp.asarray(a).dtype, params)
    leaves = jax.tree_util.tree_leaves(dtypes)
    out_dtype = jnp.result_type(*leaves) if leaves else jnp.float32

    def pinned(p):
        value = fun(jax.tree_util.tree_map(lambda a, d: a.astype(d), p, dtypes))
        return jnp.asarray(value, out_dtype)

    return pinned


def minimize(fun: Callable, params, maxiter: int = 5000, gtol: float = 1e-16,
             ftol: float = SCIPY_FTOL, memory_size: int = 30) -> MinimizeResult:
    """Minimize ``fun(params)`` over a pytree. Fully jittable."""
    fun = _pin_dtypes(fun, params)
    opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fun)

    class Carry(NamedTuple):
        params: Any
        state: Any
        prev_value: jnp.ndarray
        value: jnp.ndarray
        grad_norm: jnp.ndarray
        it: jnp.ndarray
        done: jnp.ndarray

    v0, g0 = jax.value_and_grad(fun)(params)
    state0 = opt.init(params)
    carry0 = Carry(params, state0, jnp.inf, v0, _tree_inf_norm(g0),
                   jnp.asarray(0), jnp.asarray(False))

    def cond(c: Carry):
        return jnp.logical_and(c.it < maxiter, jnp.logical_not(c.done))

    def body(c: Carry):
        value, grad = value_and_grad(c.params, state=c.state)
        updates, state = opt.update(grad, c.state, c.params, value=value,
                                    grad=grad, value_fn=fun)
        new_params = optax.apply_updates(c.params, updates)
        # optax's zoom-linesearch state is f64 under x64; pin param dtypes.
        new_params = jax.tree_util.tree_map(
            lambda n, o: n.astype(o.dtype), new_params, c.params)
        new_value = optax.tree.get(state, 'value')
        gnorm = _tree_inf_norm(optax.tree.get(state, 'grad'))
        rel_decrease = (value - new_value) / jnp.maximum(
            jnp.maximum(jnp.abs(value), jnp.abs(new_value)), 1.0)
        done = jnp.logical_or(gnorm <= gtol, rel_decrease <= ftol)
        # Guard against a linesearch failure producing NaN: keep old params.
        bad = jnp.logical_not(jnp.isfinite(new_value))
        new_params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(bad, old, new), new_params, c.params)
        new_value = jnp.where(bad, value, new_value)
        return Carry(new_params, state, value, new_value, gnorm, c.it + 1,
                     jnp.logical_or(done, bad))

    final = jax.lax.while_loop(cond, body, carry0)
    return MinimizeResult(final.params, final.value, final.grad_norm,
                          final.it, final.done)


def minimize_scipy(fun: Callable, params, maxiter: int = 5000, gtol: float = 1e-16,
                   ftol: float = SCIPY_FTOL, memory_size: int = 30,
                   callback: Callable | None = None,
                   max_linesearch_steps: int | None = None,
                   fuse: bool = True) -> MinimizeResult:
    """scipy L-BFGS-B driving a single jitted value_and_grad program.

    The whole-descent (`minimize`) and fused-step (`minimize_host`) programs
    grow with N and have crashed the XLA TPU compiler near N=20k; the plain
    value+grad program compiles and runs fine (measured 2.06 s at
    N=20000/M=30 f32). Here each objective evaluation is one bounded device
    dispatch and the optimizer itself is the reference's exact Fortran
    L-BFGS-B (gpr/models.py:359-361 via gpflow's Scipy wrapper), giving
    stopping-rule parity for free. Non-finite evaluations are reported to
    scipy as a large value with zero gradient so the linesearch backs off;
    the returned value is a fresh final evaluation, so callers' breakdown
    checks (isfinite) still work.

    ``fuse=False`` leaves value_and_grad EAGER: each custom-VJP piece
    (gram, factorization, solves, streamed gradients) dispatches separately
    with inter-dispatch buffer donation. At N=50k one fused program holds
    the gram and the factor carry live together (2 x 9.4 GB, an HBM OOM);
    the eager chain peaks at one (Npad,Npad) buffer and is the measured
    25 s/eval single-chip N=50k route."""
    import numpy as np
    from scipy.optimize import minimize as sp_minimize

    fun = _pin_dtypes(fun, params)
    vg = jax.jit(jax.value_and_grad(fun)) if fuse else jax.value_and_grad(fun)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = [np.shape(np.asarray(l)) for l in leaves]
    sizes = [int(np.size(np.asarray(l))) for l in leaves]
    dtypes = [jnp.asarray(l).dtype for l in leaves]

    def pack(ls):
        return np.concatenate([np.asarray(l, np.float64).ravel() for l in ls])

    def unpack(v):
        out, offset = [], 0
        for shape, size, dt in zip(shapes, sizes, dtypes):
            out.append(jnp.asarray(v[offset:offset + size].reshape(shape), dt))
            offset += size
        return jax.tree_util.tree_unflatten(treedef, out)

    last = {'value': np.inf, 'gnorm': np.inf, 'it': 0, 'evals': 0,
            'first_nonfinite': False}

    def f(v):
        value, grad = jax.device_get(vg(unpack(v)))
        g = pack(jax.tree_util.tree_leaves(grad))
        last['evals'] += 1
        if not (np.isfinite(float(value)) and np.all(np.isfinite(g))):
            # A non-finite FIRST evaluation makes L-BFGS-B see a zero
            # projected gradient and "converge" at x0 — flag it so the
            # returned success field tells the truth.
            if last['evals'] == 1:
                last['first_nonfinite'] = True
            return 1e100, np.zeros_like(g)
        last['value'], last['gnorm'] = float(value), float(np.max(np.abs(g)))
        return float(value), g

    def scipy_callback(_xk):
        # scipy's callback passes only xk; report the latest evaluation with
        # the (it, value, gnorm) signature minimize_host's callback uses.
        last['it'] += 1
        if callback is not None:
            callback(last['it'], last['value'], last['gnorm'])

    options = {'maxiter': maxiter, 'ftol': ftol, 'gtol': gtol,
               'maxcor': memory_size}
    if max_linesearch_steps:
        options['maxls'] = int(max_linesearch_steps)
    res = sp_minimize(f, pack(leaves), jac=True, method='L-BFGS-B',
                      callback=scipy_callback, options=options)
    params_out = unpack(res.x)
    final_value, final_grad = jax.device_get(vg(params_out))
    g = pack(jax.tree_util.tree_leaves(final_grad))
    gnorm = float(np.max(np.abs(g))) if np.all(np.isfinite(g)) else np.inf
    success = bool(res.success) and not (last['first_nonfinite'] and res.nit == 0)
    return MinimizeResult(params_out, jnp.asarray(float(final_value)),
                          jnp.asarray(gnorm), jnp.asarray(int(res.nit)),
                          jnp.asarray(success))


def minimize_host(fun: Callable, params, maxiter: int = 5000, gtol: float = 1e-16,
                  ftol: float = SCIPY_FTOL, memory_size: int = 30,
                  callback: Callable | None = None,
                  max_linesearch_steps: int | None = None) -> MinimizeResult:
    """Host-paced variant of :func:`minimize`: the same optax L-BFGS with zoom
    linesearch and stopping rules, but each iteration is its own jitted
    dispatch driven from Python.

    Use for very large problems: the fused whole-descent program keeps one
    device execution alive for minutes (tunnelled runtimes kill it) and its
    compile grows with the problem; the per-step program stays small and each
    dispatch is bounded by one iteration. ``callback(it, value, gnorm)`` gives
    progress observability the fused loop cannot.
    """
    fun = _pin_dtypes(fun, params)
    # max_linesearch_steps caps the in-dispatch zoom linesearch: each
    # host-paced step is ONE device dispatch, and tunnelled runtimes kill
    # executions beyond ~1-2 minutes — at large-N f64 each extra linesearch
    # evaluation costs tens of seconds. Capping trades convergence quality
    # for bounded dispatches, so it is opt-in.
    if max_linesearch_steps:
        opt = optax.lbfgs(memory_size=memory_size,
                          linesearch=optax.scale_by_zoom_linesearch(
                              max_linesearch_steps=int(max_linesearch_steps)))
    else:
        opt = optax.lbfgs(memory_size=memory_size)
    value_and_grad = optax.value_and_grad_from_state(fun)

    @jax.jit
    def step(params, state):
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(grad, state, params, value=value,
                                    grad=grad, value_fn=fun)
        new_params = optax.apply_updates(params, updates)
        # optax's zoom-linesearch state is f64 under x64; pin param dtypes.
        new_params = jax.tree_util.tree_map(
            lambda n, o: n.astype(o.dtype), new_params, params)
        new_value = optax.tree.get(state, 'value')
        gnorm = _tree_inf_norm(optax.tree.get(state, 'grad'))
        return new_params, state, value, new_value, gnorm

    state = opt.init(params)
    import numpy as np
    value = gnorm = np.inf
    it = 0
    converged = False
    for it in range(1, maxiter + 1):
        new_params, state, value, new_value, gnorm = step(params, state)
        value, new_value, gnorm = jax.device_get((value, new_value, gnorm))
        if not np.isfinite(new_value):        # linesearch failure: keep params
            converged = True
            new_value = value
            break
        params = new_params
        rel_decrease = (value - new_value) / max(abs(value), abs(new_value), 1.0)
        value = new_value
        if callback is not None:
            callback(it, float(value), float(gnorm))
        if gnorm <= gtol or rel_decrease <= ftol:
            converged = True
            break
    return MinimizeResult(params, jnp.asarray(value), jnp.asarray(gnorm),
                          jnp.asarray(it), jnp.asarray(converged))
