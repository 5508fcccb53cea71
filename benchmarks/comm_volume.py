"""Measure (not model) the cyclic2 engine's communication volume: lower the
production val+grad program on an S-device mesh and sum the bytes moved by
every collective (all-gather / collective-permute / all-reduce) in the
lowered module — the measured check of BASELINE.md's analytic
"~2*Npad^2*4B half-ring traffic" strong-scaling claim (VERDICT r4 #6).

Trace-level lowering keeps this fast (no XLA optimization pass needed: the
collectives are emitted explicitly by shard_map and survive 1:1 into the
stablehlo text).

Usage: python benchmarks/comm_volume.py [N] [S] [M]
Prints one JSON line: per-collective-kind byte totals + the analytic model.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('ROMCOMMA_X64', '0')
os.environ.setdefault('JAX_PLATFORMS', 'cpu')


def _dtype_bytes(dt: str) -> int:
    return {'f64': 8, 'f32': 4, 'bf16': 2, 'f16': 2, 'i32': 4, 'u32': 4,
            'i64': 8, 's32': 4, 's64': 8, 'i1': 1, 'pred': 1}.get(dt, 4)


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes per collective kind from lowered stablehlo text.

    Counts each op's PER-DEVICE output payload once per execution site.
    In the cyclic2 program every DOMINANT collective is Python-unrolled at
    trace time (gram ring ppermutes, per-super-panel all_gather + psum,
    inverse psums, half-ring slab rotations — cyclic_deferred.py), so site
    totals ARE executed totals for them; the only loop-resident collectives
    are the solves' per-block-step (B, 1)-scale psums inside fori bodies
    (~Npad * 12 B executed — noise against the Npad^2-scale terms)."""
    kinds = {'all_gather': r'stablehlo\.all_gather"?\(',
             'collective_permute': r'stablehlo\.collective_permute"?\(',
             'all_reduce': r'stablehlo\.all_reduce"?\('}
    out = {}
    for kind, pat in kinds.items():
        total = 0
        count = 0
        for m in re.finditer(pat, hlo_text):
            # result type may follow an inline reduction REGION (all_reduce)
            # — scan forward for the op's '-> tensor<...>' return type.
            seg = hlo_text[m.start():m.start() + 4000]
            r = re.search(r'->\s*tensor<([0-9x]*)x(f64|f32|bf16|f16|i32|'
                          r'u32|i64|s32|s64|i1)>', seg)
            if r is None:
                continue
            dims, dt = r.group(1), r.group(2)
            n = 1
            for d in dims.split('x'):
                if d:
                    n *= int(d)
            total += n * _dtype_bytes(dt)
            count += 1
        out[kind] = {'sites': count, 'site_bytes': total}
    return out


def main(N: int = 20000, S: int = 8, M: int = 30) -> dict:
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + f' --xla_force_host_platform_device_count={S}')
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np
    from romcomma_tpu.parallel import distributed as dist

    mesh = dist.make_n_mesh(S)
    dgp = dist.DistributedGP(N, mesh, dense_kernels=True)
    assert dgp._engine == 'cyclic2', dgp._engine
    pl_ = dgp.plan
    dt = jnp.float32
    x_t = jax.ShapeDtypeStruct((pl_.Npad, M), dt,
                               sharding=dist._row_sharding(mesh))
    y_t = jax.ShapeDtypeStruct((pl_.Npad, 1), dt,
                               sharding=dist._rep_sharding(mesh))
    ls_t = jax.ShapeDtypeStruct((M,), dt)
    s_t = jax.ShapeDtypeStruct((), dt)

    def valgrad(ls, s2, noise, x, y):
        return jax.value_and_grad(
            lambda p: dgp._lml(p[0], p[1], p[2], x, y))((ls, s2, noise))

    lowered = jax.jit(valgrad).lower(ls_t, s_t, s_t, x_t, y_t)
    text = lowered.as_text()
    per_kind = collective_bytes(text)
    # analytic model (BASELINE.md): gram ring (S-1 ppermute of x slabs,
    # tiny) + per-super-panel all_gather of the panel (Npad*SB each, total
    # ~Npad^2) + backward half-ring V/x slab rotations
    # (S//2 * (Npad/S)*Npad rows each device => ~Npad^2/2 per device)
    Npad = pl_.Npad
    model = {'panel_all_gather_bytes_total': 4 * Npad * Npad,
             'deferred_update_psum_bytes_total': 4 * Npad * Npad,
             'half_ring_permute_bytes_per_device':
                 4 * (S // 2) * (Npad // S) * Npad}
    out = {'N': N, 'S': S, 'M': M, 'Npad': Npad,
           'engine': dgp._engine, 'per_kind_site_totals': per_kind,
           'analytic_model_bytes': model}
    print(json.dumps(out), flush=True)
    return out


if __name__ == '__main__':
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
