"""Dual-kernel group-size ladder: the stack model was fitted to the
27-table kernel (combine intermediates included); the dual kernel has no
combine, so larger G may fit and compile. Force G in {16, 32} on the
scalar pass, bit-check and time.

Run: python tools/tpu_submit.py 0NN_dualg tools/probe_dualg.py 1200
"""
from __future__ import annotations

_KEEP = {"jax", "time", "json", "np", "__builtins__", "__name__", "out"}
for _k in [k for k in list(globals()) if k not in _KEEP and not k.startswith("__")]:
    del globals()[_k]
try:
    import jax as _jax

    _jax.clear_caches()
except Exception:
    pass

import sys  # noqa: E402
import time  # noqa: E402

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.models.plume import PlumeConfig, plume_step
    from hnanosolver_tpu.ops import advection as adv
    from hnanosolver_tpu.ops import pallas_bfecc as pb

    params = SolverParams(dt=1.0 / 24.0, iterations=50, voxel_size=0.5)
    cfg = PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    state = zeros_state(topo)
    for _ in range(2):
        state = plume_step(topo, state, params, cfg)
    jax.block_until_ready(state.velocity)
    inv_dx, dt = params.inv_voxel_size, params.dt
    sdt = dt * inv_dx
    scal = dict(state.scalars)
    names = sorted(scal)
    vel = state.velocity
    base = [vel[0], vel[1], vel[2]] + [scal[k] for k in names]
    nf_all = len(base)
    T = topo.capacity
    nc, Ud, _ = topo.chunk_dsrc.shape
    C = T // nc
    print(f"domain {int(topo.n_active)} tiles Ud={Ud}", flush=True)

    dx = adv._clamp(-vel[0] * sdt)
    dy = adv._clamp(-vel[1] * sdt)
    dz = adv._clamp(-vel[2] * sdt)
    tbl = jnp.pad(pb.build_table_dual(topo, base),
                  ((0, 0), (0, 0), (0, 0), (0, 64)))
    jax.block_until_ready(tbl)

    outs = {}
    chains = {}
    for G in (8, 16, 32):
        try:
            fn = pb._build(nc, Ud, C, T, nf_all, nf_all, 3, False,
                           float(sdt), False, "balanced", 16, False, True,
                           G, True)
            o = jax.block_until_ready(fn(topo.chunk_ldual, dx, dy, dz, tbl))
            outs[G] = np.asarray(o)

            @jax.jit
            def kern(dxv, tblv, k, fn=fn):
                def body(i, dxc):
                    o = fn(topo.chunk_ldual, dxc, dy, dz, tblv)
                    return dxc + o[0, 0, 0] * 1e-30
                return jax.lax.fori_loop(0, k, body, dxv)

            jax.block_until_ready(kern(dx, tbl, jnp.asarray(1)))
            chains[G] = kern
            print(f"G={G}: compiled", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"G={G}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    gs = sorted(outs)
    for G in gs[1:]:
        print(f"G={G} bit-exact vs G={gs[0]}: "
              f"{np.array_equal(outs[G], outs[gs[0]])}", flush=True)

    def t(f, k):
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(f(dx, tbl, jnp.asarray(k)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for r in range(3):
        line = []
        for G, f in chains.items():
            s = (t(f, 13) - t(f, 3)) / 10
            line.append(f"G={G}: {s * 1e3:.2f}ms")
        print(f"round {r}: " + "  ".join(line), flush=True)


main()
