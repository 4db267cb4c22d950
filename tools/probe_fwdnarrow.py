"""On-chip A/B of the d2-adaptive mixed forward dispatch (FWD_NARROW):
full bench plume step chains with the narrow re-traced forward pass ON vs
OFF, interleaved in one window, plus the per-step max|d2| trace that says
which branch actually fires along the bench chain (CFL ramps 1.1 -> 3.1).

Run: python tools/tpu_submit.py 127_fwdnarrow tools/probe_fwdnarrow.py 2400
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
    from hnanosolver_tpu.ops import pallas_interp2 as pi2

    params = SolverParams(dt=1.0 / 24.0, iterations=50, voxel_size=0.5)
    cfg = PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    state = zeros_state(topo)
    print(f"domain {int(topo.n_active)} tiles cap {int(topo.capacity)}",
          flush=True)

    def make_chain():
        @jax.jit
        def chain(s, k):
            return jax.lax.fori_loop(
                0, k, lambda _, x: plume_step(topo, x, params, cfg), s)
        return chain

    adv.FWD_NARROW = False
    chain_off = make_chain()
    adv.FWD_NARROW = True
    chain_on = make_chain()
    adv.FWD_NARROW = None

    for _ in range(2):
        state = plume_step(topo, state, params, cfg)
    jax.block_until_ready(state.velocity)

    # d2 trace along the chain: max re-traced displacement per step (the
    # narrow-fwd branch fires while this stays under CFL_MID = 3.9)
    sdt = params.dt * params.inv_voxel_size

    @jax.jit
    def d2max_of(v):
        tabs = pi2.build_tables(topo, [v[0], v[1], v[2]])
        dx = jnp.clip(-v[0] * sdt, -adv.DISP_LIMIT, adv.DISP_LIMIT)
        dy = jnp.clip(-v[1] * sdt, -adv.DISP_LIMIT, adv.DISP_LIMIT)
        dz = jnp.clip(-v[2] * sdt, -adv.DISP_LIMIT, adv.DISP_LIMIT)
        b = pi2.sample_tables(topo, tabs, 0, 3, dx, dy, dz, "strict")
        m = 0.0
        for i, d in enumerate((dx, dy, dz)):
            d2 = jnp.clip(d + b[i] * sdt, -adv.DISP_LIMIT, adv.DISP_LIMIT)
            m = jnp.maximum(m, jnp.max(jnp.abs(d2)))
        return m, jnp.max(jnp.maximum(jnp.abs(dx),
                                      jnp.maximum(jnp.abs(dy),
                                                  jnp.abs(dz))))

    s = state
    for i in range(12):
        s = plume_step(topo, s, params, cfg)
        if False:
            d2m, cflm = d2max_of(s.velocity)
            print(f"  step {i + 3}: cfl={float(cflm):.2f} "
                  f"max|d2|={float(d2m):.2f} "
                  f"narrow_fwd={'YES' if float(d2m) < pb.CFL_MID else 'no'}",
                  flush=True)

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    K_LO, K_HI = jnp.asarray(2), jnp.asarray(42)
    for c in (chain_off, chain_on):
        pull(c(state, K_LO))
        pull(c(state, K_HI))
    print("compiled both chains", flush=True)

    mins = {"off": [1e9, 1e9], "on": [1e9, 1e9]}
    for r in range(10):
        if r:
            time.sleep(20)
        msg = []
        for nm, c in (("off", chain_off), ("on", chain_on)):
            lo = hi = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                pull(c(state, K_LO))
                lo = min(lo, time.perf_counter() - t0)
            for _ in range(3):
                t0 = time.perf_counter()
                pull(c(state, K_HI))
                hi = min(hi, time.perf_counter() - t0)
            mins[nm][0] = min(mins[nm][0], lo)
            mins[nm][1] = min(mins[nm][1], hi)
            msg.append(f"step_{nm}={(hi - lo) / 40 * 1e3:.2f}ms")
        print(f"round {r}: " + "  ".join(msg), flush=True)

    print("anchor (global-min slope): " + "  ".join(
        f"{nm}={(v[1] - v[0]) / 40 * 1e3:.2f}ms" for nm, v in mins.items()),
        flush=True)


main()
