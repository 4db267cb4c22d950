"""A/B: velocity-pass group size 32 vs 16 (GROUP_VEL), interleaved.

GROUP_VEL=16 was chosen with the round-3 VMEM model; the current model
puts G=32/nf=3/balanced at ~92 MB < SAFE_VMEM. If it compiles and wins,
raise the default (the G8->G32 scalar jump measured 1.86x, r3/043).

Run: python tools/tpu_submit.py 0NN_gvel tools/probe_groupvel.py 1800
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

    def make_chain():
        @jax.jit
        def chain(v, k):
            return jax.lax.fori_loop(
                0, k,
                lambda _, v: adv.advect_velocity(topo, v, dt, inv_dx,
                                                 fast="balanced"),
                v)
        return chain

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    outs = {}
    chains = {}
    for gv in (16, 32):
        pb.GROUP_VEL = gv
        pb._build.cache_clear()
        chains[gv] = make_chain()
        try:
            pull(chains[gv](state.velocity, jnp.asarray(2)))
            outs[gv] = chains[gv](state.velocity, jnp.asarray(1))
            print(f"compiled GROUP_VEL={gv}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"GROUP_VEL={gv} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            return

    err = float(jnp.max(jnp.abs(outs[16] - outs[32])))
    print(f"|G16-G32| = {err:.2e}", flush=True)

    def timed(fn, arg, k, reps=3):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            pull(fn(arg, jnp.asarray(k)))
            b = min(b, time.perf_counter() - t0)
        return b

    for r in range(3):
        s = {}
        for gv in (16, 32):
            s[gv] = (timed(chains[gv], state.velocity, 8)
                     - timed(chains[gv], state.velocity, 2)) / 6
        print(f"round {r}: G16={s[16] * 1e3:.2f}ms G32={s[32] * 1e3:.2f}ms "
              f"ratio={s[16] / s[32]:.2f}", flush=True)


main()
