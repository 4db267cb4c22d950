"""1024^3 COMPILE re-verification after the mixed-window branch + G=32
pressure + reduced fwd table: the lax.cond traces ALL dispatch arms, so
the 253k-tile envelope must still compile and fit HBM with the two new
megakernel variants (mode="back"/"fwd") in the step. One MG develop
chain + one RBGS step; no timing rounds (SCALE_r03 numbers stand).

Run: python tools/tpu_submit.py 085_scalecompile tools/probe_scalecompile.py 3600
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

sys.path.insert(0, "/root/repo/tools")
from scale1024 import plume_envelope_1024  # noqa: E402


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.models.plume import PlumeConfig, _plume_step
    from hnanosolver_tpu.ops.multigrid import hierarchy_for
    from hnanosolver_tpu.ops.stencil import divergence

    tiles = plume_envelope_1024()
    n = len(np.unique(tiles, axis=0))
    tight = ((n + 1 + 511) // 512) * 512
    topo = build_topology(tiles, capacity=tight)
    print(f"domain: {int(topo.n_active)} tiles "
          f"({topo.num_voxels / 1e6:.1f} M voxels, cap {int(topo.capacity)})",
          flush=True)

    cfg = PlumeConfig(center=(512.0, 96.0, 512.0), radius=80.0,
                      velocity_jet=8.0)
    p_mg = SolverParams(dt=1.0 / 24.0, voxel_size=0.5, pressure_solver="mg",
                        iterations=2, mg_levels=3)
    p_rb = SolverParams(dt=1.0 / 24.0, voxel_size=0.5, iterations=50)
    hier = hierarchy_for(topo, p_mg)
    print(f"hierarchy tiles/level: {[int(l.topo.n_active) for l in hier]}",
          flush=True)

    chain = functools.partial(
        jax.jit, static_argnames=("params", "cfg"), donate_argnums=(1,)
    )(lambda t, s, k, params, cfg, h: jax.lax.fori_loop(
        0, k, lambda _, x: _plume_step(t, x, params, cfg, h), s))

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    st = zeros_state(topo)
    for name, params, h in (("mg", p_mg, hier), ("rbgs", p_rb, ())):
        t0 = time.perf_counter()
        st = chain(topo, st, jnp.asarray(2), params, cfg, h)
        pull(st)
        print(f"{name}: 2 steps (incl. compile) {time.perf_counter() - t0:.1f} s",
              flush=True)

    amax = float(jnp.max(jnp.abs(st.velocity))) * (1.0 / 24.0) * 2.0
    d = float(jnp.max(jnp.abs(
        divergence(topo, st.velocity, p_rb.inv_voxel_size))))
    print(f"after 4 steps: cfl={amax:.2f} divmax={d:.3f}", flush=True)
    print("scale compile OK", flush=True)


main()
