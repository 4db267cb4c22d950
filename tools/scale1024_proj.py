"""1024^3 (radius 256) PROJECT-ONLY wall-clock: MG(depth5, FMG+2) vs
RBGS-50 lag-5, interleaved min-of-rounds, on a developed velocity — the
VERDICT r3 item-2 wall-clock criterion re-measured with the round-4 kernel
gates (packed-plane halos, fused residual/stencils). Residuals are printed
for cross-checking against the 112_scale_r4 run (they are noise-immune).

Run: python tools/tpu_submit.py 116_scaleproj tools/scale1024_proj.py 7200
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

import json  # noqa: E402
import sys  # noqa: E402
import time  # noqa: E402

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

RADIUS = 256
MG_LEVELS = 5
MG_EXTRA_CYCLES = 2


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.models.plume import PlumeConfig, _plume_step
    from hnanosolver_tpu.ops.multigrid import hierarchy_for, solve_pressure_mg
    from hnanosolver_tpu.ops.pressure import residual, solve_pressure
    from hnanosolver_tpu.ops.stencil import divergence, subtract_pressure_gradient
    sys.path.insert(0, "/root/repo/tools")
    from envelopes import plume_envelope_1024

    tiles = plume_envelope_1024(RADIUS)
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    voxels = int(topo.num_voxels)
    print(f"domain: {int(topo.n_active)} tiles = {voxels / 1e6:.1f} M voxels",
          flush=True)

    cfg = PlumeConfig(center=(512.0, 96.0, 512.0), radius=80.0,
                      velocity_jet=8.0)
    p_mg = SolverParams(dt=1.0 / 24.0, voxel_size=0.5, pressure_solver="mg",
                        iterations=MG_EXTRA_CYCLES, mg_levels=MG_LEVELS,
                        mg_fmg=True)
    p_rb = SolverParams(dt=1.0 / 24.0, voxel_size=0.5, iterations=50)
    hier = hierarchy_for(topo, p_mg)

    chain = functools.partial(
        jax.jit, static_argnames=("params", "cfg"), donate_argnums=(1,)
    )(lambda t, s, k, params, cfg, h: jax.lax.fori_loop(
        0, k, lambda _, x: _plume_step(t, x, params, cfg, h), s))

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    st = zeros_state(topo)
    t0 = time.perf_counter()
    st = chain(topo, st, jnp.asarray(4), p_rb, cfg, ())
    pull(st)
    print(f"develop 4 RBGS steps (incl. compile): "
          f"{time.perf_counter() - t0:.1f} s", flush=True)
    vel = st.velocity

    @functools.partial(jax.jit, static_argnames=("params",))
    def project_p(v, params, hierarchy):
        div = divergence(topo, v, params.inv_voxel_size)
        if params.pressure_solver == "mg":
            p = solve_pressure_mg(
                topo, list(hierarchy), div, params.iterations,
                params.voxel_size, params.omega, n_pre=params.mg_pre,
                n_post=params.mg_post, n_coarsest=params.mg_coarsest,
                fmg=params.mg_fmg)
        else:
            p = solve_pressure(topo, div, params.iterations,
                               params.voxel_size, params.omega,
                               halo_lag=params.effective_halo_lag)
        return p, div

    @jax.jit
    def resid_of(v, p, div):
        outv = subtract_pressure_gradient(topo, v, p, p_rb.inv_voxel_size)
        return (jnp.max(jnp.abs(div)),
                jnp.max(jnp.abs(residual(topo, p, div, p_rb.voxel_size))),
                jnp.max(jnp.abs(divergence(topo, outv,
                                           p_rb.inv_voxel_size))))

    cases = {"mg": (p_mg, hier), "rbgs": (p_rb, ())}
    best = {k: float("inf") for k in cases}
    stats = {}
    for name, (params, hierarchy) in cases.items():  # compile + warm
        t0 = time.perf_counter()
        p, div = project_p(vel, params, hierarchy)
        pull(p)
        print(f"compile {name}: {time.perf_counter() - t0:.1f}s", flush=True)
        d0, rmax, dafter = (float(x) for x in resid_of(vel, p, div))
        stats[name] = (d0, rmax, dafter)
        print(f"{name}: div0 {d0:.3f} rmax {rmax:.3f} div_after "
              f"{dafter:.3f}", flush=True)
    for r in range(6):
        for name, (params, hierarchy) in cases.items():
            t0 = time.perf_counter()
            p, div = project_p(vel, params, hierarchy)
            pull(p)
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"r{r} {name}: {dt * 1e3:.0f} ms", flush=True)
        time.sleep(10)
    res = {
        "config": "1024^3-project-only-r4-gates", "radius_vox": RADIUS,
        "tiles": int(topo.n_active), "voxels": voxels,
    }
    for name in cases:
        d0, rmax, dafter = stats[name]
        res[name] = {"proj_ms": round(best[name] * 1e3, 1),
                     "div0": round(d0, 3), "rmax": round(rmax, 3),
                     "div_after": round(dafter, 3)}
    print(json.dumps(res), flush=True)
    out(res)  # noqa: F821


main()
