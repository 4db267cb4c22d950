"""SCALE_r04: BASELINE config 5 at FULL size — radius 256 (1024^3-class,
~269k tiles / ~138 M voxels) on one v5e chip, with the round-4 solver
stack (ALL-children MG masks, FMG, lagged smoothing, merged prolongation,
fused BFECC tail kernel).

Measures, interleaved in one window:
  - full step, MG(depth 5, FMG + extra cycles)   [donated state]
  - full step, RBGS(50, lag-5)                   [donated state]
  - project-only: wall-clock + residual for both solvers on the developed
    velocity (div_before vs rmax_after — VERDICT r3 item 2's criterion:
    rmax <= 0.1 * div_before at MG wall-clock <= RBGS-50's).

Run: python tools/tpu_submit.py 110_scale_r4 tools/scale1024_r4.py 9000
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
MG_EXTRA_CYCLES = 2  # V-cycles after the FMG sweep (tune from probe 108)


def plume_envelope_1024(radius_vox, height_vox=1024, cx=512, cz=512):
    sys.path.insert(0, "/root/repo/tools")
    from envelopes import plume_envelope_1024 as env

    return env(radius_vox, height_vox, cx, cz)


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.models.plume import PlumeConfig, _plume_step
    from hnanosolver_tpu.ops.multigrid import hierarchy_for, solve_pressure_mg
    from hnanosolver_tpu.ops.pressure import solve_pressure
    from hnanosolver_tpu.ops.stencil import divergence, subtract_pressure_gradient

    tiles = plume_envelope_1024(RADIUS)
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    voxels = int(topo.num_voxels)
    print(f"domain: {int(topo.n_active)} tiles = {voxels / 1e6:.1f} M voxels"
          f" (capacity {int(topo.capacity)})", flush=True)

    cfg = PlumeConfig(center=(512.0, 96.0, 512.0), radius=80.0,
                      velocity_jet=8.0)
    p_mg = SolverParams(dt=1.0 / 24.0, voxel_size=0.5, pressure_solver="mg",
                        iterations=MG_EXTRA_CYCLES, mg_levels=MG_LEVELS,
                        mg_fmg=True)
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
    t0 = time.perf_counter()
    st = chain(topo, st, jnp.asarray(4), p_rb, cfg, ())
    pull(st)
    print(f"develop 4 RBGS steps (incl. compile): "
          f"{time.perf_counter() - t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    st = chain(topo, st, jnp.asarray(1), p_mg, cfg, hier)
    pull(st)
    print(f"warm MG step (incl. compile): {time.perf_counter() - t0:.1f} s",
          flush=True)

    cases = {"mg": (p_mg, hier), "rbgs": (p_rb, ())}
    slopes = {k: [] for k in cases}
    for r in range(3):
        for name, (params, hierarchy) in cases.items():
            ts = []
            for k in (1, 3):
                t0 = time.perf_counter()
                st = chain(topo, st, jnp.asarray(k), params, cfg, hierarchy)
                pull(st)
                ts.append(time.perf_counter() - t0)
            s = (ts[1] - ts[0]) / 2
            est = s if s > 0 else ts[1] / 3
            slopes[name].append(est)
            print(f"round {r} {name}: {est * 1e3:.0f} ms "
                  f"raw {[round(t, 2) for t in ts]}", flush=True)
    t_mg, t_rb = min(slopes["mg"]), min(slopes["rbgs"])

    # --- project-only: residual + wall-clock, same developed velocity ---
    @functools.partial(jax.jit, static_argnames=("params",))
    def project_p(vel, params, hierarchy):
        div = divergence(topo, vel, params.inv_voxel_size)
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
    def resid_of(vel, p, div):
        from hnanosolver_tpu.ops.pressure import residual

        out = subtract_pressure_gradient(topo, vel, p,
                                         p_rb.inv_voxel_size)
        return (jnp.max(jnp.abs(div)),
                jnp.max(jnp.abs(residual(topo, p, div, p_rb.voxel_size))),
                jnp.max(jnp.abs(divergence(topo, out,
                                           p_rb.inv_voxel_size))))

    vel = st.velocity
    stats = {}
    tproj = {}
    for name, (params, hierarchy) in cases.items():
        p, div = project_p(vel, params, hierarchy)  # compile + warm
        pull(p)
        best = float("inf")
        for r in range(3):
            t0 = time.perf_counter()
            p, div = project_p(vel, params, hierarchy)
            pull(p)
            best = min(best, time.perf_counter() - t0)
        d0, rmax, dafter = (float(x) for x in resid_of(vel, p, div))
        stats[name] = (d0, rmax, dafter)
        tproj[name] = best
        print(f"project[{name}]: {best * 1e3:.0f} ms  div_before {d0:.3f}"
              f"  rmax_after {rmax:.3f}  div_after {dafter:.3f}", flush=True)

    res = {
        "config": "baseline-5-1024^3-single-chip-r4", "radius_vox": RADIUS,
        "tiles": int(topo.n_active), "voxels": voxels,
        "mg": {"levels": MG_LEVELS, "fmg": True,
               "extra_cycles": MG_EXTRA_CYCLES,
               "step_ms": round(t_mg * 1e3, 1),
               "mvoxps": round(voxels / t_mg / 1e6, 1),
               "proj_ms": round(tproj["mg"] * 1e3, 1),
               "div0": round(stats["mg"][0], 3),
               "rmax": round(stats["mg"][1], 3),
               "div_after": round(stats["mg"][2], 3)},
        "rbgs": {"iters": 50, "lag": 5,
                 "step_ms": round(t_rb * 1e3, 1),
                 "mvoxps": round(voxels / t_rb / 1e6, 1),
                 "proj_ms": round(tproj["rbgs"] * 1e3, 1),
                 "div0": round(stats["rbgs"][0], 3),
                 "rmax": round(stats["rbgs"][1], 3),
                 "div_after": round(stats["rbgs"][2], 3)},
    }
    print(json.dumps(res), flush=True)
    out(res)  # noqa: F821


main()
