"""BASELINE config 5 at its actual scale: a 1024^3-class sparse plume on ONE
v5e chip (~269k tiles, ~138 M active voxels), full solver step with multigrid
pressure, MEASURED (not HBM-budget math — VERDICT r2 missing item 2).

Run through the persistent worker:
    python tools/tpu_submit.py 0NN_scale1024 tools/scale1024.py 3600

Memory discipline (16 GB HBM, probe r4/002 OOM'd at 19.9 GB without it):
- every step call DONATES its input state (plume_step_donated semantics);
  the measurement chains one evolving state through both solver configs,
- the advection chunk-table governor slices by BUILD PEAK (pallas_bfecc),
- the worker namespace is purged up front (tpu_server keeps prior jobs'
  globals alive).

Prints a small markdown table + one JSON line. Methodology matches
SCALE_r02.md: one window, chain-slope timing (2- vs 4-step device chains),
MG(3-level, 2 V-cycles) then RBGS(50, lag-5) on the same evolving state.
Spec: SURVEY §5.7 / BASELINE.json config 5 (1024^3 multigrid).
"""
from __future__ import annotations

# purge the persistent worker namespace FIRST: prior jobs' globals pin HBM
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


def plume_envelope_1024(radius_vox=248, height_vox=1024, cx_vox=512, cz_vox=512):
    """4x-scaled version of bench.build_plume_envelope: emitter sphere +
    rising cone. radius 248 gives ~253k tiles / ~130 M voxels — the largest
    envelope that compiles inside 15.75 GB HBM with headroom (radius 256 =
    269k tiles peaked 430 MB over after all the r4 memory work; the binding
    constraint is the advection limiter transients, probe r4/006)."""
    from hnanosolver_tpu.core import coords as C

    r_t = radius_vox // C.LEAF
    h_t = height_vox // C.LEAF
    cx, cz = cx_vox // C.LEAF, cz_vox // C.LEAF
    tiles = []
    for y in range(h_t):
        rr = r_t * (0.6 + 0.4 * y / max(h_t - 1, 1))
        for x in range(cx - r_t, cx + r_t + 1):
            for z in range(cz - r_t, cz + r_t + 1):
                if (x - cx) ** 2 + (z - cz) ** 2 <= rr * rr:
                    tiles.append((x, y, z))
    return np.array(tiles, np.int32)


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
    voxels = int(topo.num_voxels)
    print(f"domain: {int(topo.n_active)} tiles = {voxels / 1e6:.1f} M voxels "
          f"(capacity {int(topo.capacity)})", flush=True)

    cfg = PlumeConfig(center=(512.0, 96.0, 512.0), radius=80.0,
                      velocity_jet=8.0)
    p_mg = SolverParams(dt=1.0 / 24.0, voxel_size=0.5, pressure_solver="mg",
                        iterations=2, mg_levels=3)
    p_rb = SolverParams(dt=1.0 / 24.0, voxel_size=0.5, iterations=50)
    hier = hierarchy_for(topo, p_mg)
    print(f"hierarchy tiles/level: {[int(l.topo.n_active) for l in hier]}",
          flush=True)

    # every call donates its input: ONE evolving state threads the whole job
    chain_mg = functools.partial(
        jax.jit, static_argnames=("params", "cfg"), donate_argnums=(1,)
    )(lambda t, s, k, params, cfg, h: jax.lax.fori_loop(
        0, k, lambda _, x: _plume_step(t, x, params, cfg, h), s))

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    st = zeros_state(topo)
    t0 = time.perf_counter()
    st = chain_mg(topo, st, jnp.asarray(2), p_mg, cfg, hier)
    pull(st)
    print(f"develop(2 MG steps incl. compile): {time.perf_counter() - t0:.1f} s",
          flush=True)

    # INTERLEAVED measurement (MG and RBGS alternate within each round) so
    # the MG/RBGS ratio is a same-window quantity — the tunneled chip's
    # congestion drifts on the ~10-minute scale (NOTES fact 25), and the
    # first sequential attempt put the two configs ~15 min apart.
    cases = {"mg": (p_mg, hier), "rbgs": (p_rb, ())}
    for name, (params, hierarchy) in cases.items():  # compile + warm BOTH
        t0 = time.perf_counter()
        st = chain_mg(topo, st, jnp.asarray(1), params, cfg, hierarchy)
        pull(st)
        print(f"warm {name}: {time.perf_counter() - t0:.1f} s "
              "(incl. compile)", flush=True)

    def sample(params, hierarchy, st, k_lo=1, k_hi=3):
        ts = []
        for k in (k_lo, k_hi):
            t0 = time.perf_counter()
            st = chain_mg(topo, st, jnp.asarray(k), params, cfg, hierarchy)
            pull(st)
            ts.append(time.perf_counter() - t0)
        slope = (ts[1] - ts[0]) / (k_hi - k_lo)
        # Congestion noise at this scale (60-90 s calls) can invert the
        # chain pair; a non-positive slope is meaningless — fall back to
        # the long chain's mean step time, which upper-bounds the true
        # step (it still contains the fixed dispatch overhead once).
        est = slope if slope > 0 else ts[1] / k_hi
        return est, tuple(ts), st

    slopes = {"mg": [], "rbgs": []}
    for r in range(3):
        for name, (params, hierarchy) in cases.items():
            s, raw, st = sample(params, hierarchy, st)
            slopes[name].append(s)
            print(f"round {r} {name}: {s * 1e3:.1f} ms raw {raw}",
                  flush=True)
    t_mg, t_rb = min(slopes["mg"]), min(slopes["rbgs"])

    # Residual metric: PROJECT-ONLY on the developed velocity (div before
    # the solve vs div after gradient subtraction). A full-step before/after
    # comparison is meaningless — sourcing + advection re-introduce
    # divergence after the projection (the first run of this script
    # reported rmax_after > div_before for exactly that reason).
    from hnanosolver_tpu.ops.multigrid import solve_pressure_mg
    from hnanosolver_tpu.ops.pressure import solve_pressure
    from hnanosolver_tpu.ops.stencil import subtract_pressure_gradient

    @functools.partial(jax.jit, static_argnames=("params",))
    def project_resid(vel, params, hierarchy):
        inv_dx = params.inv_voxel_size
        div = divergence(topo, vel, inv_dx)
        d0 = jnp.max(jnp.abs(div))
        if params.pressure_solver == "mg":
            p = solve_pressure_mg(
                topo, list(hierarchy), div, params.iterations,
                params.voxel_size, params.omega, tol=params.mg_tol,
                n_pre=params.mg_pre, n_post=params.mg_post,
                n_coarsest=params.mg_coarsest)
        else:
            p = solve_pressure(topo, div, params.iterations,
                               params.voxel_size, params.omega,
                               halo_lag=params.effective_halo_lag)
        out = subtract_pressure_gradient(topo, vel, p, inv_dx)
        return d0, jnp.max(jnp.abs(divergence(topo, out, inv_dx)))

    d0_mg, r_mg = (float(x) for x in project_resid(st.velocity, p_mg, hier))
    d0_rb, r_rb = (float(x) for x in project_resid(st.velocity, p_rb, ()))
    for nm, t, d0, rm in (("MG(3lvl, 2 V-cycles)", t_mg, d0_mg, r_mg),
                          ("RBGS(50, lag-5)", t_rb, d0_rb, r_rb)):
        print(f"{nm}: step {t * 1e3:.1f} ms ({voxels / t / 1e6:.1f} M vox/s)"
              f"  div_before {d0:.3f} rmax_after {rm:.3f}", flush=True)

    print(json.dumps({
        "config": "baseline-5-1024^3-single-chip",
        "tiles": int(topo.n_active), "voxels": voxels,
        "mg_step_ms": round(t_mg * 1e3, 1), "mg_div0": round(d0_mg, 3),
        "mg_rmax": round(r_mg, 3),
        "mg_mvoxps": round(voxels / t_mg / 1e6, 1),
        "rbgs_step_ms": round(t_rb * 1e3, 1), "rbgs_div0": round(d0_rb, 3),
        "rbgs_rmax": round(r_rb, 3),
        "rbgs_mvoxps": round(voxels / t_rb / 1e6, 1),
    }), flush=True)


main()
