"""BASELINE config 5 at its actual scale: a 1024^3-class sparse plume on ONE
v5e chip (~260k tiles, ~133 M active voxels), full solver step with multigrid
pressure, MEASURED (not HBM-budget math — VERDICT r2 missing item 2).

Run through the persistent worker:
    python tools/tpu_submit.py 0NN_scale1024 tools/scale1024.py 3600

Prints a small markdown table + one JSON line. Methodology matches
SCALE_r02.md: one window, chain-slope timing (2- vs 4-step device chains),
MG(3-level, 2 V-cycles) vs RBGS(50, lag-5) on the same developed state.
Spec: SURVEY §5.7 / BASELINE.json config 5 (1024^3 multigrid).
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def plume_envelope_1024(radius_vox=256, height_vox=1024, cx_vox=512, cz_vox=512):
    """4x-scaled version of bench.build_plume_envelope: emitter sphere +
    rising cone, ~260k tiles at these defaults."""
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
    import jax
    import jax.numpy as jnp

    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.models.plume import PlumeConfig, plume_step
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

    # develop the fields a little so advection/pressure do real work
    state = zeros_state(topo)
    t0 = time.perf_counter()
    for _ in range(2):
        state = plume_step(topo, state, p_mg, cfg, hier)
    np.asarray(state.velocity).ravel()[:1]
    print(f"develop(2 steps incl. compile): {time.perf_counter() - t0:.1f} s",
          flush=True)

    def chain_fn(params, hierarchy):
        @jax.jit
        def chain(s, k):
            return jax.lax.fori_loop(
                0, k, lambda _, x: plume_step(topo, x, params, cfg, hierarchy),
                s)
        return chain

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    def measure(params, hierarchy, k_lo=2, k_hi=4, repeats=3):
        ch = chain_fn(params, hierarchy)
        klo, khi = jnp.asarray(k_lo), jnp.asarray(k_hi)
        pull(ch(state, klo))  # compile + warm
        pull(ch(state, khi))

        def best(k):
            b = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                pull(ch(state, k))
                b = min(b, time.perf_counter() - t0)
            return b

        lo, hi = best(klo), best(khi)
        return (hi - lo) / (k_hi - k_lo), (lo, hi)

    def residual(params, hierarchy):
        """max |div v| after one projected step from the developed state."""
        s1 = plume_step(topo, state, params, cfg, hierarchy)
        d = divergence(topo, s1.velocity, params.inv_voxel_size)
        return float(jnp.max(jnp.abs(d)))

    d0 = divergence(topo, state.velocity, p_mg.inv_voxel_size)
    div0 = float(jnp.max(jnp.abs(d0)))
    print(f"developed max|div| = {div0:.3f}", flush=True)

    t_mg, raw_mg = measure(p_mg, hier)
    r_mg = residual(p_mg, hier)
    print(f"MG(3lvl, 2 V-cycles): step {t_mg * 1e3:.1f} ms "
          f"({voxels / t_mg / 1e6:.1f} M vox/s)  rmax {r_mg:.3f} "
          f"raw {raw_mg}", flush=True)

    t_rb, raw_rb = measure(p_rb, ())
    r_rb = residual(p_rb, ())
    print(f"RBGS(50, lag-5):      step {t_rb * 1e3:.1f} ms "
          f"({voxels / t_rb / 1e6:.1f} M vox/s)  rmax {r_rb:.3f} "
          f"raw {raw_rb}", flush=True)

    print(json.dumps({
        "config": "baseline-5-1024^3-single-chip",
        "tiles": int(topo.n_active), "voxels": voxels,
        "div0": round(div0, 3),
        "mg_step_ms": round(t_mg * 1e3, 1), "mg_rmax": round(r_mg, 3),
        "mg_mvoxps": round(voxels / t_mg / 1e6, 1),
        "rbgs_step_ms": round(t_rb * 1e3, 1), "rbgs_rmax": round(r_rb, 3),
        "rbgs_mvoxps": round(voxels / t_rb / 1e6, 1),
    }), flush=True)


main()
