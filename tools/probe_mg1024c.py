"""MG-at-1024^3 round 3: the 'pair' smoothing mode (lagged kernel, halo per
red+black pair) vs probe 108's winners — residual (congestion-immune) and
interleaved wall-clock. Goal: FMG+cycles at residual ratio <= 0.1 with
wall-clock CLEARLY under RBGS-50(lag5).

Run: python tools/tpu_submit.py 109_mg1024c tools/probe_mg1024c.py 9000
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


def plume_envelope_1024(radius_vox=248, height_vox=1024, cx=512, cz=512):
    from hnanosolver_tpu.core import coords as C

    r_t = radius_vox // C.LEAF
    h_t = height_vox // C.LEAF
    cxt, czt = cx // C.LEAF, cz // C.LEAF
    tiles = []
    for y in range(h_t):
        rr = r_t * (0.6 + 0.4 * y / max(h_t - 1, 1))
        for x in range(cxt - r_t, cxt + r_t + 1):
            for z in range(czt - r_t, czt + r_t + 1):
                if (x - cxt) ** 2 + (z - czt) ** 2 <= rr * rr:
                    tiles.append((x, y, z))
    return np.array(tiles, np.int32)


def main():
    import jax
    import jax.numpy as jnp

    from hnanosolver_tpu.core.layout import positions_flat
    from hnanosolver_tpu.core.topology import active_mask, build_topology
    from hnanosolver_tpu.ops import pressure as prs
    from hnanosolver_tpu.ops.multigrid import build_hierarchy, solve_pressure_mg

    tiles = plume_envelope_1024()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    print(f"domain {int(topo.n_active)} tiles", flush=True)
    hier5 = build_hierarchy(topo, 5)
    dx, omega = 0.5, 1.0

    @jax.jit
    def make_div():
        px, py, pz = (p.astype(jnp.float32) for p in positions_flat(topo))
        m = active_mask(topo)[:, None]
        r2 = ((px - 512.0) ** 2 + (pz - 512.0) ** 2) / (200.0**2)
        vy = 6.0 * jnp.exp(-r2) * (py / 1024.0)
        vx = 0.8 * jnp.sin(px * 0.05) * jnp.cos(py * 0.031)
        vz = 0.8 * jnp.sin(pz * 0.043) * jnp.cos(px * 0.027)
        vel = jnp.stack([vx, vy, vz]) * m[None]
        from hnanosolver_tpu.ops.stencil import divergence

        return divergence(topo, vel, 1.0 / dx)

    div = make_div()
    jax.block_until_ready(div)
    d0 = float(jnp.max(jnp.abs(div)))
    d0l2 = float(jnp.sqrt(jnp.sum(div * div)))
    print(f"div max {d0:.3f}", flush=True)

    def mg_fn(cycles, mode):
        @jax.jit
        def f(d):
            return solve_pressure_mg(
                topo, list(hier5), d, cycles, dx, omega,
                n_pre=2, n_post=2, n_coarsest=24, fmg=True, smooth_lag=mode)
        return f

    @jax.jit
    def rbgs(d):
        return prs.solve_pressure(topo, d, 50, dx, omega, halo_lag=5)

    cases = {
        "rbgs50_lag5": rbgs,
        "mg5_fmg2_pair": mg_fn(2, "pair"),
        "mg5_fmg3_pair": mg_fn(3, "pair"),
        "mg5_fmg3_nolag": mg_fn(3, False),
    }

    def pull(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]

    res = {}
    for name, f in cases.items():
        t0 = time.perf_counter()
        p = f(div)
        pull(p)
        warm = time.perf_counter() - t0
        r = prs.residual(topo, p, div, dx)
        rmax = float(jnp.max(jnp.abs(r)))
        rl2 = float(jnp.sqrt(jnp.sum(r * r)))
        res[name] = (rmax / d0, rl2 / d0l2)
        print(f"{name}: warm {warm:.0f}s ratio {rmax / d0:.4f} "
              f"l2 {rl2 / d0l2:.4f}", flush=True)

    best = {k: float("inf") for k in cases}
    for rnd in range(4):
        for name, f in cases.items():
            t0 = time.perf_counter()
            pull(f(div))
            best[name] = min(best[name], time.perf_counter() - t0)
        print(f"round {rnd}: " + "  ".join(
            f"{k}={best[k]:.2f}s" for k in cases), flush=True)
        time.sleep(10)

    out_d = {"div0": d0,
             **{f"t_{k}_s": round(v, 2) for k, v in best.items()},
             **{f"r_{k}": round(res[k][0], 4) for k in cases},
             **{f"l2_{k}": round(res[k][1], 4) for k in cases}}
    print(json.dumps(out_d), flush=True)
    out(out_d)  # noqa: F821


main()
