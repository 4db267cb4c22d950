"""MG convergence + cost at 1024^3 (VERDICT r3 item 2): deeper hierarchies,
adaptive cycles, and a component decomposition to find where the 14.3 s MG
step actually went (dispatch? transfers? congestion artifact?).

Project-only probe (no advection): div from a synthetic multi-scale
velocity on the 253k-tile SCALE domain; all configs interleaved per round.

Run: python tools/tpu_submit.py 103_mg1024 tools/probe_mg1024.py 3600
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
    import functools

    import jax
    import jax.numpy as jnp

    from hnanosolver_tpu.core.layout import positions_flat
    from hnanosolver_tpu.core.topology import active_mask, build_topology
    from hnanosolver_tpu.ops import pressure as prs
    from hnanosolver_tpu.ops.multigrid import (
        build_hierarchy,
        prolong_trilinear,
        restrict,
        solve_pressure_mg,
    )

    tiles = plume_envelope_1024()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    print(f"domain {int(topo.n_active)} tiles cap {int(topo.capacity)}",
          flush=True)

    hier5 = build_hierarchy(topo, 5)
    print("hierarchy tiles:",
          [int(l.topo.n_active) for l in hier5], flush=True)

    dx = 0.5
    omega = 1.0

    # synthetic multi-scale velocity -> divergence with both a global mode
    # (the killer at this scale) and tile-scale content
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
    print(f"div max {d0:.3f}", flush=True)

    def mg_fn(levels, cycles, pre=2, post=2, coarsest=24):
        h = list(hier5[:levels])

        @jax.jit
        def f(d, k):
            def body(_, p):
                return solve_pressure_mg(
                    topo, h, d + 0.0 * p, cycles, dx, omega,
                    n_pre=pre, n_post=post, n_coarsest=coarsest)

            return jax.lax.fori_loop(0, k, body, jnp.zeros_like(d))

        return f

    def rbgs_fn(iters, lag):
        @jax.jit
        def f(d, k):
            def body(_, p):
                return prs.solve_pressure(topo, d + 0.0 * p, iters, dx,
                                          omega, halo_lag=lag)

            return jax.lax.fori_loop(0, k, body, jnp.zeros_like(d))

        return f

    cases = {
        "rbgs50_lag5": rbgs_fn(50, 5),
        "mg5_2cyc": mg_fn(5, 2),
        "mg5_4cyc": mg_fn(5, 4),
        "mg5_6cyc": mg_fn(5, 6),
        "mg5_4cyc_c48": mg_fn(5, 4, coarsest=48),
    }

    # component pieces at the fine level
    l0 = hier5[0]

    @jax.jit
    def piece_smooth4(d, k):
        def body(_, p):
            return prs.solve_pressure(topo, d + 0.0 * p, 4, dx, omega)

        return jax.lax.fori_loop(0, k, body, jnp.zeros_like(d))

    @jax.jit
    def piece_transfer(d, k):
        def body(_, p):
            r = prs.residual(topo, p, d, dx)  # p carries the dependency
            rc = restrict(l0, r) * l0.mask
            return prolong_trilinear(l0, rc)

        return jax.lax.fori_loop(0, k, body, jnp.zeros_like(d))

    # coarse-only sub-cycle: everything BELOW the fine level (L1 down)
    hsub = list(hier5[1:])
    l1t = hier5[0].topo

    @jax.jit
    def piece_coarse(dc, k):
        def body(_, p):
            return solve_pressure_mg(l1t, hsub, dc + 0.0 * p, 1, dx * 2,
                                     omega, n_pre=2, n_post=2, n_coarsest=24)

        return jax.lax.fori_loop(0, k, body, jnp.zeros_like(dc))

    divc = restrict(hier5[0], div) * hier5[0].mask
    jax.block_until_ready(divc)

    pieces = {
        "fine_smooth4": (piece_smooth4, div),
        "fine_resid+restrict+prolong": (piece_transfer, div),
        "coarse_subcycle_L1down": (piece_coarse, divc),
    }

    def pull(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]

    # compile + warm everything, record residuals once
    resid = {}
    for name, f in cases.items():
        t0 = time.perf_counter()
        p = f(div, jnp.asarray(1))
        pull(p)
        r = float(jnp.max(jnp.abs(prs.residual(topo, p, div, dx))))
        resid[name] = r
        print(f"warm {name}: {time.perf_counter() - t0:.1f} s "
              f"rmax {r:.3f} ({r / d0:.3f}x of div {d0:.3f})", flush=True)
    for name, (f, arg) in pieces.items():
        t0 = time.perf_counter()
        pull(f(arg, jnp.asarray(1)))
        print(f"warm piece {name}: {time.perf_counter() - t0:.1f} s",
              flush=True)

    def sample(f, arg, k_lo=1, k_hi=3):
        ts = []
        for k in (k_lo, k_hi):
            t0 = time.perf_counter()
            pull(f(arg, jnp.asarray(k)))
            ts.append(time.perf_counter() - t0)
        s = (ts[1] - ts[0]) / (k_hi - k_lo)
        return (s if s > 0 else ts[1] / k_hi), ts

    allf = {**cases, **{k: v[0] for k, v in pieces.items()}}
    argof = {k: (pieces[k][1] if k in pieces else div) for k in allf}
    best = {k: float("inf") for k in allf}
    for r in range(3):
        for name, f in allf.items():
            s, raw = sample(f, argof[name])
            best[name] = min(best[name], s)
            print(f"round {r} {name}: {s * 1e3:.1f} ms "
                  f"raw {[round(t, 2) for t in raw]}", flush=True)

    out_d = {"div0": d0,
             **{f"t_{k}_ms": round(v * 1e3, 1) for k, v in best.items()},
             **{f"r_{k}": round(resid[k], 3) for k in cases}}
    print(json.dumps(out_d), flush=True)
    out(out_d)  # noqa: F821


main()
