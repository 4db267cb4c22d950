"""SCALE_r05 retry: window-SNIFFING 1024^3 measurement. Job 141 spent 78
minutes in a ~30x-congested window (single steps 70-127 s vs the r3 quiet
2.67 s) and produced useless slopes. This probe samples a single cheap
step as a congestion sniffer and only spends the full 1-vs-3 chain
measurement when the window is quiet-class (sniff <= SNIFF_QUIET_S);
otherwise it sleeps and retries. Exits after QUIET_ROUNDS successful
rounds or when the time budget runs out — every attempt is recorded.

Run: python tools/tpu_submit.py 143_scaleq tools/scale1024_r5q.py 9000
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
SNIFF_QUIET_S = 6.0  # 1-step RBGS chain incl ~0.5-1 s pull overhead;
# r3 quiet single step was 2.67 s
SNIFF_GAP_S = 90.0
QUIET_ROUNDS = 2
BUDGET_S = 6600.0
_T0 = time.perf_counter()


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.models.plume import PlumeConfig, _plume_step
    from hnanosolver_tpu.ops.multigrid import hierarchy_for

    sys.path.insert(0, "/root/repo/tools")
    from envelopes import plume_envelope_1024

    tiles = plume_envelope_1024(RADIUS, 1024, 512, 512)
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
    print(f"develop+compile rbgs: {time.perf_counter() - t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    st = chain(topo, st, jnp.asarray(1), p_mg, cfg, hier)
    pull(st)
    print(f"warm+compile mg: {time.perf_counter() - t0:.1f} s", flush=True)

    def left():
        return BUDGET_S - (time.perf_counter() - _T0)

    sniffs = []
    rows = []
    best = {"mg": float("inf"), "rbgs": float("inf")}
    best_single = {"mg": float("inf"), "rbgs": float("inf")}
    quiet_done = 0
    while left() > 120.0 and quiet_done < QUIET_ROUNDS:
        t0 = time.perf_counter()
        st = chain(topo, st, jnp.asarray(1), p_rb, cfg, ())
        pull(st)
        sniff = time.perf_counter() - t0
        sniffs.append(round(sniff, 2))
        best_single["rbgs"] = min(best_single["rbgs"], sniff)
        if sniff > SNIFF_QUIET_S:
            print(f"sniff {sniff:.1f}s congested "
                  f"({left():.0f}s left)", flush=True)
            if left() > SNIFF_GAP_S + 120.0:
                time.sleep(SNIFF_GAP_S)
            continue
        row = {"sniff_s": round(sniff, 2)}
        for name, (params, hierarchy) in (("mg", (p_mg, hier)),
                                          ("rbgs", (p_rb, ()))):
            ts = []
            for k in (1, 3):
                t0 = time.perf_counter()
                st = chain(topo, st, jnp.asarray(k), params, cfg, hierarchy)
                pull(st)
                ts.append(time.perf_counter() - t0)
            s = (ts[1] - ts[0]) / 2
            est = s if s > 0 else ts[1] / 3
            best[name] = min(best[name], est)
            best_single[name] = min(best_single[name], ts[0])
            row[name] = [round(t, 3) for t in ts]
            row[name + "_ms"] = round(est * 1e3, 0)
        rows.append(row)
        quiet_done += 1
        print(f"QUIET round: {row}", flush=True)

    res = {
        "config": "baseline-5-1024^3-single-chip-r5-sniffed",
        "radius_vox": RADIUS, "tiles": int(topo.n_active), "voxels": voxels,
        "sniff_quiet_s": SNIFF_QUIET_S, "sniffs_s": sniffs,
        "quiet_rounds": rows,
        "best_single_step_s": {k: (round(v, 3) if v < 1e9 else None)
                               for k, v in best_single.items()},
        "mg_step_ms": (round(best["mg"] * 1e3, 1)
                       if best["mg"] < 1e9 else None),
        "rbgs_step_ms": (round(best["rbgs"] * 1e3, 1)
                         if best["rbgs"] < 1e9 else None),
        "mg_mvoxps": (round(voxels / best["mg"] / 1e6, 1)
                      if best["mg"] < 1e9 else None),
    }
    print(json.dumps(res), flush=True)
    out(res)  # noqa: F821


main()
