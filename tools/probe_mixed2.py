"""Decompose the MIXED-band (1.9 <= CFL < 3.9) scalar advection pass at
bench size — the band the bench chain's later steps run in (CFL ramps
1.10 -> 3.10). Interleaved long chains in one window:

  scal_full — the whole advect_scalars_fused (5 fields)
  back16    — the narrow back kernel alone (dual table, mode="back")
  fwd24     — the wide forward kernel alone (nf=5 table, mode="fwd")
  dual_tbl  — the XLA dual build (nf=8)
  t27_tbl   — the 27-table build (nf=5)
  vel_full  — advect_velocity for reference

Velocity amplitude is CLIPPED so max CFL is exactly 2.6 (mixed band) —
probe 124 used unclipped normals whose tails put the dispatch in the
full-wide band and invalidated the A/B.

Run: python tools/tpu_submit.py 126_mixed2 tools/probe_mixed2.py 2400
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
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.ops import advection as adv
    from hnanosolver_tpu.ops import pallas_bfecc as pb

    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    T = int(topo.capacity)
    rng = np.random.default_rng(0)
    print(f"domain {int(topo.n_active)} tiles cap {T}", flush=True)

    dt, inv_dx = 1.0 / 24.0, 2.0
    amp = 2.6 / (dt * inv_dx)
    vel = jnp.clip(
        jnp.asarray(rng.normal(size=(3, T, 512)).astype(np.float32)) * (amp / 2.0),
        -amp, amp)
    cfl = float(jnp.max(jnp.abs(vel))) * dt * inv_dx
    print(f"max CFL = {cfl:.2f} (mixed band)", flush=True)
    scal = {k: jnp.asarray(rng.normal(size=(T, 512)).astype(np.float32))
            for k in ("density", "temperature", "fuel", "waste", "flame")}
    fields = [vel[0], vel[1], vel[2]] + [scal[k] for k in scal]
    sdt = dt * inv_dx
    dx = jnp.clip(-vel[0] * sdt, -adv.DISP_LIMIT, adv.DISP_LIMIT)
    dy = jnp.clip(-vel[1] * sdt, -adv.DISP_LIMIT, adv.DISP_LIMIT)
    dz = jnp.clip(-vel[2] * sdt, -adv.DISP_LIMIT, adv.DISP_LIMIT)

    def dep(fs, t):
        return [fs[0] + t * 1e-30] + list(fs[1:])

    def chain_of(fn, is_dict=False):
        @jax.jit
        def chain(a, k):
            def body(_, a):
                return fn(a)
            return jax.lax.fori_loop(0, k, body, a)
        return chain

    def scal_full(sc):
        return adv.advect_scalars_fused(topo, vel, sc, dt, inv_dx,
                                        fast="balanced")

    def vel_full(v):
        return adv.advect_velocity(topo, v, dt, inv_dx, fast="balanced")

    def back16(fs):
        outs = pb.bfecc_sample_fused(topo, list(fs), dx, dy, dz, sdt, 0,
                                     None, "balanced", win=16, mode="back")[0]
        return dep(fs, outs[0][0, 0])

    def fwd24(fs):
        sub = list(fs[3:])
        outs = pb.bfecc_sample_fused(topo, sub, dx, dy, dz, sdt, 0,
                                     None, "balanced", win=24, mode="fwd")[0]
        return dep(fs, outs[0][0, 0])

    def dual_tbl(fs):
        t = pb.build_table_dual(topo, list(fs))
        return dep(fs, t[0, 0, 0, 0])

    def t27_tbl(fs):
        t = pb.build_table(topo, list(fs[3:]))
        return dep(fs, t[0, 0, 0, 0])

    cases = [
        ("scal_full", chain_of(scal_full), scal),
        ("back16", chain_of(back16), fields),
        ("fwd24", chain_of(fwd24), fields),
        ("dual_tbl", chain_of(dual_tbl), fields),
        ("t27_tbl", chain_of(t27_tbl), fields),
        ("vel_full", chain_of(vel_full), vel),
    ]

    def pull(o):
        t = o["density"] if isinstance(o, dict) else (
            o[0] if isinstance(o, list) else o)
        np.asarray(t).ravel()[:1]

    K_LO, K_HI = jnp.asarray(2), jnp.asarray(32)
    span = 30.0
    for nm, c, a in cases:
        pull(c(a, K_LO))
        pull(c(a, K_HI))
        print(f"compiled {nm}", flush=True)

    mins = {nm: [float("inf"), float("inf")] for nm, _, _ in cases}
    for r in range(6):
        if r:
            time.sleep(10)
        msg = []
        for nm, c, a in cases:
            lo = hi = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                pull(c(a, K_LO))
                lo = min(lo, time.perf_counter() - t0)
            for _ in range(3):
                t0 = time.perf_counter()
                pull(c(a, K_HI))
                hi = min(hi, time.perf_counter() - t0)
            mins[nm][0] = min(mins[nm][0], lo)
            mins[nm][1] = min(mins[nm][1], hi)
            msg.append(f"{nm}={(hi - lo) / span * 1e3:.2f}")
        print(f"round {r}: " + "  ".join(msg) + " ms", flush=True)

    print("anchor (global-min slope, ms): " + "  ".join(
        f"{nm}={(mins[nm][1] - mins[nm][0]) / span * 1e3:.2f}"
        for nm, _, _ in cases), flush=True)


main()
