"""Interleaved long-chain A/B of the full advection passes with the
on-chip dual-combine kernel ON vs OFF, at bench size in the mixed CFL
band (the bench steady state). Long chains (2 vs 32) + min-of-reps +
several rounds: the only estimator with signal under heavy congestion
(NOTES r4 fact 46).

Run: python tools/tpu_submit.py 124_combine2 tools/probe_combine2.py 2400
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
    from hnanosolver_tpu.core.topology import build_topology, ensure_dual_local
    from hnanosolver_tpu.ops import advection as adv
    from hnanosolver_tpu.ops import pallas_bfecc as pb

    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = ensure_dual_local(
        build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512))
    T = int(topo.capacity)
    rng = np.random.default_rng(0)
    print(f"domain {int(topo.n_active)} tiles cap {T}", flush=True)

    # mixed-band velocity: dt*|u|/dx peaks ~2.6 (bench steady state)
    dt, inv_dx = 1.0 / 24.0, 2.0
    vel = jnp.asarray(
        rng.normal(size=(3, T, 512)).astype(np.float32)) * (2.6 / (dt * inv_dx) / 3.0)
    scal = {k: jnp.asarray(rng.normal(size=(T, 512)).astype(np.float32))
            for k in ("density", "temperature", "fuel", "waste", "flame")}

    def make_chains(flag):
        pb.COMBINE_TBL = flag

        @jax.jit
        def cs(sc, k):
            def body(_, sc):
                return adv.advect_scalars_fused(
                    topo, vel, sc, dt, inv_dx, fast="balanced")
            return jax.lax.fori_loop(0, k, body, sc)

        @jax.jit
        def cv(v, k):
            return jax.lax.fori_loop(
                0, k,
                lambda _, v: adv.advect_velocity(topo, v, dt, inv_dx,
                                                 fast="balanced"), v)

        # force the traces NOW while the flag is set
        jax.block_until_ready(cs(scal, jnp.asarray(2))["density"])
        jax.block_until_ready(cv(vel, jnp.asarray(2)))
        return cs, cv

    cs_off, cv_off = make_chains(False)
    cs_on, cv_on = make_chains(True)
    pb.COMBINE_TBL = None
    print("compiled", flush=True)

    # parity cross-check on-chip (cheap, noise-immune)
    a = cs_off(scal, jnp.asarray(2))
    b = cs_on(scal, jnp.asarray(2))
    d = max(float(jnp.max(jnp.abs(a[k] - b[k]))) for k in a)
    print(f"scalar-pass parity max|d| = {d:.3e}", flush=True)

    def pull(o):
        t = o["density"] if isinstance(o, dict) else o
        np.asarray(t).ravel()[:1]

    K_LO, K_HI = jnp.asarray(2), jnp.asarray(32)
    span = 30.0
    cases = [("scal_off", cs_off, scal), ("scal_on", cs_on, scal),
             ("vel_off", cv_off, vel), ("vel_on", cv_on, vel)]
    for _, fn, arg in cases:
        pull(fn(arg, K_HI))  # warm hi trace

    mins = {nm: [float("inf"), float("inf")] for nm, _, _ in cases}
    for r in range(6):
        if r:
            time.sleep(12)
        msg = []
        for nm, fn, arg in cases:
            lo = hi = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                pull(fn(arg, K_LO))
                lo = min(lo, time.perf_counter() - t0)
            for _ in range(3):
                t0 = time.perf_counter()
                pull(fn(arg, K_HI))
                hi = min(hi, time.perf_counter() - t0)
            mins[nm][0] = min(mins[nm][0], lo)
            mins[nm][1] = min(mins[nm][1], hi)
            msg.append(f"{nm}={(hi - lo) / span * 1e3:.2f}")
        print(f"round {r}: " + "  ".join(msg) + " ms", flush=True)

    print("anchor (global-min slope, ms): " + "  ".join(
        f"{nm}={(mins[nm][1] - mins[nm][0]) / span * 1e3:.2f}"
        for nm, _, _ in cases), flush=True)


main()
