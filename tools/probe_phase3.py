"""Round-4 phase probe, bench-grade estimator: min-of-4 repeats per chain
length, 2- vs 12-step slope, best of 8 interleaved rounds per case. The
r4/100 run with 3 reps x (2 vs 8) chains was pure tunnel jitter (negative
slopes); this matches bench.py's estimator instead.

Run: python tools/tpu_submit.py 101_phase3 tools/probe_phase3.py 3000
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
    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.models.plume import PlumeConfig, plume_step
    from hnanosolver_tpu.ops import advection as adv
    from hnanosolver_tpu.ops import pressure as prs
    from hnanosolver_tpu.ops import stencil as stn

    params = SolverParams(dt=1.0 / 24.0, iterations=50, voxel_size=0.5)
    cfg = PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    state = zeros_state(topo)
    for _ in range(2):
        state = plume_step(topo, state, params, cfg)
    jax.block_until_ready(state.velocity)
    print(f"domain: {int(topo.n_active)} tiles, cap {int(topo.capacity)}",
          flush=True)

    inv_dx = params.inv_voxel_size
    dt = params.dt
    scal = {k: v for k, v in state.scalars.items()}

    @jax.jit
    def chain_step(s, k):
        return jax.lax.fori_loop(
            0, k, lambda _, x: plume_step(topo, x, params, cfg), s)

    @jax.jit
    def chain_adv_scal(sc, k):
        def body(_, sc):
            return adv.advect_scalars_fused(
                topo, state.velocity, sc, dt, inv_dx, fast="balanced")
        return jax.lax.fori_loop(0, k, body, sc)

    @jax.jit
    def chain_adv_vel(v, k):
        return jax.lax.fori_loop(
            0, k,
            lambda _, v: adv.advect_velocity(topo, v, dt, inv_dx,
                                             fast="balanced"),
            v)

    @jax.jit
    def chain_pressure(d, k):
        def body(_, d):
            return prs.solve_pressure(
                topo, d, params.iterations, params.voxel_size, params.omega,
                halo_lag=params.effective_halo_lag)
        return jax.lax.fori_loop(0, k, body, d)

    @jax.jit
    def chain_stencils(v, k):
        def body(_, v):
            d = stn.divergence(topo, v, inv_dx)
            return stn.subtract_pressure_gradient(topo, v, d, inv_dx)
        return jax.lax.fori_loop(0, k, body, v)

    div0 = stn.divergence(topo, state.velocity, inv_dx)

    cases = [
        ("full_step", chain_step, state),
        ("adv_scal5", chain_adv_scal, scal),
        ("adv_vel", chain_adv_vel, state.velocity),
        ("press50", chain_pressure, div0),
        ("div+sub", chain_stencils, state.velocity),
    ]

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    for name, fn, arg in cases:  # compile everything first
        pull(fn(arg, jnp.asarray(2)))
        print(f"compiled {name}", flush=True)

    K_LO, K_HI, REPS, ROUNDS = 2, 12, 4, 8

    def best_t(fn, arg, k):
        b = float("inf")
        kk = jnp.asarray(k)
        for _ in range(REPS):
            t0 = time.perf_counter()
            pull(fn(arg, kk))
            b = min(b, time.perf_counter() - t0)
        return b

    best = {name: float("inf") for name, _, _ in cases}
    for r in range(ROUNDS):
        line = []
        for name, fn, arg in cases:
            t_lo = best_t(fn, arg, K_LO)
            t_hi = best_t(fn, arg, K_HI)
            s = (t_hi - t_lo) / (K_HI - K_LO)
            if s <= 0:
                s = t_hi / K_HI
            best[name] = min(best[name], s)
            line.append(f"{name}={s * 1e3:.2f}")
        print(f"round {r}: " + "  ".join(line), flush=True)
        time.sleep(20)

    msg = "best (ms): " + "  ".join(
        f"{n}={v * 1e3:.2f}" for n, v in best.items())
    print(msg, flush=True)
    out({k: round(v * 1e3, 2) for k, v in best.items()})  # noqa: F821


main()
