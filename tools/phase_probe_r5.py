"""Round-5 phase probe: component times AT THE BENCH OPERATING POINT.

The r4 phase probe developed the state only 2 steps, so every component ran
the low-CFL narrow band — but the bench chain ramps CFL to ~3.1 where the
scalar/velocity passes run the MIXED band (back16 + dual build + fwd
dispatch). Its component sums (~12-14 ms) therefore never matched the
recorded full step (~25 ms). This probe develops 10 steps first (CFL ~3,
mixed band — probe 127) and then times, interleaved in one window:

  full_step | advect_scalars(5f) | advect_velocity | pressure50_lag5 |
  div+subgrad | vorticity | dual_build(8f)

Run: python tools/tpu_submit.py 135_phase5 tools/phase_probe_r5.py 2700
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
    from hnanosolver_tpu.ops import pallas_bfecc as pb
    from hnanosolver_tpu.ops import pressure as prs
    from hnanosolver_tpu.ops import stencil as stn

    params = SolverParams(dt=1.0 / 24.0, iterations=50, voxel_size=0.5)
    cfg = PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    state = zeros_state(topo)

    @jax.jit
    def dev_chain(s, k):
        return jax.lax.fori_loop(
            0, k, lambda _, x: plume_step(topo, x, params, cfg), s)

    state = dev_chain(state, jnp.asarray(10))
    jax.block_until_ready(state.velocity)
    T = int(topo.capacity)
    sdt = params.dt * params.inv_voxel_size
    cfl = float(jnp.max(jnp.abs(state.velocity)) * sdt)
    print(f"domain: {int(topo.n_active)} tiles, capacity {T}, "
          f"CFL@10steps={cfl:.2f}", flush=True)

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

    @jax.jit
    def chain_vort(v, k):
        c = params.combustion

        def body(_, v):
            return stn.vorticity_confinement(
                topo, v, dt, inv_dx, c.vorticity_scale, c.factor_scale)
        return jax.lax.fori_loop(0, k, body, v)

    base8 = [state.velocity[0], state.velocity[1], state.velocity[2]] + [
        scal[k] for k in sorted(scal)]

    @jax.jit
    def chain_dual(x, k):
        # the mixed band's XLA dual-table build (8 fields), alone
        def body(_, x):
            t = pb.build_table_dual(topo, [b + x for b in base8])
            return x + jnp.reshape(t, (-1,))[0] * 1e-30
        return jax.lax.fori_loop(0, k, body, x)

    div0 = stn.divergence(topo, state.velocity, inv_dx)

    cases = [
        ("full_step", chain_step, state),
        ("adv_scal", chain_adv_scal, scal),
        ("adv_vel", chain_adv_vel, state.velocity),
        ("press50", chain_pressure, div0),
        ("div+sub", chain_stencils, state.velocity),
        ("vort", chain_vort, state.velocity),
        ("dual8", chain_dual, jnp.float32(0.0)),
    ]

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    for name, fn, arg in cases:  # compile everything first
        t0 = time.perf_counter()
        pull(fn(arg, jnp.asarray(2)))
        print(f"compiled {name} ({time.perf_counter() - t0:.0f}s)",
              flush=True)

    def timed(fn, arg, k, reps=3):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            pull(fn(arg, jnp.asarray(k)))
            b = min(b, time.perf_counter() - t0)
        return b

    results = {name: [] for name, _, _ in cases}
    for r in range(5):
        if r:
            time.sleep(15)
        pull(chain_step(state, jnp.asarray(2)))  # post-idle throwaway
        for name, fn, arg in cases:
            lo = timed(fn, arg, 2)
            hi = timed(fn, arg, 10)
            results[name].append((hi - lo) / 8.0)
        print(f"round {r}: " + "  ".join(
            f"{n}={results[n][-1] * 1e3:.2f}" for n, _, _ in cases),
            flush=True)

    best = {n: min(v) for n, v in results.items()}
    print("best-of-rounds (ms): " + "  ".join(
        f"{n}={v * 1e3:.2f}" for n, v in best.items()), flush=True)
    comp_sum = sum(v for n, v in best.items() if n not in
                   ("full_step", "dual8"))
    print(f"component sum (excl dual8) = {comp_sum * 1e3:.2f} ms vs "
          f"full_step = {best['full_step'] * 1e3:.2f} ms", flush=True)
    out({n: round(v * 1e3, 2) for n, v in best.items()})  # noqa: F821


main()
