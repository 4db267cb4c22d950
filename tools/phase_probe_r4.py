"""Round-4 phase probe: ONE-window interleaved timings of the step and its
three hot phases on the bench domain, plus a chain-linearity check.

Everything is measured as chain slopes (k_lo vs k_hi dependent device
chains) and INTERLEAVED A/B/C/... so only same-window ratios are read.
The linearity check (slope 2->12 vs 12->22 on the full step) separates
genuine device time from any per-call quantization the tunnel might add.

Run: python tools/tpu_submit.py 0NN_phase tools/phase_probe_r4.py 2400
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
    T = int(topo.capacity)
    print(f"domain: {int(topo.n_active)} tiles, capacity {T}", flush=True)

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
        ("advect_scalars(5f)", chain_adv_scal, scal),
        ("advect_velocity", chain_adv_vel, state.velocity),
        ("pressure50_lag5", chain_pressure, div0),
        ("div+subgrad", chain_stencils, state.velocity),
    ]

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    for name, fn, arg in cases:  # compile everything first
        pull(fn(arg, jnp.asarray(2)))
        print(f"compiled {name}", flush=True)

    def timed(fn, arg, k, reps=3):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            pull(fn(arg, jnp.asarray(k)))
            b = min(b, time.perf_counter() - t0)
        return b

    # interleaved rounds: each case measured lo/hi back-to-back per round
    results = {name: [] for name, _, _ in cases}
    for r in range(3):
        for name, fn, arg in cases:
            lo = timed(fn, arg, 2)
            hi = timed(fn, arg, 8)
            results[name].append((hi - lo) / 6.0)
        print(f"round {r}: " + "  ".join(
            f"{n}={results[n][-1] * 1e3:.2f}ms" for n, _, _ in cases),
            flush=True)

    print("best-of-rounds (ms): " + "  ".join(
        f"{n}={min(v) * 1e3:.2f}" for n, v in results.items()), flush=True)

    # linearity: does the full step's slope depend on the chain span?
    s1 = (timed(chain_step, state, 12) - timed(chain_step, state, 2)) / 10.0
    s2 = (timed(chain_step, state, 22) - timed(chain_step, state, 12)) / 10.0
    print(f"linearity: slope(2->12)={s1 * 1e3:.2f}ms "
          f"slope(12->22)={s2 * 1e3:.2f}ms", flush=True)


main()
