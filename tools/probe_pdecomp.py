"""Pressure solve decomposition at bench size: how much of the RBGS-50
lagged solve is halo gathers vs sweeps, and what larger halo_lag buys
(fewer gathers) at what residual cost.

Variants (interleaved chain-slope, 1 vs 3 chained solves):
  lag5 / lag10 / lag25 / lag50  — solve_pressure_lagged at each lag
  gathers — 10x the per-block halo gather alone (lag-5's gather count)
Residuals: max |residual| after each, vs the textbook XLA path at 50.

Run: python tools/tpu_submit.py 080_pdecomp tools/probe_pdecomp.py 1500
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
    from hnanosolver_tpu.ops import pressure as prs
    from hnanosolver_tpu.ops import stencil
    from hnanosolver_tpu.ops.pallas_pressure import (
        _DIRS, solve_pressure_lagged)
    from hnanosolver_tpu.ops.shifts import d_of

    params = SolverParams(dt=1.0 / 24.0, iterations=50, voxel_size=0.5)
    cfg = PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    state = zeros_state(topo)
    for _ in range(4):
        state = plume_step(topo, state, params, cfg)
    vel = jax.block_until_ready(state.velocity)
    div = stencil.divergence(topo, vel, params.inv_voxel_size)
    div = jax.block_until_ready(div)
    T = int(topo.capacity)
    dx, omega = params.voxel_size, params.omega
    print(f"domain {int(topo.n_active)} tiles cap {T}", flush=True)

    def rmax(p):
        return float(jnp.max(jnp.abs(prs.residual(topo, p, div, dx))))

    variants = {}
    for lag in (5, 10, 25, 50):
        def mk(lag=lag):
            @jax.jit
            def run(d, k):
                def body(_, p):
                    return solve_pressure_lagged(
                        topo, d, 50, dx, omega, lag, p0=p * 0.5)
                return jax.lax.fori_loop(
                    0, k, body, jnp.zeros_like(d))
            return run
        variants[f"lag{lag}"] = mk()

    nbr6 = jnp.concatenate([topo.nbr[:, d_of(off)] for off in _DIRS])

    @jax.jit
    def gathers(d, k):
        # 10 dependent halo gathers (lag-5's count at 50 iterations)
        def body(_, p):
            f = jnp.take(p, nbr6, axis=0)
            return p + f[:T] * 1e-30
        return jax.lax.fori_loop(0, 10 * k, body, d)

    variants["gathers"] = gathers

    # residuals (each lag's endpoint quality)
    p_ref = prs.solve_pressure(topo, div, 50, dx, omega)
    print(f"residual textbook-50: {rmax(p_ref):.4f}", flush=True)
    for lag in (5, 10, 25, 50):
        p = solve_pressure_lagged(topo, div, 50, dx, omega, lag)
        print(f"residual lag{lag}-50:   {rmax(p):.4f}", flush=True)

    def pull(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]

    k1, k3 = jnp.asarray(1), jnp.asarray(3)
    for name, fn in variants.items():
        pull(fn(div, k1))
        pull(fn(div, k3))

    def best(fn, k, rep=3):
        b = float("inf")
        for _ in range(rep):
            t0 = time.perf_counter()
            pull(fn(div, k))
            b = min(b, time.perf_counter() - t0)
        return b

    for r in range(3):
        if r:
            time.sleep(10)
        line = []
        for name, fn in variants.items():
            lo, hi = best(fn, k1), best(fn, k3)
            line.append(f"{name}={(hi - lo) / 2 * 1e3:.2f}ms")
        print(f"round {r}: " + " ".join(line), flush=True)


main()
