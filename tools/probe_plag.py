"""A/B: pressure halo_lag 5 vs 10 at bench size — wall time AND residual.

halo_lag=5 (balanced default) runs 10 halo blocks for 50 iterations; each
block is one [6,T,512] XLA face gather + one Pallas launch. lag=10 halves
that. The question is whether the staler cross-tile halo costs residual:
the lag ladder is residual-matched at lag<=5 (round 2/3); this measures
lag 10 on the developed bench plume before changing the balanced default.

Run: python tools/tpu_submit.py 0NN_plag tools/probe_plag.py 1200
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
    import functools

    import jax
    import jax.numpy as jnp

    import bench
    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.models.plume import PlumeConfig, plume_step
    from hnanosolver_tpu.ops.pressure import solve_pressure
    from hnanosolver_tpu.ops.stencil import divergence, subtract_pressure_gradient

    params = SolverParams(dt=1.0 / 24.0, iterations=50, voxel_size=0.5)
    cfg = PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    state = zeros_state(topo)
    for _ in range(6):
        state = plume_step(topo, state, params, cfg)
    jax.block_until_ready(state.velocity)
    inv_dx = params.inv_voxel_size
    div = jax.jit(divergence, static_argnames=())(topo, state.velocity, inv_dx)
    d0 = float(jnp.max(jnp.abs(div)))
    print(f"domain: {int(topo.n_active)} tiles, div0={d0:.4f}", flush=True)

    def make(lag):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(d, k):
            def body(_, p):
                return solve_pressure(topo, d, 50, params.voxel_size,
                                      params.omega, p0=p, halo_lag=lag)
            return jax.lax.fori_loop(0, k, body, jnp.zeros_like(d))
        return chain

    def resid(p):
        vel = subtract_pressure_gradient(topo, state.velocity, p, inv_dx)
        return float(jnp.max(jnp.abs(divergence(topo, vel, inv_dx))))

    chains, ps = {}, {}
    for lag in (5, 10, 25):
        chains[lag] = make(lag)
        ps[lag] = chains[lag](div, k=1)
        print(f"lag{lag}: rmax after 50 it = {resid(ps[lag]):.4f}", flush=True)

    def t(fn, *a, **kw):
        r = fn(*a, **kw)
        jax.block_until_ready(r)
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            r = fn(*a, **kw)
            jax.block_until_ready(r)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for r in range(3):
        line = []
        for lag in (5, 10, 25):
            t2 = t(chains[lag], div, k=2)
            t8 = t(chains[lag], div, k=8)
            line.append(f"lag{lag}={(t8 - t2) / 6 * 1e3:.2f}ms")
        print(f"round {r}: " + "  ".join(line), flush=True)


main()
