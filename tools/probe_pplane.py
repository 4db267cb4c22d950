"""On-chip validation for two gated kernels, one submission:

  A. packed-plane lagged pressure halo (pallas_pressure.PLANES_HALO):
     bitwise parity vs the full-face path (lag 5 and pair-granularity) and
     interleaved 50-iter solve timing (chain slope, min over rounds).
  B. fused divergence / subtract-gradient kernels
     (pallas_stencil.STENCIL_KERNEL): compile + bitwise parity vs the XLA
     forms and interleaved step-component timing.

Run: python tools/tpu_submit.py 113_pplane tools/probe_pplane.py 2400
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
    from hnanosolver_tpu.ops import pallas_pressure as pp
    from hnanosolver_tpu.ops import pallas_stencil as pst
    from hnanosolver_tpu.ops.pressure import solve_pressure
    from hnanosolver_tpu.ops.stencil import (
        divergence,
        subtract_pressure_gradient,
    )

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
    div = jax.jit(divergence)(topo, state.velocity, inv_dx)
    print(f"domain {int(topo.n_active)} tiles cap {int(topo.capacity)}",
          flush=True)

    # ---- A. parity: packed-plane vs full-face lagged solve --------------
    def solve_lag(d, p0, lag, planes):
        pp.PLANES_HALO = planes
        return jax.jit(lambda dd, pz: pp.solve_pressure_lagged(
            topo, dd, 50, params.voxel_size, params.omega, lag, p0=pz,
            interpret=False))(d, p0)

    z = jnp.zeros_like(div)
    for lag in (5, 1):
        a = solve_lag(div, z, lag, False)
        b = solve_lag(div, z, lag, True)
        d = float(jnp.max(jnp.abs(a - b)))
        print(f"A parity lag{lag}: max|old-new| = {d}"
              f" {'BITWISE' if bool(jnp.all(a == b)) else 'DIFF'}",
              flush=True)

    # ---- B. parity: fused stencil kernels vs XLA forms ------------------
    dx_xla = jax.jit(lambda v: divergence(topo, v, inv_dx))(state.velocity)
    dv_f = jax.jit(lambda v: pst.divergence_fused(topo, v, inv_dx))(
        state.velocity)
    print(f"B parity div: max|xla-fused| = "
          f"{float(jnp.max(jnp.abs(dx_xla - dv_f)))} "
          f"{'BITWISE' if bool(jnp.all(dx_xla == dv_f)) else 'DIFF'}",
          flush=True)
    p50 = solve_lag(div, z, 5, False)
    sg_xla = jax.jit(lambda v, p: subtract_pressure_gradient(
        topo, v, p, inv_dx))(state.velocity, p50)
    sg_f = jax.jit(lambda v, p: pst.subtract_gradient_fused(
        topo, v, p, inv_dx))(state.velocity, p50)
    print(f"B parity subgrad: max|xla-fused| = "
          f"{float(jnp.max(jnp.abs(sg_xla - sg_f)))} "
          f"{'BITWISE' if bool(jnp.all(sg_xla == sg_f)) else 'DIFF'}",
          flush=True)

    # ---- timing: interleaved chain slopes -------------------------------
    def mk_solve_chain(planes):
        pp.PLANES_HALO = planes

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(d, k):
            def body(_, p):
                return solve_pressure(topo, d, 50, params.voxel_size,
                                      params.omega, p0=p, halo_lag=5)
            return jax.lax.fori_loop(0, k, body, jnp.zeros_like(d))
        return chain

    def mk_stencil_chain(fused):
        pst.STENCIL_KERNEL = fused

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(v, p, k):
            def body(_, vv):
                d = divergence(topo, vv, inv_dx)
                return subtract_pressure_gradient(topo, vv, p + d * 0.0,
                                                  inv_dx)
            return jax.lax.fori_loop(0, k, body, v)
        return chain

    def pull(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]

    chains = {
        "solve_face": (mk_solve_chain(False), (div,)),
        "solve_plane": (mk_solve_chain(True), (div,)),
        "stencil_xla": (mk_stencil_chain(False), (state.velocity, p50)),
        "stencil_fused": (mk_stencil_chain(True), (state.velocity, p50)),
    }
    for name, (fn, a) in chains.items():  # compile
        t0 = time.perf_counter()
        pull(fn(*a, k=2))
        print(f"compile {name}: {time.perf_counter() - t0:.1f}s", flush=True)
    best = {k: float("inf") for k in chains}
    for r in range(5):
        for name, (fn, a) in chains.items():
            ts = []
            for k in (2, 10):
                t0 = time.perf_counter()
                pull(fn(*a, k=k))
                ts.append(time.perf_counter() - t0)
            s = (ts[1] - ts[0]) / 8
            if s > 0:
                best[name] = min(best[name], s)
            print(f"r{r} {name}: slope {s * 1e3:.2f} ms", flush=True)
    res = {k: round(v * 1e3, 2) for k, v in best.items()}
    print(json.dumps(res), flush=True)  # noqa: F821
    out(res)  # noqa: F821


main()
