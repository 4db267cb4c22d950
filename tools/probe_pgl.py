"""Lagged pressure kernel G ladder (tiles per program) at bench size:
G=8 (current) vs 16/32/64, lag-5, 50 iterations, interleaved chain slope.
Each variant is compiled while pallas_pressure.G is set to its value
(the lru caches are cleared between builds; compiled fns keep their
closure). Also checks bit-equality of the G variants.

Run: python tools/tpu_submit.py 082_pgl tools/probe_pgl.py 1500
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
    from hnanosolver_tpu.ops import pallas_pressure as pp
    from hnanosolver_tpu.ops import stencil

    params = SolverParams(dt=1.0 / 24.0, iterations=50, voxel_size=0.5)
    cfg = PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    state = zeros_state(topo)
    for _ in range(4):
        state = plume_step(topo, state, params, cfg)
    vel = jax.block_until_ready(state.velocity)
    div = jax.block_until_ready(
        stencil.divergence(topo, vel, params.inv_voxel_size))
    dx, omega = params.voxel_size, params.omega
    print(f"domain {int(topo.n_active)} tiles cap {int(topo.capacity)}",
          flush=True)

    variants = {}
    outs = {}
    for g in (8, 16, 32, 64):
        pp.G = g
        pp._build_lagged.cache_clear()

        @jax.jit
        def run(d, k):
            def body(_, p):
                return pp.solve_pressure_lagged(
                    topo, d, 50, dx, omega, 5, p0=p * 0.5)
            return jax.lax.fori_loop(0, k, body, jnp.zeros_like(d))

        outs[g] = jax.block_until_ready(run(div, jnp.asarray(1)))
        variants[f"G{g}"] = run
    pp.G = 8
    pp._build_lagged.cache_clear()
    for g in (16, 32, 64):
        err = float(jnp.max(jnp.abs(outs[g] - outs[8])))
        print(f"G{g} vs G8: max|diff|={err:.2e}", flush=True)

    # gather micro-test: the halo gather on full rows vs plane-packed
    # [T,64] sources (6x fewer bytes, same 6T descriptors) — decides
    # whether the 2.9 ms gather share (probe 081) is bytes- or
    # descriptor-floored at this row size
    from hnanosolver_tpu.ops.pallas_pressure import _DIRS
    from hnanosolver_tpu.ops.shifts import d_of

    nbr6 = jnp.concatenate([topo.nbr[:, d_of(off)] for off in _DIRS])
    T = int(topo.capacity)
    plane_cols = []
    for off in _DIRS:
        ax = 0 if off[0] else (1 if off[1] else 2)
        side = 0 if (off[ax] > 0) else 7  # +dir uses neighbor's low plane
        import numpy as _np

        col = _np.arange(512, dtype=_np.int32)
        cxyz = (col // 64, (col // 8) % 8, col % 8)[ax]
        plane_cols.append(_np.where(cxyz == side)[0].astype(_np.int32))

    @jax.jit
    def g_full(p, k):
        def body(_, q):
            f = jnp.take(q, nbr6, axis=0)
            return q + f[:T] * 1e-30
        return jax.lax.fori_loop(0, 10 * k, body, p)

    import numpy as _np

    all_cols = jnp.asarray(_np.concatenate(plane_cols))

    @jax.jit
    def g_plane(p, k):
        def body(_, q):
            pk = jnp.take(q, all_cols, axis=1)  # one lane pass -> [T,384]
            fs = [jnp.take(pk[:, j * 64:(j + 1) * 64],
                           topo.nbr[:, d_of(off)], axis=0)
                  for j, off in enumerate(_DIRS)]
            return q + sum(f[:, :1] for f in fs) * 1e-30
        return jax.lax.fori_loop(0, 10 * k, body, p)

    variants["g_full"] = g_full
    variants["g_plane"] = g_plane

    def pull(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]

    k_lo, k_hi = jnp.asarray(2), jnp.asarray(12)
    for fn in variants.values():
        pull(fn(div, k_lo))
        pull(fn(div, k_hi))

    def best(fn, k, rep=4):
        b = float("inf")
        for _ in range(rep):
            t0 = time.perf_counter()
            pull(fn(div, k))
            b = min(b, time.perf_counter() - t0)
        return b

    for r in range(4):
        if r:
            time.sleep(10)
        line = []
        for name, fn in variants.items():
            lo, hi = best(fn, k_lo), best(fn, k_hi)
            line.append(f"{name}={(hi - lo) / 10 * 1e3:.2f}ms")
        print(f"round {r}: " + " ".join(line), flush=True)


main()
