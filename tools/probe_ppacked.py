"""Packed-shell lagged pressure vs the [6,T,512]-gather lagged path at bench
size: compile check, bit-exactness on-chip, and interleaved timing.

Run: python tools/tpu_submit.py 0NN_ppacked tools/probe_ppacked.py 900
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
    from hnanosolver_tpu.core.topology import active_mask, build_topology
    from hnanosolver_tpu.ops.pallas_pressure import (
        solve_pressure_lagged,
        solve_pressure_lagged_packed,
    )

    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    rng = np.random.default_rng(7)
    div = jnp.asarray(
        rng.standard_normal((topo.capacity, 512)).astype(np.float32)
    ) * active_mask(topo)[:, None]
    dx, omega, lag, iters = 0.5, 1.17, 5, 50
    print(f"domain: {int(topo.n_active)} tiles, capacity {topo.capacity}",
          flush=True)

    old = jax.jit(lambda d: solve_pressure_lagged(
        topo, d, iters, dx, omega, lag))
    new = jax.jit(lambda d: solve_pressure_lagged_packed(
        topo, d, iters, dx, omega, lag))
    po = old(div)
    po.block_until_ready()
    print("compiled old", flush=True)
    pn = new(div)
    pn.block_until_ready()
    print("compiled new", flush=True)
    diff = float(jnp.max(jnp.abs(po - pn)))
    print(f"|old-new| = {diff:.2e}", flush=True)

    # chained timing (12-step chains minus 2-step, interleaved rounds)
    def chain(fn):
        def f(d, k):
            return jax.lax.fori_loop(0, k, lambda _, x: fn(x) * 0.999 + d * 0.001, d)
        return jax.jit(f)

    co, cn = chain(lambda d: solve_pressure_lagged(
        topo, d, iters, dx, omega, lag)), chain(
        lambda d: solve_pressure_lagged_packed(topo, d, iters, dx, omega, lag))
    k2, k12 = jnp.asarray(2), jnp.asarray(12)

    def pull(x):
        np.asarray(x).ravel()[:1]

    for c in (co, cn):
        pull(c(div, k2))
        pull(c(div, k12))
    def best(c, k, reps=3):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            pull(c(div, k))
            b = min(b, time.perf_counter() - t0)
        return b

    for r in range(3):
        ts = {}
        for name, c in (("old", co), ("new", cn)):
            ts[name] = (best(c, k12) - best(c, k2)) / 10
        print(f"round {r}: old={ts['old']*1e3:.2f}ms new={ts['new']*1e3:.2f}ms "
              f"ratio={ts['old']/max(ts['new'],1e-9):.2f}", flush=True)


main()
