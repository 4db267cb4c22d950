"""Full plume_step chain at bench size on the real chip, post mixed-window
branch: compile-checks the 3-way CFL cond inside the jitted step and
measures the bench-style chain slope (2 vs 12), 3 rounds.

Run: python tools/tpu_submit.py 079_stepfull tools/probe_stepfull.py 1500
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

    params = SolverParams(dt=1.0 / 24.0, iterations=50, voxel_size=0.5)
    cfg = PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    state = zeros_state(topo)
    for _ in range(2):
        state = plume_step(topo, state, params, cfg)
    jax.block_until_ready(state.velocity)
    print(f"domain {int(topo.n_active)} tiles cap {int(topo.capacity)}",
          flush=True)

    @jax.jit
    def chain(s, k):
        return jax.lax.fori_loop(
            0, k, lambda _, x: plume_step(topo, x, params, cfg), s)

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    k_lo, k_hi = jnp.asarray(2), jnp.asarray(12)
    t0 = time.perf_counter()
    pull(chain(state, k_lo))
    print(f"compile+run lo: {time.perf_counter() - t0:.1f}s", flush=True)
    pull(chain(state, k_hi))

    # report the CFL band the chain traverses (which dispatch arms fire)
    s = state
    for i in range(12):
        s = plume_step(topo, s, params, cfg)
        if i in (0, 3, 7, 11):
            amax = float(jnp.max(jnp.abs(s.velocity))) * params.dt \
                * params.inv_voxel_size
            print(f"  after step {i + 3}: cfl={amax:.2f}", flush=True)

    def best(k, rep=4):
        b = float("inf")
        for _ in range(rep):
            t0 = time.perf_counter()
            pull(chain(state, k))
            b = min(b, time.perf_counter() - t0)
        return b

    for r in range(3):
        if r:
            time.sleep(15)
        pull(chain(state, k_lo))
        lo, hi = best(k_lo), best(k_hi)
        print(f"round {r}: lo={lo:.3f}s hi={hi:.3f}s "
              f"step={(hi - lo) / 10 * 1e3:.2f}ms", flush=True)


main()
