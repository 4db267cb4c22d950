"""Full-step A/B: STENCIL_KERNEL (fused div/subgrad) ON vs OFF, with the
round-4 gates (PLANES_HALO, RESID_KERNEL, TAIL_KERNEL) on in both arms.
Interleaved bench-style chains (2 vs 12), min-of-rounds — decides the
STENCIL_KERNEL default for the recorded bench.

Run: python tools/tpu_submit.py 117_stepab tools/probe_stepab.py 2400
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
    from hnanosolver_tpu.ops import pallas_stencil as pst

    params = SolverParams(dt=1.0 / 24.0, iterations=50, voxel_size=0.5)
    cfg = PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    state = zeros_state(topo)
    for _ in range(4):
        state = plume_step(topo, state, params, cfg)
    jax.block_until_ready(state.velocity)
    print(f"domain {int(topo.n_active)} tiles cap {int(topo.capacity)}",
          flush=True)

    def mk(fused):
        pst.STENCIL_KERNEL = fused

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(s, k):
            return jax.lax.fori_loop(
                0, k, lambda _, x: plume_step(topo, x, params, cfg), s)
        return chain

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    chains = {"stencil_off": mk(False), "stencil_on": mk(True)}
    for name, fn in chains.items():
        t0 = time.perf_counter()
        pull(fn(state, k=2))
        print(f"compile {name}: {time.perf_counter() - t0:.1f}s", flush=True)
    best = {k: float("inf") for k in chains}
    for r in range(6):
        for name, fn in chains.items():
            ts = []
            for k in (2, 12):
                t0 = time.perf_counter()
                pull(fn(state, k=k))
                ts.append(time.perf_counter() - t0)
            s = (ts[1] - ts[0]) / 10
            if s > 0:
                best[name] = min(best[name], s)
            print(f"r{r} {name}: slope {s * 1e3:.2f} ms", flush=True)
        time.sleep(5)
    res = {k: round(v * 1e3, 2) for k, v in best.items()}
    print(json.dumps(res), flush=True)  # noqa: F821
    out(res)  # noqa: F821


main()
