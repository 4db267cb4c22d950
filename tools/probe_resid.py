"""On-chip parity + timing for residual_fused (packed-plane Poisson
residual kernel) vs the XLA form, bench-size domain.

Run: python tools/tpu_submit.py 114_resid tools/probe_resid.py 1200
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
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.ops import pallas_stencil as pst
    from hnanosolver_tpu.ops import pressure as prs

    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    T = int(topo.capacity)
    rng = np.random.default_rng(3)
    p = rng.normal(size=(T, 512)).astype(np.float32)
    p[0] = 0.0
    p = jnp.asarray(p)
    div = jnp.asarray(rng.normal(size=(T, 512)).astype(np.float32))
    print(f"domain {int(topo.n_active)} tiles cap {T}", flush=True)

    for dx in (0.5, 0.3):
        a = jax.jit(prs.residual, static_argnames=("dx",))(
            topo, p, div, dx=dx)
        b = jax.jit(
            lambda pp, dd: pst.residual_fused(topo, pp, dd, dx,
                                              interpret=False)
        )(p, div)
        print(f"parity dx={dx}: max|xla-fused| = "
              f"{float(jnp.max(jnp.abs(a - b)))} "
              f"{'BITWISE' if bool(jnp.all(a == b)) else 'DIFF'}", flush=True)

    def mk(fused):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(pp, dd, k):
            def body(_, x):
                if fused:
                    return pst.residual_fused(topo, x, dd, 0.5,
                                              interpret=False)
                return prs.residual(topo, x, dd, 0.5)
            return jax.lax.fori_loop(0, k, body, pp)
        return chain

    def pull(x):
        np.asarray(x).ravel()[:1]

    chains = {"xla": mk(False), "fused": mk(True)}
    for name, fn in chains.items():
        t0 = time.perf_counter()
        pull(fn(p, div, k=2))
        print(f"compile {name}: {time.perf_counter() - t0:.1f}s", flush=True)
    best = {k: float("inf") for k in chains}
    for r in range(4):
        for name, fn in chains.items():
            ts = []
            for k in (2, 20):
                t0 = time.perf_counter()
                pull(fn(p, div, k=k))
                ts.append(time.perf_counter() - t0)
            s = (ts[1] - ts[0]) / 18
            if s > 0:
                best[name] = min(best[name], s)
            print(f"r{r} {name}: slope {s * 1e3:.3f} ms", flush=True)
    res = {k: round(v * 1e3, 3) for k, v in best.items()}
    print(json.dumps(res), flush=True)  # noqa: F821
    out(res)  # noqa: F821


main()
