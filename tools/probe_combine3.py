"""Component A/B for the dual-table build paths, long chains, interleaved:
  (a) dual_xla   — XLA octant-packed build (shipped default)
  (b) t27+comb   — 27-table gather + on-chip combine kernel
  (c) t27        — 27-table gather alone (the combine input's cost)
at nf=8 (scalar pass) in one window. Slopes over a 60-step span.

Run: python tools/tpu_submit.py 125_combine3 tools/probe_combine3.py 2400
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
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.ops import pallas_bfecc as pb

    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    T = int(topo.capacity)
    rng = np.random.default_rng(0)
    nf = 8
    fields = [jnp.asarray(rng.normal(size=(T, 512)).astype(np.float32))
              for _ in range(nf)]
    print(f"domain {int(topo.n_active)} tiles cap {T} nf={nf}", flush=True)

    def chain_of(fn):
        @jax.jit
        def chain(fs, k):
            def body(_, fs):
                t = fn(fs)
                return [fs[0] + t[0, 0, 0, 0] * 1e-30] + list(fs[1:])
            return jax.lax.fori_loop(0, k, body, list(fs))
        return chain

    cases = [
        ("dual_xla", chain_of(lambda fs: pb.build_table_dual(topo, list(fs)))),
        ("t27+comb", chain_of(lambda fs: pb.build_table_dual_combine(
            topo, pb.build_table(topo, list(fs)), nf, interpret=False))),
        ("t27", chain_of(lambda fs: pb.build_table(topo, list(fs)))),
    ]

    def pull(o):
        np.asarray(o[0]).ravel()[:1]

    K_LO, K_HI = jnp.asarray(2), jnp.asarray(62)
    span = 60.0
    for _, c in cases:
        pull(c(fields, K_LO))
        pull(c(fields, K_HI))
    print("compiled", flush=True)

    mins = {nm: [float("inf"), float("inf")] for nm, _ in cases}
    for r in range(8):
        if r:
            time.sleep(10)
        msg = []
        for nm, c in cases:
            lo = hi = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                pull(c(fields, K_LO))
                lo = min(lo, time.perf_counter() - t0)
            for _ in range(3):
                t0 = time.perf_counter()
                pull(c(fields, K_HI))
                hi = min(hi, time.perf_counter() - t0)
            mins[nm][0] = min(mins[nm][0], lo)
            mins[nm][1] = min(mins[nm][1], hi)
            msg.append(f"{nm}={(hi - lo) / span * 1e3:.2f}")
        print(f"round {r}: " + "  ".join(msg) + " ms", flush=True)

    print("anchor (global-min slope, ms): " + "  ".join(
        f"{nm}={(mins[nm][1] - mins[nm][0]) / span * 1e3:.2f}"
        for nm, _ in cases), flush=True)


main()
