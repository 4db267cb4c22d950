"""On-chip validation of the 27-table -> dual-table combine kernel
(pallas_bfecc.build_table_dual_combine): compile, bitwise parity vs the
XLA octant-packed build, and interleaved chain-slope timing of the two
table-build paths at bench size (nf=8 like the scalar pass, nf=3 like the
velocity pass).

Run: python tools/tpu_submit.py 122_combine tools/probe_combine.py 1500
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
    print(f"domain {int(topo.n_active)} tiles cap {T} "
          f"U27={topo.chunk_uniq.shape} Ud={topo.chunk_dsrc.shape}",
          flush=True)

    for nf in (8, 3):
        fields = [jnp.asarray(rng.normal(size=(T, 512)).astype(np.float32))
                  for _ in range(nf)]

        @jax.jit
        def dual_xla(fs):
            return pb.build_table_dual(topo, list(fs))

        @jax.jit
        def dual_kernel(fs):
            t27 = pb.build_table(topo, list(fs))
            return pb.build_table_dual_combine(topo, t27, nf,
                                               interpret=False)

        a = dual_xla(fields)
        b = dual_kernel(fields)
        d = float(jnp.max(jnp.abs(a - b)))
        eq = bool(jnp.all(a == b))
        print(f"nf={nf}: parity max|d|={d:.3e} bitwise={eq}", flush=True)

        # chain timing: k dependent builds (perturb input so XLA can't CSE)
        def chain_of(fn):
            @jax.jit
            def chain(fs, k):
                def body(_, fs):
                    t = fn(fs)
                    # fold one table lane back into field 0: dependency
                    return [fs[0] + t[0, 0, 0, 0] * 1e-30] + list(fs[1:])
                return jax.lax.fori_loop(0, k, body, list(fs))
            return chain

        cx = chain_of(lambda fs: pb.build_table_dual(topo, list(fs)))
        ck = chain_of(lambda fs: pb.build_table_dual_combine(
            topo, pb.build_table(topo, list(fs)), nf, interpret=False))

        def pull(o):
            np.asarray(o[0]).ravel()[:1]

        for c in (cx, ck):
            pull(c(fields, jnp.asarray(2)))
            pull(c(fields, jnp.asarray(12)))

        for r in range(3):
            if r:
                time.sleep(10)
            msg = []
            for name, c in (("xla", cx), ("kern", ck)):
                best_lo = best_hi = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    pull(c(fields, jnp.asarray(2)))
                    best_lo = min(best_lo, time.perf_counter() - t0)
                for _ in range(3):
                    t0 = time.perf_counter()
                    pull(c(fields, jnp.asarray(12)))
                    best_hi = min(best_hi, time.perf_counter() - t0)
                msg.append(f"{name}={(best_hi - best_lo) / 10 * 1e3:.2f}ms")
            print(f"nf={nf} round {r}: " + "  ".join(msg), flush=True)


main()
