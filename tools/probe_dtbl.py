"""Time the dual-table build variants vs the 27-table build at bench size.

probe 045: dual kernel is bit-exact and the kernel itself should be ~7 ms
lighter, yet the scalar pass REGRESSED 21 -> 23 ms. Hypothesis: the dual
build's 8 barrier-chained gathers are descriptor-bound (75k row
descriptors vs 12k; the 27-build measured 1.8 ms => ~150 ns/descriptor).

Variants (all produce the same [nc, Ud*nf, 8, 64] table):
  chain   — as shipped: 8 gathers, barrier-chained
  free    — 8 gathers, NOT chained (XLA may overlap latency)
  one     — ONE take over the flattened [nc*Ud*8] index + in-lane select
  tbl27   — the 27-table build (reference cost)

Run: python tools/tpu_submit.py 0NN_dtbl tools/probe_dtbl.py 900
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
    T = topo.capacity
    rng = np.random.default_rng(3)
    nf = 8
    fields = [jnp.asarray(rng.standard_normal((T, 512)).astype(np.float32))
              for _ in range(nf)]
    nc, Ud, _ = topo.chunk_dsrc.shape
    print(f"T={T} nc={nc} Ud={Ud} U27={topo.chunk_uniq.shape[1]}", flush=True)
    masks, perm = pb._dual_lane_maps()
    perm_nf = jnp.asarray(
        (np.arange(nf)[:, None] * 512 + perm[None]).reshape(-1))
    dsrc = topo.chunk_dsrc

    def chain(fs, k):
        def body(i, fs):
            t = pb.build_table_dual(topo, fs)
            eps = t[0, 0, 0, 0] * 1e-30
            return [fs[0] + eps] + list(fs[1:])
        return jax.lax.fori_loop(0, k, body, list(fs))[0]

    def free(fs, k):
        def body(i, fs):
            packed = jnp.stack(list(fs), axis=1).reshape(T, nf * 512)
            acc = jnp.zeros((nc * Ud, nf * 512), jnp.float32)
            for j in range(8):
                rows = jnp.take(packed, dsrc[:, :, j].reshape(-1), axis=0)
                acc = jnp.where(jnp.asarray(np.tile(masks[j], nf)), rows, acc)
            t = jnp.take(acc, perm_nf, axis=1).reshape(nc, Ud * nf, 8, 64)
            eps = t[0, 0, 0, 0] * 1e-30
            return [fs[0] + eps] + list(fs[1:])
        return jax.lax.fori_loop(0, k, body, list(fs))[0]

    def one(fs, k):
        # one gather over [nc*Ud*8]: j-major inner so the select is a
        # reshape + octant-weighted sum along the new axis
        idx = dsrc.reshape(-1)  # [nc*Ud*8], j minor
        msel = np.zeros((8, 512), np.float32)
        for j in range(8):
            msel[j] = masks[j].astype(np.float32)
        msel_nf = jnp.asarray(np.tile(msel, (1, nf)))  # [8, nf*512]

        def body(i, fs):
            packed = jnp.stack(list(fs), axis=1).reshape(T, nf * 512)
            rows = jnp.take(packed, idx, axis=0).reshape(nc * Ud, 8, nf * 512)
            acc = jnp.einsum("rjc,jc->rc", rows, msel_nf)
            t = jnp.take(acc, perm_nf, axis=1).reshape(nc, Ud * nf, 8, 64)
            eps = t[0, 0, 0, 0] * 1e-30
            return [fs[0] + eps] + list(fs[1:])
        return jax.lax.fori_loop(0, k, body, list(fs))[0]

    def tbl27(fs, k):
        def body(i, fs):
            t = pb.build_table(topo, fs)
            eps = t[0, 0, 0, 0] * 1e-30
            return [fs[0] + eps] + list(fs[1:])
        return jax.lax.fori_loop(0, k, body, list(fs))[0]

    variants = {}
    for name, f in (("chain", chain), ("free", free), ("one", one),
                    ("tbl27", tbl27)):
        fn = jax.jit(f)
        try:
            jax.block_until_ready(fn(fields, jnp.asarray(1)))
            variants[name] = fn
            print(f"compiled {name}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # correctness: free/one must equal chain
    want = np.asarray(pb.build_table_dual(topo, fields))

    def t(fn, k):
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(fields, jnp.asarray(k)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for r in range(3):
        line = []
        for name, fn in variants.items():
            s = (t(fn, 13) - t(fn, 3)) / 10
            line.append(f"{name}={s * 1e3:.2f}ms")
        print(f"round {r}: " + "  ".join(line), flush=True)


main()
