"""Dual-table build: z-PAIR fetch (4 descriptors/dual-row) vs the 8-gather.

Sorted unique keys make the two z-sources of a dual row occupy CONSECUTIVE
table rows whenever both exist (their keys differ by exactly 1), so one
descriptor over a pair-packed array P2[r] = (packed[r], packed[r+1])
fetches both. Absent sources are handled by base-row selection + validity
masks derived on-device from chunk_dsrc (no new plan arrays):
  base = r_z0 if r_z0 > 0 else max(r_z1 - 1, 0); half k valid iff r_zk > 0.

Checks bit-exactness vs build_table_dual, then times pair vs free8 vs the
27-table build. Run: python tools/tpu_submit.py 0NN_dtbl2 tools/probe_dtbl2.py 900
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
    # null row must be zero (background) like real fields
    fields = [f.at[0].set(0.0) for f in fields]
    nc, Ud, _ = topo.chunk_dsrc.shape
    print(f"T={T} nc={nc} Ud={Ud} U27={topo.chunk_uniq.shape[1]}", flush=True)
    masks, perm = pb._dual_lane_maps()
    perm_nf = jnp.asarray(
        (np.arange(nf)[:, None] * 512 + perm[None]).reshape(-1))
    dsrc = topo.chunk_dsrc

    def pair(fs, k):
        H = nf * 512
        ms = []
        for jp in range(4):
            m0 = jnp.asarray(np.tile(masks[2 * jp], nf))
            m1 = jnp.asarray(np.tile(masks[2 * jp + 1], nf))
            ms.append((m0, m1))

        def body(i, fs):
            packed = jnp.stack(list(fs), axis=1).reshape(T, H)
            P2 = jnp.concatenate(
                [packed,
                 jnp.concatenate([packed[1:], packed[:1]], axis=0)], axis=1)
            acc = jnp.zeros((nc * Ud, H), jnp.float32)
            for jp in range(4):
                r0 = dsrc[:, :, 2 * jp].reshape(-1)
                r1 = dsrc[:, :, 2 * jp + 1].reshape(-1)
                base = jnp.where(r0 > 0, r0, jnp.maximum(r1 - 1, 0))
                rows2 = jnp.take(P2, base, axis=0)
                m0, m1 = ms[jp]
                acc = jnp.where((r0 > 0)[:, None] & m0, rows2[:, :H], acc)
                acc = jnp.where((r1 > 0)[:, None] & m1, rows2[:, H:], acc)
            t = jnp.take(acc, perm_nf, axis=1).reshape(nc, Ud * nf, 8, 64)
            eps = t[0, 0, 0, 0] * 1e-30
            return [fs[0] + eps] + list(fs[1:])
        return jax.lax.fori_loop(0, k, body, list(fs))[0]

    def free8(fs, k):
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

    def tbl27(fs, k):
        def body(i, fs):
            t = pb.build_table(topo, fs)
            eps = t[0, 0, 0, 0] * 1e-30
            return [fs[0] + eps] + list(fs[1:])
        return jax.lax.fori_loop(0, k, body, list(fs))[0]

    # bit-exactness of pair vs the 8-gather reference
    want = np.asarray(pb.build_table_dual(topo, fields))

    @jax.jit
    def pair_once(fs):
        H = nf * 512
        packed = jnp.stack(list(fs), axis=1).reshape(T, H)
        P2 = jnp.concatenate(
            [packed, jnp.concatenate([packed[1:], packed[:1]], axis=0)],
            axis=1)
        acc = jnp.zeros((nc * Ud, H), jnp.float32)
        for jp in range(4):
            r0 = dsrc[:, :, 2 * jp].reshape(-1)
            r1 = dsrc[:, :, 2 * jp + 1].reshape(-1)
            base = jnp.where(r0 > 0, r0, jnp.maximum(r1 - 1, 0))
            rows2 = jnp.take(P2, base, axis=0)
            m0 = jnp.asarray(np.tile(masks[2 * jp], nf))
            m1 = jnp.asarray(np.tile(masks[2 * jp + 1], nf))
            acc = jnp.where((r0 > 0)[:, None] & m0, rows2[:, :H], acc)
            acc = jnp.where((r1 > 0)[:, None] & m1, rows2[:, H:], acc)
        return jnp.take(acc, perm_nf, axis=1).reshape(nc, Ud * nf, 8, 64)

    got = np.asarray(pair_once(fields))
    exact = np.array_equal(got, want)
    print(f"pair bit-exact vs 8-gather: {exact}", flush=True)
    if not exact:
        bad = np.argwhere(got != want)
        print(f"  first mismatch {bad[0]}", flush=True)
        return

    variants = {}
    for name, f in (("pair", pair), ("free8", free8), ("tbl27", tbl27)):
        fn = jax.jit(f)
        jax.block_until_ready(fn(fields, jnp.asarray(1)))
        variants[name] = fn
        print(f"compiled {name}", flush=True)

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
