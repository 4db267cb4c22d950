"""Prototype: on-chip combine kernel (27-table -> dual table in VMEM).

The XLA dual build costs 6.4 ms because the 8 octant gathers read full
rows to use one octant (8x bytes at ~190 GB/s effective — NOTES fact 29).
This kernel reads the 27-dilated chunk table ONCE (the 1.4 ms tbl27
gather), DMAs each chunk into VMEM, combines its Ud dual rows in-VMEM
(8 indexed reads + the 3-stage roll ladder per row), and DMAs the dual
table out. If (tbl27 + this) << 6.4 ms, integrate as the default build.

Run: python tools/tpu_submit.py 0NN_ckern tools/probe_ckern.py 900
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
    fields = [f.at[0].set(0.0) for f in fields]
    nc, Ud, _ = topo.chunk_dsrc.shape
    U = topo.chunk_uniq.shape[1]
    print(f"T={T} nc={nc} Ud={Ud} U27={U} nf={nf}", flush=True)

    # chunk-local source indices into chunk_uniq (host-side, once)
    uniq = np.asarray(topo.chunk_uniq)
    dsrc = np.asarray(topo.chunk_dsrc)
    dloc = np.zeros((nc, Ud, 8), np.int32)
    for c in range(nc):
        # only the prefix of uniq[c] is sorted (tail is zero padding)
        nu = 1 + np.count_nonzero(uniq[c])
        pos = np.searchsorted(uniq[c][:nu], dsrc[c].reshape(-1))
        pos = np.minimum(pos, nu - 1)
        ok = uniq[c][pos] == dsrc[c].reshape(-1)
        assert ok.all(), "source outside the 27-dilation?!"
        dloc[c] = pos.reshape(Ud, 8).astype(np.int32)
    dloc = jnp.asarray(dloc)

    def kernel(dloc_ref, tbl_ref, out_ref, ctbl, dtbl, sem1, sem2):
        c = pl.program_id(0)
        cp = pltpu.make_async_copy(tbl_ref.at[c], ctbl.at[0], sem1)
        cp.start()
        cp.wait()
        # rank-4 throughout (mirrors _combine_window16's proven patterns)
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8, 1), 2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 64), 3)
        xm = sub < 4
        ym = lane < 32
        zm = lane % 8 < 4

        def row(u, carry):
            r = [ctbl[0:1, pl.ds(dloc_ref[u, j] * nf, nf)][..., :64]
                 for j in range(8)]  # each [1, nf, 8, 64]
            xp = [jnp.where(xm, pltpu.roll(r[by * 2 + bz], 4, axis=2),
                            pltpu.roll(r[4 + by * 2 + bz], 4, axis=2))
                  for by in (0, 1) for bz in (0, 1)]
            yp = [jnp.where(ym, pltpu.roll(xp[bz], 32, axis=3),
                            pltpu.roll(xp[2 + bz], 32, axis=3))
                  for bz in (0, 1)]
            z = jnp.where(zm, pltpu.roll(yp[0], 60, axis=3),
                          pltpu.roll(yp[1], 4, axis=3))
            dtbl[0, pl.ds(u * nf, nf)] = jnp.concatenate([z, z], axis=3)[0]
            return carry

        jax.lax.fori_loop(0, Ud, row, 0)
        cp2 = pltpu.make_async_copy(dtbl.at[0], out_ref.at[c], sem2)
        cp2.start()
        cp2.wait()

    vmem = (U * nf + Ud * nf) * 8 * 128 * 4 + 8 * 1024 * 1024
    fn = pl.pallas_call(
        kernel,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((Ud, 8), lambda c: (c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((nc, Ud * nf, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, U * nf, 8, 128), jnp.float32),
            pltpu.VMEM((1, Ud * nf, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 120 * 1024 * 1024)),
    )

    @jax.jit
    def ckern(fs):
        t27 = pb.build_table(topo, fs)
        t27 = jnp.pad(t27, ((0, 0), (0, 0), (0, 0), (0, 64)))
        return fn(dloc.reshape(nc * Ud, 8), t27)

    try:
        got = jax.block_until_ready(ckern(fields))
        print("compiled ckern", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"ckern FAILED: {type(e).__name__}: {str(e)[:500]}", flush=True)
        return
    want = np.asarray(pb.build_table_dual(topo, fields))
    gotn = np.asarray(got)[:, :, :, :64]
    exact = np.array_equal(gotn, want)
    print(f"ckern bit-exact vs XLA dual build: {exact}", flush=True)
    if not exact:
        bad = np.argwhere(gotn != want)
        print(f"  mismatches {len(bad)}, first {bad[0]}", flush=True)
        return

    def chain_of(build):
        @jax.jit
        def c(fs, k):
            def body(i, fs):
                t = build(fs)
                eps = t[0, 0, 0, 0] * 1e-30
                return [fs[0] + eps] + list(fs[1:])
            return jax.lax.fori_loop(0, k, body, list(fs))[0]
        return c

    variants = {
        "ckern": chain_of(lambda fs: ckern(fs)),
        "xla": chain_of(lambda fs: pb.build_table_dual(topo, fs)),
        "tbl27": chain_of(lambda fs: pb.build_table(topo, fs)),
    }
    for name, f in variants.items():
        jax.block_until_ready(f(fields, jnp.asarray(1)))
        print(f"compiled {name} chain", flush=True)

    def t(f, k):
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(f(fields, jnp.asarray(k)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for r in range(3):
        line = []
        for name, f in variants.items():
            s = (t(f, 13) - t(f, 3)) / 10
            line.append(f"{name}={s * 1e3:.2f}ms")
        print(f"round {r}: " + "  ".join(line), flush=True)


main()
