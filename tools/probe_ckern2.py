"""Prototype v2: combine + bounds Pallas kernels built from the 27-table.

Shape bisect (probe 063) showed dynamic pl.ds offsets into >= 2048-row
scratches fail to compile when they feed rolls or act as store targets,
while the megakernel's pattern (dynamic READ -> static store into a small
scratch; rolls on STATIC slices; out written via grid BLOCKS) works at 12k
rows. So v2 mirrors that:

  combine kernel — grid (nc, Ud/GU): per chunk DMA the 27-table once into
    VMEM (program_id(1)==0, persists across the chunk's steps); per step
    assemble GU dual rows' 8 sources into a small tmp scratch (dynamic
    read -> static store), run the 3-stage roll ladder on static slices,
    write the out BLOCK [1, GU*nf, 8, 128].
  bounds kernel — grid (nc, C/GT): same resident ctbl; per tile read the
    7 face-stencil rows into tmp, compute the BFECC limiter bounds
    ({self,6 faces} min/max, background-0), out [GT, nf, 8, 128] lo|hi.

Targets: combine+tbl27 ~ 4 ms vs 6.4 XLA dual build; bounds ~ 1 ms vs
4.35 XLA face_minmax (probe 060 decomposition).

Run: python tools/tpu_submit.py 0NN_ckern2 tools/probe_ckern2.py 1500
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

GU = 64  # dual rows per grid step (combine kernel)
GT = 32  # tiles per grid step (bounds kernel)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import bench
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.ops import pallas_bfecc as pb
    from hnanosolver_tpu.ops import shifts as sh

    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    T = topo.capacity
    rng = np.random.default_rng(3)
    nf = 8
    fields = [jnp.asarray(rng.standard_normal((T, 512)).astype(np.float32))
              .at[0].set(0.0) for _ in range(nf)]
    nc, Ud0, _ = topo.chunk_dsrc.shape
    U = topo.chunk_uniq.shape[1]
    C = T // nc
    Ud = ((Ud0 + GU - 1) // GU) * GU
    print(f"T={T} nc={nc} Ud={Ud0}->{Ud} U27={U} nf={nf}", flush=True)

    uniq = np.asarray(topo.chunk_uniq)
    dsrc = np.asarray(topo.chunk_dsrc)
    dloc = np.zeros((nc, Ud, 8), np.int32)
    for c in range(nc):
        nu = 1 + np.count_nonzero(uniq[c])
        pos = np.searchsorted(uniq[c][:nu], dsrc[c].reshape(-1))
        dloc[c, :Ud0] = np.minimum(pos, nu - 1).reshape(Ud0, 8)
    dloc = jnp.asarray(dloc.reshape(nc * Ud, 8))

    # ---------------- combine kernel ----------------
    def ck(dloc_ref, tbl_ref, out_ref, ctbl, tmp, sem1):
        c = pl.program_id(0)

        @pl.when(pl.program_id(1) == 0)
        def _load():
            cp = pltpu.make_async_copy(tbl_ref.at[c], ctbl.at[0], sem1)
            cp.start()
            cp.wait()

        sub = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8, 1), 2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 64), 3)
        xm, ym, zm = sub < 4, lane < 32, lane % 8 < 4

        def asm(i, carry):
            g = i // 8
            j = i % 8
            row = ctbl[0, pl.ds(dloc_ref[g, j] * nf, nf)][..., :64]
            tmp[g, pl.ds(j * nf, nf)] = row
            return carry

        jax.lax.fori_loop(0, GU * 8, asm, 0)
        for g in range(GU):
            r = [tmp[g : g + 1, j * nf : (j + 1) * nf]
                 for j in range(8)]  # [1, nf, 8, 64] each, static slices
            xp = [jnp.where(xm, pltpu.roll(r[by * 2 + bz], 4, axis=2),
                            pltpu.roll(r[4 + by * 2 + bz], 4, axis=2))
                  for by in (0, 1) for bz in (0, 1)]
            yp = [jnp.where(ym, pltpu.roll(xp[bz], 32, axis=3),
                            pltpu.roll(xp[2 + bz], 32, axis=3))
                  for bz in (0, 1)]
            z = jnp.where(zm, pltpu.roll(yp[0], 60, axis=3),
                          pltpu.roll(yp[1], 4, axis=3))
            out_ref[0, g * nf : (g + 1) * nf] = jnp.concatenate(
                [z, z], axis=3)[0]

    nsteps = Ud // GU
    vmem = (U * nf * 8 * 128 * 4 + GU * 8 * nf * 8 * 128 * 4
            + 2 * GU * nf * 8 * 128 * 4 + 16 * 1024 * 1024)
    combine = pl.pallas_call(
        ck,
        grid=(nc, nsteps),
        in_specs=[
            pl.BlockSpec((GU, 8), lambda c, s: (c * nsteps + s, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, GU * nf, 8, 128),
                               lambda c, s: (c, s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc, Ud * nf, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, U * nf, 8, 128), jnp.float32),
            pltpu.VMEM((GU, 8 * nf, 8, 64), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 120 * 1024 * 1024)),
    )

    @jax.jit
    def ckern2(fs):
        t27 = pb.build_table(topo, fs)
        t27 = jnp.pad(t27, ((0, 0), (0, 0), (0, 0), (0, 64)))
        return combine(dloc, t27)

    try:
        got = jax.block_until_ready(ckern2(fields))
        print("compiled combine", flush=True)
        want = np.asarray(pb.build_table_dual(topo, fields))
        gotn = np.asarray(got).reshape(nc, Ud * nf, 8, 128)[
            :, : Ud0 * nf, :, :64]
        exact = np.array_equal(gotn, want)
        print(f"combine bit-exact: {exact}", flush=True)
        if not exact:
            bad = np.argwhere(gotn != want)
            print(f"  mismatches {len(bad)} first {bad[0]}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"combine FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        got = None

    # ---------------- bounds kernel ----------------
    # face rows in the dx-major 27-neighbor order (see _face_minmax)
    FACE_D = (22, 4, 16, 10, 14, 12)

    def bk(lnbr_ref, tbl_ref, out_ref, ctbl, tmp, sem1):
        c = pl.program_id(0)

        @pl.when(pl.program_id(1) == 0)
        def _load():
            cp = pltpu.make_async_copy(tbl_ref.at[c], ctbl.at[0], sem1)
            cp.start()
            cp.wait()

        sub = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8, 1), 2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 64), 3)
        ly, lz = lane // 8, lane % 8
        specs = (
            (2, 2, 7, 7, sub == 7),
            (3, 2, 1, 1, sub == 0),
            (4, 3, 56, 56, ly == 7),
            (5, 3, 8, 8, ly == 0),
            (6, 3, 63, 7, lz == 7),
            (7, 3, 1, 57, lz == 0),
        )

        def asm(i, carry):
            g = i // 7
            j = i % 7
            row = ctbl[0, pl.ds(lnbr_ref[g, j] * nf, nf)][..., :64]
            tmp[g, pl.ds(j * nf, nf)] = row
            return carry

        jax.lax.fori_loop(0, GT * 7, asm, 0)
        for g in range(GT):
            cen = tmp[g : g + 1, 0:nf]  # [1, nf, 8, 64]
            vmin = cen
            vmax = cen
            for k, ax, s_in, s_fix, m in specs:
                nrow = tmp[g : g + 1, (k - 1) * nf : k * nf]
                view = jnp.where(m, pltpu.roll(nrow, s_fix, axis=ax),
                                 pltpu.roll(cen, s_in, axis=ax))
                vmin = jnp.minimum(vmin, view)
                vmax = jnp.maximum(vmax, view)
            out_ref[g] = jnp.concatenate([vmin, vmax], axis=3)[0]

    # per-tile stencil rows: center + 6 faces as chunk-local indices
    lnbr = np.asarray(topo.chunk_lnbr)
    l7 = lnbr[:, [13] + list(FACE_D)].astype(np.int32)  # [T, 7]
    l7 = jnp.asarray(l7)

    gsteps = C // GT
    bounds = pl.pallas_call(
        bk,
        grid=(nc, gsteps),
        in_specs=[
            pl.BlockSpec((GT, 7), lambda c, s: (c * gsteps + s, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((GT, nf, 8, 128),
                               lambda c, s: (c * gsteps + s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, nf, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, U * nf, 8, 128), jnp.float32),
            pltpu.VMEM((GT, 7 * nf, 8, 64), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem, 120 * 1024 * 1024)),
    )

    @jax.jit
    def bkern(fs):
        t27 = pb.build_table(topo, fs)
        t27 = jnp.pad(t27, ((0, 0), (0, 0), (0, 0), (0, 64)))
        return bounds(l7, t27)

    try:
        got_b = jax.block_until_ready(bkern(fields))
        print("compiled bounds", flush=True)
        ph = jnp.stack(fields)
        mn, mx = sh.face_minmax_multi(topo, ph)
        lo = jnp.minimum(ph, mn)
        hi = jnp.maximum(ph, mx)
        gb = np.asarray(got_b)
        glo = gb[:, :, :, :64].reshape(T, nf, 512).transpose(1, 0, 2)
        ghi = gb[:, :, :, 64:].reshape(T, nf, 512).transpose(1, 0, 2)
        ok = (np.array_equal(glo, np.asarray(lo))
              and np.array_equal(ghi, np.asarray(hi)))
        print(f"bounds bit-exact: {ok}", flush=True)
        if not ok:
            bad = np.argwhere(glo != np.asarray(lo))
            print(f"  lo mismatches {len(bad)} first "
                  f"{bad[0] if len(bad) else '-'}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"bounds FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        got_b = None

    if got is None or got_b is None:
        return

    # ---------------- timing ----------------
    def chain_of(build):
        @jax.jit
        def f(fs, k):
            def body(i, fs):
                t = build(fs)
                return [fs[0] + t[0, 0, 0, 0] * 1e-30] + list(fs[1:])
            return jax.lax.fori_loop(0, k, body, list(fs))[0]
        return f

    @jax.jit
    def xla_minmax(fs, k):
        def body(i, fs):
            mn, mx = sh.face_minmax_multi(topo, jnp.stack(fs))
            return [fs[0] + mn[0, 0, 0] * 1e-30 + mx[0, 0, 0] * 0.0] + \
                list(fs[1:])
        return jax.lax.fori_loop(0, k, body, list(fs))[0]

    runs = {
        "ckern2": chain_of(lambda fs: ckern2(fs)),
        "xla_dual": chain_of(lambda fs: pb.build_table_dual(topo, fs)),
        "bkern": chain_of(lambda fs: bkern(fs)),
        "xla_minmax": xla_minmax,
    }
    for nm, f in runs.items():
        jax.block_until_ready(f(fields, jnp.asarray(1)))
        print(f"compiled {nm} chain", flush=True)

    def t(f, k):
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(f(fields, jnp.asarray(k)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for r in range(3):
        line = []
        for nm, f in runs.items():
            s = (t(f, 13) - t(f, 3)) / 10
            line.append(f"{nm}={s * 1e3:.2f}ms")
        print(f"round {r}: " + "  ".join(line), flush=True)


main()
