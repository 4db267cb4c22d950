"""Byte-minimal XLA forms of the two gather-bound advection stages.

Gathers are BYTES-bound (~190 GB/s effective, NOTES fact 29), and both
stages read full 512-lane rows to use 1/8 of the lanes:

  build_oct — dual-table build from OCTANT-PACKED fields: P_j = the 64
    source lanes octant j contributes, [T, nf*64]; 8 gathers then ONE
    static lane permutation of their concat. Gathered bytes drop 8x
    (1.23 GB -> 154 MB at bench, nf=8).
  minmax_pl — limiter bounds from FACE-PLANE-PACKED fields: per direction
    gather only the neighbor's touching 64-lane plane, expand onto the
    boundary lanes statically. 6 x 8x fewer gathered bytes.

Both must be bit-exact vs the shipped forms. Run:
    python tools/tpu_submit.py 0NN_octpack tools/probe_octpack.py 1200
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
    from hnanosolver_tpu.ops import shifts as sh

    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    T = topo.capacity
    rng = np.random.default_rng(3)
    nf = 8
    fields = [jnp.asarray(rng.standard_normal((T, 512)).astype(np.float32))
              .at[0].set(0.0) for _ in range(nf)]
    nc, Ud, _ = topo.chunk_dsrc.shape
    print(f"T={T} nc={nc} Ud={Ud}", flush=True)
    dsrc = topo.chunk_dsrc
    masks, perm = pb._dual_lane_maps()

    # ---- build_oct -------------------------------------------------------
    lane = np.arange(512)
    oct_lanes = [np.nonzero(masks[j])[0] for j in range(8)]  # 64 each
    # dest lane l gets source lane perm[l] of source j with mask'_{j}
    # containing perm[l]; build the static reassembly permutation over the
    # concat [rows_0 | ... | rows_7] (each [*, nf*64], field-major inside)
    # concat column of (j, f, k) = j*nf*64 + f*64 + k where k indexes
    # oct_lanes[j]. dest column (f, l) needs source (j(l'), f, pos of l'
    # in oct_lanes[j]) with l' = perm[l].
    pos_in_oct = np.zeros(512, np.int64)
    oct_of = np.zeros(512, np.int64)
    for j in range(8):
        for k, l2 in enumerate(oct_lanes[j]):
            pos_in_oct[l2] = k
            oct_of[l2] = j
    reasm = np.zeros(nf * 512, np.int64)
    for f in range(nf):
        for l in range(512):
            l2 = perm[l]
            j = oct_of[l2]
            reasm[f * 512 + l] = j * nf * 64 + f * 64 + pos_in_oct[l2]
    reasm = jnp.asarray(reasm)
    oct_cols = [jnp.asarray((np.arange(nf)[:, None] * 512
                             + oct_lanes[j][None]).reshape(-1))
                for j in range(8)]

    def build_oct(fs):
        packed = jnp.stack(list(fs), axis=1).reshape(T, nf * 512)
        parts = []
        for j in range(8):
            Pj = jnp.take(packed, oct_cols[j], axis=1)  # [T, nf*64]
            parts.append(jnp.take(Pj, dsrc[:, :, j].reshape(-1), axis=0))
        cat = jnp.concatenate(parts, axis=1)  # [R, 8*nf*64]
        S = jnp.take(cat, reasm, axis=1)  # [R, nf*512]
        return S.reshape(nc, Ud * nf, 8, 64)

    want = np.asarray(pb.build_table_dual(topo, fields))
    got = np.asarray(jax.jit(build_oct)(fields))
    ok1 = np.array_equal(got, want)
    print(f"build_oct bit-exact: {ok1}", flush=True)

    # ---- minmax_pl -------------------------------------------------------
    # For direction off, the neighbor's contributing plane in ITS row is the
    # OPPOSITE face; view = where(boundary_mask, roll(nbr_row, s_fix),
    # roll(self, s_in)). roll(nbr,s_fix) evaluated ON boundary lanes only
    # touches the 64 plane lanes p_d of the neighbor: dest boundary lane b
    # reads nbr lane b - s_fix (mod in-axis). Build static maps.
    from hnanosolver_tpu.ops.shifts import _DIRS, FACE_DIRS, d_of

    def minmax_pl(fs):
        ph = jnp.stack(list(fs))  # [nf, T, 512]
        packed = jnp.stack(list(fs), axis=1).reshape(T, nf * 512)
        mins = maxs = ph
        for off in FACE_DIRS:
            mask, s_in, s_fix = _DIRS[off]
            mnp = np.asarray(mask).reshape(-1)
            bl = np.nonzero(mnp)[0]  # 64 boundary lanes (dest)
            src_l = (bl - s_fix) % 512
            # neighbor plane columns in packed space, field-major
            pcols = jnp.asarray((np.arange(nf)[:, None] * 512
                                 + src_l[None]).reshape(-1))
            Pd = jnp.take(packed, pcols, axis=1)  # [T, nf*64] plane values
            g = jnp.take(Pd, topo.nbr[:, d_of(off)], axis=0)  # [T, nf*64]
            g = g.reshape(T, nf, 64).transpose(1, 0, 2)
            # scatter the 64 plane values onto the boundary lanes: build a
            # [nf, T, 512] view via static take of an index map with a
            # sentinel column for non-boundary lanes (values unused there)
            exp_idx = np.full(512, 0, np.int64)
            exp_idx[bl] = np.arange(64)
            ge = jnp.take(g, jnp.asarray(exp_idx), axis=2)  # [nf, T, 512]
            view = jnp.where(jnp.asarray(mnp), ge,
                             jnp.roll(ph, s_in, axis=-1))
            mins = jnp.minimum(mins, view)
            maxs = jnp.maximum(maxs, view)
            mins, packed = jax.lax.optimization_barrier((mins, packed))
        return mins, maxs

    ph = jnp.stack(fields)
    mn0, mx0 = sh.face_minmax_multi(topo, ph)
    lo0 = jnp.minimum(ph, mn0)
    hi0 = jnp.maximum(ph, mx0)
    mn1, mx1 = jax.jit(minmax_pl)(fields)
    ok2 = (np.array_equal(np.asarray(jnp.minimum(ph, mn1)), np.asarray(lo0))
           and np.array_equal(np.asarray(jnp.maximum(ph, mx1)),
                              np.asarray(hi0)))
    print(f"minmax_pl bit-exact: {ok2}", flush=True)
    if not (ok1 and ok2):
        return

    # ---- timing ----------------------------------------------------------
    def chain_tbl(build):
        @jax.jit
        def f(fs, k):
            def body(i, fs):
                t = build(fs)
                return [fs[0] + t[0, 0, 0, 0] * 1e-30] + list(fs[1:])
            return jax.lax.fori_loop(0, k, body, list(fs))[0]
        return f

    def chain_mm(mm):
        @jax.jit
        def f(fs, k):
            def body(i, fs):
                mn, mx = mm(fs)
                return [fs[0] + mn[0, 0, 0] * 1e-30 + mx[0, 0, 0] * 0.0] + \
                    list(fs[1:])
            return jax.lax.fori_loop(0, k, body, list(fs))[0]
        return f

    runs = {
        "build_oct": chain_tbl(build_oct),
        "xla_dual": chain_tbl(lambda fs: pb.build_table_dual(topo, fs)),
        "minmax_pl": chain_mm(minmax_pl),
        "minmax_old": chain_mm(
            lambda fs: sh.face_minmax_multi(topo, jnp.stack(list(fs)))),
    }
    for nm, f in runs.items():
        jax.block_until_ready(f(fields, jnp.asarray(1)))
        print(f"compiled {nm}", flush=True)

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
