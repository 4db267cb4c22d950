"""Z-neighbor gathers as masked contiguous row-shifts.

Sorted packed keys make the z+ neighbor of row t sit at row t+1 whenever it
exists (keys are unique ints and pack(x,y,z+1) == key+1), so the z+/z- rows
of every face gather can be a roll along rows + a [T,1] mask select — zero
gather descriptors, bytes at contiguous-copy speed instead of the ~190 GB/s
gather path (NOTES facts 29/33). Measures, at bench topology:

  a) host contiguity: count of active rows where nbr_z+ not in {0, t+1}
     (must be 0 away from the +-512-tile coordinate extreme);
  b) pressure halo block: take(p, nbr6) [6T rows] vs take(p, nbr4) + 2
     masked rolls — bit-exact + chain slope;
  c) face_views_multi F=8: shipped vs z-roll variant — bit-exact + slope.

Run: python tools/tpu_submit.py 093_zroll tools/probe_zroll.py 900
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
    from hnanosolver_tpu.core.layout import TILE
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.ops import shifts as sh
    from hnanosolver_tpu.ops.shifts import _DIRS, FACE_DIRS, d_of

    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    T = int(topo.capacity)
    rng = np.random.default_rng(7)

    # ---- a) host contiguity ---------------------------------------------
    nbr_np = np.asarray(topo.nbr)
    i = np.arange(T)
    zp = nbr_np[:, d_of((0, 0, 1))]
    zm = nbr_np[:, d_of((0, 0, -1))]
    bad_p = int(np.sum((zp != 0) & (zp != i + 1)))
    bad_m = int(np.sum((zm != 0) & (zm != i - 1)))
    frac_p = float(np.mean(zp[1 : n + 1] == i[1 : n + 1] + 1))
    print(f"T={T} n={n} bad_zp={bad_p} bad_zm={bad_m} frac_contig={frac_p:.3f}",
          flush=True)
    if bad_p or bad_m:
        print("CONTIGUITY VIOLATED — abort", flush=True)
        return

    okp = jnp.asarray((zp == i + 1)[:, None])  # [T,1] bool
    okm = jnp.asarray((zm == i - 1)[:, None])

    # ---- b) pressure halo block -----------------------------------------
    p = jnp.asarray(rng.standard_normal((T, TILE)).astype(np.float32)).at[0].set(0.0)
    nbr6 = jnp.concatenate([topo.nbr[:, d_of(off)] for off in FACE_DIRS])
    # FACE_DIRS order: x+, x-, y+, y-, z+, z-  (z last two)
    nbr4 = nbr6[: 4 * T]

    def faces_take(p):
        return jnp.take(p, nbr6, axis=0).reshape(6, T, TILE)

    def faces_zroll(p):
        f4 = jnp.take(p, nbr4, axis=0).reshape(4, T, TILE)
        fzp = jnp.where(okp, jnp.roll(p, -1, axis=0), p[0])
        fzm = jnp.where(okm, jnp.roll(p, 1, axis=0), p[0])
        return jnp.concatenate([f4, fzp[None], fzm[None]], axis=0)

    a = np.asarray(jax.jit(faces_take)(p))
    b = np.asarray(jax.jit(faces_zroll)(p))
    ok_b = np.array_equal(a, b)
    print(f"halo zroll bit-exact: {ok_b}", flush=True)

    # ---- c) face_views_multi F=8 ----------------------------------------
    F = 8
    fields = jnp.asarray(rng.standard_normal((F, T, TILE)).astype(np.float32))
    fields = fields.at[:, 0].set(0.0)

    def fvm_zroll(fields):
        packed = jnp.moveaxis(fields, 0, 1).reshape(T, F * TILE)
        cols4 = jnp.concatenate(
            [topo.nbr[:, d_of(off)] for off in FACE_DIRS[:4]])
        nbr = jnp.take(packed, cols4, axis=0).reshape(4, T, F, TILE)
        nzp = jnp.where(okp, jnp.roll(packed, -1, axis=0), packed[0])
        nzm = jnp.where(okm, jnp.roll(packed, 1, axis=0), packed[0])
        nbr = jnp.concatenate(
            [nbr, nzp.reshape(1, T, F, TILE), nzm.reshape(1, T, F, TILE)], 0)
        nbr = jnp.moveaxis(nbr, 2, 1)  # [6,F,T,512]
        views = []
        for k, off in enumerate(FACE_DIRS):
            mask, s_in, s_fix = _DIRS[off]
            views.append(jnp.where(mask, jnp.roll(nbr[k], s_fix, axis=-1),
                                   jnp.roll(fields, s_in, axis=-1)))
        return jnp.stack(views)

    w = np.asarray(jax.jit(lambda f: sh.face_views_multi(topo, f))(fields))
    g = np.asarray(jax.jit(fvm_zroll)(fields))
    ok_c = np.array_equal(w, g)
    print(f"fvm zroll bit-exact: {ok_c}", flush=True)
    if not (ok_b and ok_c):
        return

    # ---- timing (chain slope) -------------------------------------------
    def chain(fn, x0):
        @jax.jit
        def f(x, k):
            def body(_, x):
                # barrier forces the full result to materialize (it is a
                # pallas operand in real use); without it XLA DCEs the
                # gather down to one element
                t = jax.lax.optimization_barrier(fn(x))
                return x + t.reshape(-1)[0].reshape(1, 1) * 1e-30
            return jax.lax.fori_loop(0, k, body, x)
        return f

    def slope(cf, x, ks=(8, 40)):
        outs = {}
        for k in ks:
            cf(x, k).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(3):
                cf(x, k).block_until_ready()
            outs[k] = (time.perf_counter() - t0) / 3
        k0, k1 = ks
        return (outs[k1] - outs[k0]) / (k1 - k0) * 1e3  # ms per iter

    for name, fn, x in [
        ("halo_take", faces_take, p),
        ("halo_zroll", faces_zroll, p),
    ]:
        ms = slope(chain(fn, x), x)
        print(f"{name}: {ms:.4f} ms/block", flush=True)

    def chainf(fn):
        @jax.jit
        def f(x, k):
            def body(_, x):
                t = jax.lax.optimization_barrier(fn(x))
                return x + t.reshape(-1)[0].reshape(1, 1, 1) * 1e-30
            return jax.lax.fori_loop(0, k, body, x)
        return f

    def slopef(cf, x, ks=(8, 40)):
        outs = {}
        for k in ks:
            cf(x, k).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(3):
                cf(x, k).block_until_ready()
            outs[k] = (time.perf_counter() - t0) / 3
        k0, k1 = ks
        return (outs[k1] - outs[k0]) / (k1 - k0) * 1e3

    for name, fn in [
        ("fvm_take", lambda f: sh.face_views_multi(topo, f)),
        ("fvm_zroll", fvm_zroll),
    ]:
        ms = slopef(chainf(fn), fields)
        print(f"{name}: {ms:.4f} ms/call", flush=True)


out = main()
