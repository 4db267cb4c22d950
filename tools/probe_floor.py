"""Find the ~18 ms floor of the balanced scalar advection at bench size.

probe 042 (wdecomp): full ~= noW ~= strict, dot1 only ~12% faster — the
pass is bound by work every variant shares. Candidates, isolated here:

  full      — advect_scalars_fused balanced (the baseline chain)
  tbl       — build_table (pack+gather) + lane pad ONLY (the XLA side)
  kern      — megakernel launches on a PREBUILT fixed table (everything
              in-kernel: assembly, combine16, B build, weights, dots,
              limiter, out writes)
  kern_noasm— kern with _assemble_stbl patched to one row copy
              (isolates the serial G*27 dynamic-slice copy loop)
  kern_nocmb— kern with _combine_window16 patched to one window row
              (isolates the 16^3-window roll ladder)
  kern_nolim— kern built with minmax=False (isolates _face_minmax)

Reading: full - (tbl + kern) ~ 0 sanity; the largest kern - kern_noX gap
names the in-kernel floor. Chain slopes (k=9 vs k=3) cancel dispatch.

Run: python tools/tpu_submit.py 0NN_floor tools/probe_floor.py 1800
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

    import bench
    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.models.plume import PlumeConfig, plume_step
    from hnanosolver_tpu.ops import advection as adv
    from hnanosolver_tpu.ops import pallas_bfecc as pb

    params = SolverParams(dt=1.0 / 24.0, iterations=50, voxel_size=0.5)
    cfg = PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    state = zeros_state(topo)
    for _ in range(2):
        state = plume_step(topo, state, params, cfg)
    jax.block_until_ready(state.velocity)
    inv_dx, dt = params.inv_voxel_size, params.dt
    sdt = dt * inv_dx
    scal = dict(state.scalars)
    names = sorted(scal)
    vel = state.velocity
    base = [vel[0], vel[1], vel[2]] + [scal[k] for k in names]
    nf_all = len(base)
    T = topo.capacity
    nc, U = topo.chunk_uniq.shape
    C = T // nc
    prec, win, f_lo = "balanced", 16, 3
    hbm = True

    g = min(pb._group_cap(f_lo, win), C)
    while g >= 8 and (pb._vmem_need(U, nf_all, g, win, hbm)
                      + pb._stack_need(g, win, nf_all - f_lo, prec)
                      ) > pb.SAFE_VMEM:
        g //= 2
    print(f"domain: {int(topo.n_active)} tiles, T={T} nc={nc} U={U} C={C} "
          f"nf={nf_all} G={g}", flush=True)

    dx = adv._clamp(-vel[0] * sdt)
    dy = adv._clamp(-vel[1] * sdt)
    dz = adv._clamp(-vel[2] * sdt)
    jax.block_until_ready((dx, dy, dz))

    # --- variant: full (the shipped chain) -------------------------------
    @jax.jit
    def full(v, s, k):
        def body(_, c):
            v, s = c
            return v, adv.advect_scalars_fused(topo, v, s, dt, inv_dx,
                                               fast="balanced")
        return jax.lax.fori_loop(0, k, body, (v, s))[1]

    # --- variant: tbl (pack + gather + pad only) -------------------------
    @jax.jit
    def tblonly(fields, k):
        def body(i, fs):
            t = pb.build_table(topo, fs)
            t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, 64)))
            # feed a scalar of t back into field 0 to chain iterations
            eps = t[0, 0, 0, 0] * 1e-30
            return [fs[0] + eps] + list(fs[1:])
        return jax.lax.fori_loop(0, k, body, list(fields))[0]

    # --- kernel-only variants on a prebuilt fixed table ------------------
    tbl = pb.build_table(topo, base)
    tbl = jnp.pad(tbl, ((0, 0), (0, 0), (0, 0), (0, 64)))
    jax.block_until_ready(tbl)

    def kern_maker(minmax):
        fn = pb._build(nc, U, C, T, nf_all, nf_all, f_lo, False, float(sdt),
                       False, prec, win, minmax, hbm, g)

        @jax.jit
        def kern(dx, dy, dz, tblv, k):
            def body(i, dxc):
                out = fn(topo.chunk_lnbr, dxc, dy, dz, tblv)
                o0 = out[0] if minmax else out
                return dxc + o0[0, 0, 0] * 1e-30
            return jax.lax.fori_loop(0, k, body, dx)
        return kern

    real_asm, real_cmb = pb._assemble_stbl, pb._combine_window16

    def noasm(G, nf, lnbr_ref, tbl_ref, stbl):
        row = tbl_ref[0, pl.ds(0, nf)]
        if row.shape[-1] == 128:
            row = row[..., :64]
        stbl[0, pl.ds(0, nf)] = row

    def nocmb(nf, stbl, wtbl):
        wtbl[:, 0:nf] = stbl[:, 0:nf]

    chains = {}
    for name, asm, cmb, minmax in (
        ("kern", real_asm, real_cmb, True),
        ("kern_noasm", noasm, real_cmb, True),
        ("kern_nocmb", real_asm, nocmb, True),
        ("kern_nolim", real_asm, real_cmb, False),
    ):
        pb._assemble_stbl, pb._combine_window16 = asm, cmb
        pb._build.cache_clear()
        fn = kern_maker(minmax)
        try:
            jax.block_until_ready(fn(dx, dy, dz, tbl, jnp.asarray(1)))
            chains[name] = fn
            print(f"compiled {name}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    pb._assemble_stbl, pb._combine_window16 = real_asm, real_cmb
    pb._build.cache_clear()

    jax.block_until_ready(full(vel, scal, jnp.asarray(1)))
    print("compiled full", flush=True)
    jax.block_until_ready(tblonly(base, jnp.asarray(1)))
    print("compiled tbl", flush=True)

    def t(fn, args, k):
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args, jnp.asarray(k)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    timed = [("full", full, (vel, scal)), ("tbl", tblonly, (base,))]
    timed += [(n, f, (dx, dy, dz, tbl)) for n, f in chains.items()]
    for r in range(3):
        line = []
        for name, fn, args in timed:
            s = (t(fn, args, 9) - t(fn, args, 3)) / 6
            line.append(f"{name}={s * 1e3:.2f}ms")
        print(f"round {r}: " + "  ".join(line), flush=True)


main()
