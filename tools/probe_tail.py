"""Decompose the DUAL-config scalar advection (probe 048: ~19.7 ms):
  build   — dual table build (known ~6.4 ms)
  kern    — dual megakernel on a prebuilt table
  minmax  — XLA limiter bounds (face_minmax_multi + self min/max)
  tailm   — the remaining XLA math (stack, corrs, clip) on fixed inputs
If build+kern+minmax+tailm ~ full, the breakdown is complete and the
next target is whichever dominates.

Run: python tools/tpu_submit.py 0NN_tail tools/probe_tail.py 1200
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
    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.models.plume import PlumeConfig, plume_step
    from hnanosolver_tpu.ops import advection as adv
    from hnanosolver_tpu.ops import pallas_bfecc as pb
    from hnanosolver_tpu.ops import shifts as sh

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
    nc = topo.chunk_dsrc.shape[0]
    Ud = topo.chunk_dsrc.shape[1]
    C = T // nc
    prec, win, f_lo = "balanced", 16, 3
    g = min(pb._group_cap(f_lo, win), C)
    while g >= 8 and (pb._vmem_need(Ud, nf_all, g, win, True, True)
                      + pb._stack_need(g, win, nf_all - f_lo, prec)
                      ) > pb.SAFE_VMEM:
        g //= 2
    print(f"domain {int(topo.n_active)} tiles, dual G={g}", flush=True)

    dx = adv._clamp(-vel[0] * sdt)
    dy = adv._clamp(-vel[1] * sdt)
    dz = adv._clamp(-vel[2] * sdt)
    tbl = jnp.pad(pb.build_table_dual(topo, base),
                  ((0, 0), (0, 0), (0, 0), (0, 64)))
    phi0s = jnp.stack([scal[k] for k in names])
    fn = pb._build(nc, Ud, C, T, nf_all, nf_all, f_lo, False, float(sdt),
                   False, prec, win, False, True, g, True)
    out0 = fn(topo.chunk_ldual, dx, dy, dz, tbl)
    pf0 = out0[:, :5, :].transpose(1, 0, 2)
    pb0 = out0[:, 5:, :].transpose(1, 0, 2)
    mn0, mx0 = sh.face_minmax_multi(topo, phi0s)
    jax.block_until_ready((tbl, phi0s, pf0, pb0, mn0, mx0))

    @jax.jit
    def full(v, s, k):
        def body(_, c):
            v, s = c
            return v, adv.advect_scalars_fused(topo, v, s, dt, inv_dx,
                                               fast="balanced")
        return jax.lax.fori_loop(0, k, body, (v, s))[1]

    @jax.jit
    def build(fs, k):
        def body(i, fs):
            t = pb.build_table_dual(topo, fs)
            return [fs[0] + t[0, 0, 0, 0] * 1e-30] + list(fs[1:])
        return jax.lax.fori_loop(0, k, body, list(fs))[0]

    @jax.jit
    def kern(dxv, tblv, k):
        def body(i, dxc):
            o = fn(topo.chunk_ldual, dxc, dy, dz, tblv)
            return dxc + o[0, 0, 0] * 1e-30
        return jax.lax.fori_loop(0, k, body, dxv)

    @jax.jit
    def minmax(ph, k):
        def body(i, ph):
            mn, mx = sh.face_minmax_multi(topo, ph)
            lo = jnp.minimum(ph, mn)
            return ph + lo[0, 0, 0] * 1e-30 + mx[0, 0, 0] * 0.0
        return jax.lax.fori_loop(0, k, body, ph)

    @jax.jit
    def tailm(pf, pbk, ph, lo, hi, k):
        def body(i, ph):
            corrs = pf + 0.5 * (ph - pbk)
            cl = jnp.clip(corrs, jnp.minimum(lo, pf), jnp.maximum(hi, pf))
            return ph + cl[0, 0, 0] * 1e-30
        return jax.lax.fori_loop(0, k, body, ph)

    runs = {
        "full": (full, (vel, scal)),
        "build": (build, (base,)),
        "kern": (kern, (dx, tbl)),
        "minmax": (minmax, (phi0s,)),
        "tailm": (tailm, (pf0, pb0, phi0s, mn0, mx0)),
    }
    for name, (f, a) in runs.items():
        jax.block_until_ready(f(*a, jnp.asarray(1)))
        print(f"compiled {name}", flush=True)

    def t(f, a, k):
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*a, jnp.asarray(k)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for r in range(3):
        line = []
        for name, (f, a) in runs.items():
            s = (t(f, a, 13) - t(f, a, 3)) / 10
            line.append(f"{name}={s * 1e3:.2f}ms")
        print(f"round {r}: " + "  ".join(line), flush=True)


main()
