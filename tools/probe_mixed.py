"""Mixed-window BFECC branch (back pass narrow/dual, XLA re-trace, forward
pass wide) vs the fused wide kernel, at bench size on the real chip:
compile-check (Mosaic may reject what interpret accepts), tolerance check,
and chain timing for both the scalar (f_lo=3) and velocity (f_lo=0) passes.

Run: python tools/tpu_submit.py 078_mixed tools/probe_mixed.py 1200
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
    print(f"domain {int(topo.n_active)} tiles", flush=True)

    # scale velocity so sdt*max|u| lands mid-band (~2.6)
    amax = float(jnp.max(jnp.abs(vel))) * sdt
    vel = vel * (2.6 / amax)
    base = [vel[0], vel[1], vel[2]] + [scal[k] for k in names]
    lim = pb.DISP_LIMIT

    def mk(f_lo, prec):
        flds = tuple(base)

        @jax.jit
        def wide(dx, dy, dz, k):
            def body(i, dxc):
                pf, pbk = pb.bfecc_sample_fused(
                    topo, list(flds), dxc, dy, dz, sdt, f_lo, None, prec,
                    win=24)
                return dxc + pf[0] * 1e-30
            return jax.lax.fori_loop(0, k, body, dx)

        @jax.jit
        def mixed(dx, dy, dz, k):
            def body(i, dxc):
                backs = pb.bfecc_sample_fused(
                    topo, list(flds), dxc, dy, dz, sdt, 0, None, prec,
                    win=16, mode="back")[0]
                d2x = jnp.clip(dxc + backs[0] * sdt, -lim, lim)
                d2y = jnp.clip(dy + backs[1] * sdt, -lim, lim)
                d2z = jnp.clip(dz + backs[2] * sdt, -lim, lim)
                phib = pb.bfecc_sample_fused(
                    topo, list(flds), d2x, d2y, d2z, sdt, f_lo, None, prec,
                    win=24, mode="fwd")[0]
                return dxc + (backs[f_lo] + phib[0]) * 1e-30
            return jax.lax.fori_loop(0, k, body, dx)

        @jax.jit
        def wide_out(dx, dy, dz):
            pf, pbk = pb.bfecc_sample_fused(
                topo, list(flds), dx, dy, dz, sdt, f_lo, None, prec, win=24)
            return jnp.stack(pf), jnp.stack(pbk)

        @jax.jit
        def mixed_out(dx, dy, dz):
            backs = pb.bfecc_sample_fused(
                topo, list(flds), dx, dy, dz, sdt, 0, None, prec,
                win=16, mode="back")[0]
            d2x = jnp.clip(dx + backs[0] * sdt, -lim, lim)
            d2y = jnp.clip(dy + backs[1] * sdt, -lim, lim)
            d2z = jnp.clip(dz + backs[2] * sdt, -lim, lim)
            phib = pb.bfecc_sample_fused(
                topo, list(flds), d2x, d2y, d2z, sdt, f_lo, None, prec,
                win=24, mode="fwd")[0]
            return jnp.stack(backs[f_lo:]), jnp.stack(phib)

        return wide, mixed, wide_out, mixed_out

    dx = adv._clamp(-vel[0] * sdt)
    dy = adv._clamp(-vel[1] * sdt)
    dz = adv._clamp(-vel[2] * sdt)
    print(f"cfl={float(jnp.max(jnp.abs(jnp.stack([dx, dy, dz])))):.3f}",
          flush=True)

    for f_lo, tag in ((3, "scal"), (0, "vel")):
        for prec in ("balanced",):
            wide, mixed, wide_out, mixed_out = mk(f_lo, prec)
            try:
                wf, wb = jax.block_until_ready(wide_out(dx, dy, dz))
                mf, mb = jax.block_until_ready(mixed_out(dx, dy, dz))
            except Exception as e:  # noqa: BLE001
                print(f"{tag}/{prec}: COMPILE FAIL {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
                continue
            ef = float(jnp.max(jnp.abs(wf - mf)))
            eb = float(jnp.max(jnp.abs(wb - mb)))
            print(f"{tag}/{prec}: err back-sample={ef:.2e} fwd={eb:.2e}",
                  flush=True)
            jax.block_until_ready(wide(dx, dy, dz, jnp.asarray(1)))
            jax.block_until_ready(mixed(dx, dy, dz, jnp.asarray(1)))

            def t(f, k):
                ts = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    jax.block_until_ready(f(dx, dy, dz, jnp.asarray(k)))
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            for r in range(3):
                sw = (t(wide, 13) - t(wide, 3)) / 10
                sm = (t(mixed, 13) - t(mixed, 3)) / 10
                print(f"{tag}/{prec} round {r}: wide={sw * 1e3:.2f}ms "
                      f"mixed={sm * 1e3:.2f}ms ratio={sm / sw:.2f}",
                      flush=True)


main()
