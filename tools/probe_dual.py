"""Dual (half-shifted) table vs 27-table megakernel at bench size, on-chip:
compile check, bit-exactness, and interleaved chain-slope timing of the
scalar pass, the velocity pass, and the full step.

The dual design (probe r4/044 follow-up): window combine runs as XLA
(build_table_dual), the kernel assembles 8 rows/tile instead of 27 + a
5-6 ms roll ladder, and limiter bounds come from the XLA face stencil.

Run: python tools/tpu_submit.py 0NN_dual tools/probe_dual.py 1800
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
    scal = dict(state.scalars)
    vel = state.velocity
    Ud = topo.chunk_dsrc.shape[1]
    U27 = topo.chunk_uniq.shape[1]
    print(f"domain: {int(topo.n_active)} tiles, U27={U27} Ud={Ud}",
          flush=True)

    def make_scal(tier):
        @jax.jit
        def chain(v, s, k):
            def body(_, c):
                v, s = c
                return v, adv.advect_scalars_fused(topo, v, s, dt, inv_dx,
                                                   fast=tier)
            return jax.lax.fori_loop(0, k, body, (v, s))[1]
        return chain

    def make_vel():
        @jax.jit
        def chain(v, k):
            def body(_, v):
                return adv.advect_velocity(topo, v, dt, inv_dx,
                                           fast="balanced")
            return jax.lax.fori_loop(0, k, body, v)
        return chain

    def make_step():
        @jax.jit
        def chain(s, k):
            def body(_, s):
                return plume_step(topo, s, params, cfg)
            return jax.lax.fori_loop(0, k, body, s)
        return chain

    chains = {}
    outs = {}
    for mode, flag in (("dual", True), ("old", False)):
        pb.DUAL_TBL = flag
        pb._build.cache_clear()
        cs, cv, cst = make_scal("balanced"), make_vel(), make_step()
        try:
            outs[mode] = jax.block_until_ready(cs(vel, scal, jnp.asarray(1)))
            vout = jax.block_until_ready(cv(vel, jnp.asarray(1)))
            outs[mode + "_v"] = vout
            jax.block_until_ready(cst(state, jnp.asarray(1)))
            chains[mode] = (cs, cv, cst)
            print(f"compiled {mode}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{mode} FAILED: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
    pb.DUAL_TBL = None
    if len(chains) == 2:
        d = max(float(jnp.max(jnp.abs(outs["dual"][k] - outs["old"][k])))
                for k in outs["dual"])
        dv = float(jnp.max(jnp.abs(outs["dual_v"] - outs["old_v"])))
        print(f"|dual-old| scalars={d:.2e} velocity={dv:.2e}", flush=True)

    def t(fn, args, k):
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args, jnp.asarray(k)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for r in range(3):
        line = []
        for mode, (cs, cv, cst) in chains.items():
            ss = (t(cs, (vel, scal), 9) - t(cs, (vel, scal), 3)) / 6
            sv = (t(cv, (vel,), 9) - t(cv, (vel,), 3)) / 6
            st = (t(cst, (state,), 6) - t(cst, (state,), 2)) / 4
            line.append(f"{mode}: scal={ss*1e3:.2f} vel={sv*1e3:.2f} "
                        f"step={st*1e3:.2f}")
        print(f"round {r}: " + "   ".join(line), flush=True)


main()
