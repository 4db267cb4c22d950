"""On-chip check of the fused stencil kernels (ops/pallas_stencil.py):
compile, bitwise parity vs the XLA forms, interleaved A/B of a
div+subtract-gradient chain with STENCIL_KERNEL on/off.

Run: python tools/tpu_submit.py 111_stk tools/probe_stk.py 3600
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
    from hnanosolver_tpu.ops import pallas_stencil as ps
    from hnanosolver_tpu.ops import stencil as stn

    params = SolverParams(dt=1.0 / 24.0, iterations=50, voxel_size=0.5)
    cfg = PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    state = zeros_state(topo)
    for _ in range(2):
        state = plume_step(topo, state, params, cfg)
    jax.block_until_ready(state.velocity)
    print(f"domain: {int(topo.n_active)} tiles", flush=True)
    inv_dx = params.inv_voxel_size
    vel = state.velocity

    @jax.jit
    def kern(v):
        d = ps.divergence_fused(topo, v, inv_dx, interpret=False)
        return ps.subtract_gradient_fused(topo, v, d, inv_dx,
                                          interpret=False), d

    @jax.jit
    def xla(v):
        ps.STENCIL_KERNEL = False
        d = stn.divergence(topo, v, inv_dx)
        return stn.subtract_pressure_gradient(topo, v, d, inv_dx), d

    ps.STENCIL_KERNEL = False
    (va, da) = kern(vel)
    (vb, db) = xla(vel)
    eq = bool(jnp.array_equal(va, vb)) and bool(jnp.array_equal(da, db))
    print(f"parity on-chip: div {float(jnp.max(jnp.abs(da - db))):.3e} "
          f"vel {float(jnp.max(jnp.abs(va - vb))):.3e} bitwise={eq}",
          flush=True)
    assert eq

    def make_chain(on):
        ps.STENCIL_KERNEL = on

        @jax.jit
        def chain(v, k):
            def body(_, v):
                d = stn.divergence(topo, v, inv_dx)
                return stn.subtract_pressure_gradient(topo, v, d, inv_dx)
            return jax.lax.fori_loop(0, k, body, v)

        chain.lower(vel, jnp.asarray(2))
        return chain

    ch_on, ch_off = make_chain(True), make_chain(False)

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    for nm, ch in (("on", ch_on), ("off", ch_off)):
        pull(ch(vel, jnp.asarray(2)))
        print(f"compiled {nm}", flush=True)

    K_LO, K_HI, REPS = 2, 42, 3
    best = {"on": float("inf"), "off": float("inf")}
    for r in range(6):
        line = []
        for nm, ch in (("on", ch_on), ("off", ch_off)):
            ts = []
            for k in (K_LO, K_HI):
                bt = float("inf")
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    pull(ch(vel, jnp.asarray(k)))
                    bt = min(bt, time.perf_counter() - t0)
                ts.append(bt)
            s = (ts[1] - ts[0]) / (K_HI - K_LO)
            if s <= 0:
                s = ts[1] / K_HI
            best[nm] = min(best[nm], s)
            line.append(f"{nm}={s * 1e3:.2f}")
        print(f"round {r}: " + "  ".join(line), flush=True)
        time.sleep(10)

    print(f"best: on={best['on'] * 1e3:.3f} off={best['off'] * 1e3:.3f} "
          f"ratio={best['on'] / best['off']:.3f}", flush=True)
    out({"on_ms": round(best["on"] * 1e3, 3),  # noqa: F821
         "off_ms": round(best["off"] * 1e3, 3), "bitwise": eq})


main()
