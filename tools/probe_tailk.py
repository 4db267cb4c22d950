"""On-chip check of the fused BFECC tail kernel (ops/pallas_tail.py):
compile, bitwise parity vs the XLA bounds+clip forms, and interleaved A/B
of the full scalar advection pass with TAIL_KERNEL on/off.

Run: python tools/tpu_submit.py 107_tailk tools/probe_tailk.py 3600
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
    from hnanosolver_tpu.ops import shifts as sh
    from hnanosolver_tpu.ops import pallas_tail as pt

    params = SolverParams(dt=1.0 / 24.0, iterations=50, voxel_size=0.5)
    cfg = PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    state = zeros_state(topo)
    for _ in range(2):
        state = plume_step(topo, state, params, cfg)
    jax.block_until_ready(state.velocity)
    T = int(topo.capacity)
    print(f"domain: {int(topo.n_active)} tiles, cap {T}", flush=True)

    # --- 1. bitwise parity of the tail alone, on-chip ---
    names = sorted(state.scalars)
    F = len(names)
    phi0 = jnp.stack([state.scalars[k] for k in names])
    rng = np.random.default_rng(0)
    pf = phi0 + jnp.asarray(
        0.05 * rng.normal(size=phi0.shape).astype(np.float32))
    pb = phi0 + jnp.asarray(
        0.05 * rng.normal(size=phi0.shape).astype(np.float32))

    @jax.jit
    def tail_kernel(phi0, pf, pb):
        return pt.bfecc_tail_fused(topo, phi0, pf, pb, interpret=False)

    @jax.jit
    def tail_xla(phi0, pf, pb):
        mins, maxs = sh.face_minmax_multi(topo, phi0)
        lo = jnp.minimum(jnp.minimum(phi0, mins), pf)
        hi = jnp.maximum(jnp.maximum(phi0, maxs), pf)
        return jnp.clip(pf + 0.5 * (phi0 - pb), lo, hi)

    a = tail_kernel(phi0, pf, pb)
    b = tail_xla(phi0, pf, pb)
    d = float(jnp.max(jnp.abs(a - b)))
    eq = bool(jnp.array_equal(a, b))
    print(f"tail parity on-chip: max|d|={d:.3e} bitwise_equal={eq}",
          flush=True)
    assert eq, d

    # --- 2. full scalar pass A/B, interleaved ---
    inv_dx = params.inv_voxel_size
    dt = params.dt
    scal = dict(state.scalars)

    def make_chain(tail_on):
        pt.TAIL_KERNEL = tail_on

        @jax.jit
        def chain(sc, k):
            def body(_, sc):
                return adv.advect_scalars_fused(
                    topo, state.velocity, sc, dt, inv_dx, fast="balanced")
            return jax.lax.fori_loop(0, k, body, sc)

        # force trace NOW while the flag is set
        chain.lower(scal, jnp.asarray(2))
        return chain

    ch_on = make_chain(True)
    ch_off = make_chain(False)
    pt.TAIL_KERNEL = True

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    for nm, ch in (("on", ch_on), ("off", ch_off)):
        t0 = time.perf_counter()
        pull(ch(scal, jnp.asarray(2)))
        print(f"compiled {nm} ({time.perf_counter() - t0:.0f} s)", flush=True)

    # value parity of the full pass
    va = ch_on(scal, jnp.asarray(1))
    vb = ch_off(scal, jnp.asarray(1))
    dd = max(float(jnp.max(jnp.abs(va[k] - vb[k]))) for k in names)
    print(f"full-pass parity: max|d|={dd:.3e}", flush=True)

    K_LO, K_HI, REPS, ROUNDS = 2, 22, 3, 6
    best = {"on": float("inf"), "off": float("inf")}
    for r in range(ROUNDS):
        line = []
        for nm, ch in (("on", ch_on), ("off", ch_off)):
            ts = []
            for k in (K_LO, K_HI):
                bt = float("inf")
                for _ in range(REPS):
                    t0 = time.perf_counter()
                    pull(ch(scal, jnp.asarray(k)))
                    bt = min(bt, time.perf_counter() - t0)
                ts.append(bt)
            s = (ts[1] - ts[0]) / (K_HI - K_LO)
            if s <= 0:
                s = ts[1] / K_HI
            best[nm] = min(best[nm], s)
            line.append(f"{nm}={s * 1e3:.2f}")
        print(f"round {r}: " + "  ".join(line), flush=True)
        time.sleep(10)

    print(f"best: on={best['on'] * 1e3:.2f} ms off={best['off'] * 1e3:.2f} ms"
          f" ratio={best['on'] / best['off']:.3f}", flush=True)
    out({"on_ms": round(best["on"] * 1e3, 3),  # noqa: F821
         "off_ms": round(best["off"] * 1e3, 3),
         "parity": dd, "bitwise": eq})


main()
