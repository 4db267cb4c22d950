"""Advection-tail decomposition (round 4): where does the scalar pass go
AFTER the dual-table rework — sampling vs bounds vs limit vs table build —
plus vorticity/combustion shares of the step. Long chains (2 vs 20),
min-of-rounds, all cases interleaved per round so same-window ratios hold
under congestion.

Run: python tools/tpu_submit.py 106_tail tools/probe_tail4.py 3600
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

import json  # noqa: E402
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
    from hnanosolver_tpu.ops import stencil as stn
    from hnanosolver_tpu.ops import combustion as comb
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
    print(f"domain: {int(topo.n_active)} tiles, cap {int(topo.capacity)}",
          flush=True)

    inv_dx = params.inv_voxel_size
    dt = params.dt
    sdt = dt * inv_dx
    names = sorted(state.scalars)
    fields0 = [state.scalars[k] for k in names]
    vel = state.velocity
    c = params.combustion

    def dev(x, k, f):
        """thread k-dependence through a cheap perturbation of x"""
        return jax.tree_util.tree_map(lambda a: a + 0.0 * f, x)

    @jax.jit
    def ch_scal_full(sc, k):
        def body(_, sc):
            return adv.advect_scalars_fused(topo, vel, sc, dt, inv_dx,
                                            fast="balanced")
        return jax.lax.fori_loop(0, k, body, sc)

    @jax.jit
    def ch_sample_only(sc, k):
        # sampling passes WITHOUT bounds/limit: pf+pb summed
        def body(_, sc):
            fields = [sc[kk] for kk in names]
            pf, pbk, _ = adv._advect_chunked(
                topo, vel, fields, sdt, None, adv.DEFAULT_CHUNK, 1,
                adv.INTERP, "balanced")
            o = pf + 0.125 * pbk
            return {kk: o[i] for i, kk in enumerate(names)}
        return jax.lax.fori_loop(0, k, body, sc)

    @jax.jit
    def ch_bounds(sc, k):
        def body(_, sc):
            phi0s = jnp.stack([sc[kk] for kk in names])
            mins, maxs = sh.face_minmax_multi(topo, phi0s)
            o = mins + 0.125 * maxs
            return {kk: o[i] for i, kk in enumerate(names)}
        return jax.lax.fori_loop(0, k, body, sc)

    @jax.jit
    def ch_table_dual(sc, k):
        def body(_, sc):
            fields = [vel[0], vel[1], vel[2]] + [sc[kk] for kk in names]
            t = pb.build_table_dual(topo, fields)
            o = jnp.mean(t, axis=(0, 2, 3))[: len(names)]
            return {kk: sc[kk] + 1e-30 * o[i] for i, kk in enumerate(names)}
        return jax.lax.fori_loop(0, k, body, sc)

    @jax.jit
    def ch_vort(v, k):
        def body(_, v):
            return stn.vorticity_confinement(topo, v, dt, inv_dx,
                                             c.vorticity_scale,
                                             c.factor_scale)
        return jax.lax.fori_loop(0, k, body, v)

    @jax.jit
    def ch_comb(sc, k):
        def body(_, sc):
            d = jnp.zeros_like(sc["fuel"])
            fuel, waste, temp, flame, d = comb.combustion_oxygen(
                sc["fuel"], sc["waste"], sc["temperature"], sc["flame"], d,
                c.temperature_release, c.expansion_rate)
            o = dict(sc)
            o.update(fuel=fuel, waste=waste,
                     temperature=temp + 1e-30 * jnp.mean(d), flame=flame)
            return o
        return jax.lax.fori_loop(0, k, body, sc)

    sc0 = dict(state.scalars)
    cases = [
        ("scal_full", ch_scal_full, sc0),
        ("sample_only", ch_sample_only, sc0),
        ("bounds", ch_bounds, sc0),
        ("table_dual", ch_table_dual, sc0),
        ("vort", ch_vort, vel),
        ("combustion", ch_comb, sc0),
    ]

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    for name, fn, arg in cases:
        t0 = time.perf_counter()
        pull(fn(arg, jnp.asarray(2)))
        print(f"compiled {name} ({time.perf_counter() - t0:.0f} s)",
              flush=True)

    K_LO, K_HI, REPS, ROUNDS = 2, 22, 3, 6

    def best_t(fn, arg, k):
        b = float("inf")
        kk = jnp.asarray(k)
        for _ in range(REPS):
            t0 = time.perf_counter()
            pull(fn(arg, kk))
            b = min(b, time.perf_counter() - t0)
        return b

    best = {name: float("inf") for name, _, _ in cases}
    for r in range(ROUNDS):
        line = []
        for name, fn, arg in cases:
            t_lo = best_t(fn, arg, K_LO)
            t_hi = best_t(fn, arg, K_HI)
            s = (t_hi - t_lo) / (K_HI - K_LO)
            if s <= 0:
                s = t_hi / K_HI
            best[name] = min(best[name], s)
            line.append(f"{name}={s * 1e3:.2f}")
        print(f"round {r}: " + "  ".join(line), flush=True)
        time.sleep(15)

    print("best (ms): " + "  ".join(
        f"{n}={v * 1e3:.2f}" for n, v in best.items()), flush=True)
    out({k: round(v * 1e3, 3) for k, v in best.items()})  # noqa: F821


main()
