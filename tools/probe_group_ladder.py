"""A/B: single-launch smaller-G scalar advection (new group ladder) vs the
field-batched form it replaces — interleaved, same window, bench domain.

Run: python tools/tpu_submit.py 0NN_gladder tools/probe_group_ladder.py 1800
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
    print(f"domain: {int(topo.n_active)} tiles, chunk U={topo.chunk_uniq.shape}",
          flush=True)

    inv_dx, dt = params.inv_voxel_size, params.dt
    scal = dict(state.scalars)

    def sample_args(sc):
        names = sorted(sc)
        fields = [state.velocity[0], state.velocity[1], state.velocity[2]] + [
            sc[k] for k in names]
        return names, fields

    # displacements as advection computes them (first trace)
    names, _ = sample_args(scal)

    @jax.jit
    def chain_new(sc, k):
        def body(_, sc):
            return adv.advect_scalars_fused(
                topo, state.velocity, sc, dt, inv_dx, fast="balanced")
        return jax.lax.fori_loop(0, k, body, sc)

    @jax.jit
    def chain_batched(sc, k):
        # emulate the replaced behavior: advect in 3+2 / 3+2 / 3+1 batches
        def body(_, sc):
            out = {}
            ns = sorted(sc)
            for lo in range(0, len(ns), 2):
                sub = {m: sc[m] for m in ns[lo:lo + 2]}
                out.update(adv.advect_scalars_fused(
                    topo, state.velocity, sub, dt, inv_dx, fast="balanced"))
            return out
        return jax.lax.fori_loop(0, k, body, sc)

    @jax.jit
    def chain_step(s, k):
        return jax.lax.fori_loop(
            0, k, lambda _, x: plume_step(topo, x, params, cfg), s)

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    for fn, arg in ((chain_new, scal), (chain_batched, scal),
                    (chain_step, state)):
        pull(fn(arg, jnp.asarray(2)))
    print("compiled", flush=True)

    # numerical identity check: both forms must produce identical fields
    a = chain_new(scal, jnp.asarray(1))
    b = chain_batched(scal, jnp.asarray(1))
    for k in a:
        err = float(jnp.max(jnp.abs(a[k] - b[k])))
        print(f"|new-batched| {k}: {err:.2e}", flush=True)

    def timed(fn, arg, k, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            pull(fn(arg, jnp.asarray(k)))
            best = min(best, time.perf_counter() - t0)
        return best

    for r in range(3):
        sn = (timed(chain_new, scal, 8) - timed(chain_new, scal, 2)) / 6
        sb = (timed(chain_batched, scal, 8) - timed(chain_batched, scal, 2)) / 6
        ss = (timed(chain_step, state, 8) - timed(chain_step, state, 2)) / 6
        print(f"round {r}: new={sn * 1e3:.2f}ms batched={sb * 1e3:.2f}ms "
              f"ratio={sb / sn:.2f}  full_step={ss * 1e3:.2f}ms", flush=True)


main()
