"""Radius-256 (full 1024^3, ~269k tiles) single-chip fit probe — VERDICT r3
item 4. Round 3 measured this envelope 430 MB over HBM, bound by the
advection limiter transients (NOTES fact 26); round 4's fused block
limiter (_bfecc_limit_blocks: bounds + correction + clip per row block)
removes the field-sized lo/hi/corr transients. This probe compiles and
RUNS full steps at radius 256 and reports step time + divergence/residual.

Run: python tools/tpu_submit.py 104_sc256 tools/probe_sc256.py 3600
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


def plume_envelope(radius_vox, height_vox=1024, cx=512, cz=512):
    from hnanosolver_tpu.core import coords as C

    r_t = radius_vox // C.LEAF
    h_t = height_vox // C.LEAF
    cxt, czt = cx // C.LEAF, cz // C.LEAF
    tiles = []
    for y in range(h_t):
        rr = r_t * (0.6 + 0.4 * y / max(h_t - 1, 1))
        for x in range(cxt - r_t, cxt + r_t + 1):
            for z in range(czt - r_t, czt + r_t + 1):
                if (x - cxt) ** 2 + (z - czt) ** 2 <= rr * rr:
                    tiles.append((x, y, z))
    return np.array(tiles, np.int32)


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.models.plume import PlumeConfig, _plume_step
    from hnanosolver_tpu.ops.stencil import divergence

    tiles = plume_envelope(256)
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    voxels = int(topo.num_voxels)
    print(f"domain {int(topo.n_active)} tiles = {voxels / 1e6:.1f} M voxels "
          f"(capacity {int(topo.capacity)})", flush=True)

    cfg = PlumeConfig(center=(512.0, 96.0, 512.0), radius=80.0,
                      velocity_jet=8.0)
    p_rb = SolverParams(dt=1.0 / 24.0, voxel_size=0.5, iterations=50)

    step = functools.partial(
        jax.jit, static_argnames=("params", "cfg"), donate_argnums=(1,)
    )(lambda t, s, k, params, cfg: jax.lax.fori_loop(
        0, k, lambda _, x: _plume_step(t, x, params, cfg, ()), s))

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    st = zeros_state(topo)
    t0 = time.perf_counter()
    st = step(topo, st, jnp.asarray(2), p_rb, cfg)
    pull(st)
    print(f"develop 2 steps (incl. compile): {time.perf_counter() - t0:.1f} s",
          flush=True)

    # chain-slope sample x3 rounds
    best = float("inf")
    for r in range(3):
        ts = []
        for k in (1, 3):
            t0 = time.perf_counter()
            st = step(topo, st, jnp.asarray(k), p_rb, cfg)
            pull(st)
            ts.append(time.perf_counter() - t0)
        s = (ts[1] - ts[0]) / 2
        est = s if s > 0 else ts[1] / 3
        best = min(best, est)
        print(f"round {r}: {est * 1e3:.0f} ms raw {[round(t, 2) for t in ts]}",
              flush=True)

    d = divergence(topo, st.velocity, p_rb.inv_voxel_size)
    dmax = float(jnp.max(jnp.abs(d)))
    print(f"post-step div max {dmax:.3f}", flush=True)
    res = {"tiles": int(topo.n_active), "voxels": voxels,
           "step_ms": round(best * 1e3, 1),
           "mvoxps": round(voxels / best / 1e6, 1),
           "div_max": round(dmax, 3), "fits": True}
    print(json.dumps(res), flush=True)
    out(res)  # noqa: F821


main()
