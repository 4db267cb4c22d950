"""Full-step A/B: precision="balanced" (bf16x3 dots, ~1.5e-5 rel) vs
"fast" (single-bf16 dots, ~4e-3 rel) at the bench operating point. The
phase probe (136) put the mixed-band scalar pass at ~14-22 ms of a ~25 ms
step and fact 16 says the sampling megakernels are MXU-bound — precision
is the MAC-count lever left. Methodology: step_impl directly (no inner
jit — NOTES r5 fact 54), HLO-hash guard, interleaved rounds, min-of-rounds.

Run: python tools/tpu_submit.py 137_fast tools/probe_r5_fast.py 2700
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
    import hashlib

    import jax
    import jax.numpy as jnp

    import bench
    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.models.plume import PlumeConfig, emit
    from hnanosolver_tpu.solver import step_impl

    cfg = PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    print(f"domain: {int(topo.n_active)} tiles, cap {int(topo.capacity)}",
          flush=True)

    K_LO, K_HI = jnp.asarray(2), jnp.asarray(12)
    span = 10.0
    state0 = zeros_state(topo)

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    chains = {}
    hlo = {}
    state = None
    for nm in ("bal", "fast"):
        params = SolverParams(dt=1.0 / 24.0, iterations=50, voxel_size=0.5,
                              precision="balanced" if nm == "bal" else "fast")

        def raw_step(x, params=params):
            return step_impl(topo, emit(topo, x, cfg, params.dt), params, ())

        @jax.jit
        def chain(s, k, raw_step=raw_step):
            return jax.lax.fori_loop(0, k, lambda _, x: raw_step(x), s)

        t0 = time.perf_counter()
        hlo[nm] = hashlib.sha256(
            chain.lower(state0, K_LO).as_text().encode()).hexdigest()[:16]
        dev = chain(state0, K_LO)
        pull(chain(dev, K_HI))
        if state is None:
            state = dev
        chains[nm] = chain
        print(f"{nm}: compiled in {time.perf_counter() - t0:.0f}s "
              f"hlo={hlo[nm]}", flush=True)
    assert hlo["bal"] != hlo["fast"], "precision tiers lowered identically!"

    a = chains["bal"](state, jnp.asarray(1))
    b = chains["fast"](state, jnp.asarray(1))
    rel = float(jnp.max(jnp.abs(a.scalars["density"] - b.scalars["density"]))
                / (jnp.max(jnp.abs(a.scalars["density"])) + 1e-30))
    print(f"density rel-diff after 1 step from developed state: {rel:.2e}",
          flush=True)

    mins = {"bal": [float("inf")] * 2, "fast": [float("inf")] * 2}
    per_round = {"bal": [], "fast": []}
    for r in range(10):
        if r:
            time.sleep(20)
        pull(chains["bal"](state, K_LO))
        order = (("bal", "fast") if r % 2 == 0 else ("fast", "bal"))
        msg = []
        for nm in order:
            fn = chains[nm]
            lo = hi = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                pull(fn(state, K_LO))
                lo = min(lo, time.perf_counter() - t0)
            for _ in range(3):
                t0 = time.perf_counter()
                pull(fn(state, K_HI))
                hi = min(hi, time.perf_counter() - t0)
            mins[nm][0] = min(mins[nm][0], lo)
            mins[nm][1] = min(mins[nm][1], hi)
            per_round[nm].append((hi - lo) / span)
            msg.append(f"{nm}={(hi - lo) / span * 1e3:.2f}")
        print(f"round {r}: " + "  ".join(msg) + " ms/step", flush=True)

    res = {}
    for nm in ("bal", "fast"):
        lo, hi = mins[nm]
        anchor = (hi - lo) / span
        cand = [s for s in per_round[nm] if s >= 0.5 * anchor]
        est = min(cand + [anchor])
        res[nm] = est
        print(f"{nm}: bench-estimator {est * 1e3:.2f} ms/step  "
              f"anchor {anchor * 1e3:.2f} (lo {lo:.3f} hi {hi:.3f})",
              flush=True)
    print(f"ratio fast/bal = {res['fast'] / res['bal']:.3f}", flush=True)
    out({"bal_ms": res["bal"] * 1e3, "fast_ms": res["fast"] * 1e3,  # noqa: F821
         "rel_diff": rel})


main()
