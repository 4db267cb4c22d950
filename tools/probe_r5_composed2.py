"""Round-5 composed-gates A/B, take 2 (VERDICT r4 next-2). Probe 130 was
INVALID: make_chain returned an untraced jit and the gates were restored
before ch_off's first call, so both chains compiled the ON config (parity
was bitwise 0.0 and the timings identical-binary noise: 15.7-44 ms across
8 rounds for the same program — that run now serves as the window-noise
map). This take traces each chain UNDER its own gate setting, asserts the
two lowered HLOs actually differ, and interleaves on/off within rounds.

Run: python tools/tpu_submit.py 132_composed2 tools/probe_r5_composed2.py 2700
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
    from hnanosolver_tpu.ops import advection as adv
    from hnanosolver_tpu.ops import pallas_pressure as pp
    from hnanosolver_tpu.ops import pallas_tail as pt

    params = SolverParams(dt=1.0 / 24.0, iterations=50, voxel_size=0.5)
    cfg = PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    print(f"domain: {int(topo.n_active)} tiles, cap {int(topo.capacity)}",
          flush=True)

    def set_gates(on: bool):
        adv.FWD_NARROW = None if on else False
        pt.TAIL_KERNEL = on
        pp.PLANES_HALO = on

    K_LO, K_HI = jnp.asarray(2), jnp.asarray(12)
    span = 10.0
    state0 = zeros_state(topo)

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    chains = {}
    hlo = {}
    state = None
    for nm, on in (("on", True), ("off", False)):
        set_gates(on)

        # step_impl + emit, NOT plume_step or _plume_step: BOTH route
        # through module-level jitted functions (plume_step itself, and
        # solver.step inside _plume_step) whose trace caches are shared
        # across the two configs — the second chain silently reuses the
        # first config's jaxpr (probes 130/132/133 all lowered identical
        # HLO for "on" and "off" because of this)
        def raw_step(x):
            return step_impl(topo, emit(topo, x, cfg, params.dt), params, ())

        @jax.jit
        def chain(s, k):
            return jax.lax.fori_loop(0, k, lambda _, x: raw_step(x), s)

        # trace + compile BOTH chain lengths NOW, while the gates hold
        # (probe 130's bug: deferred tracing after the gates were restored)
        t0 = time.perf_counter()
        hlo[nm] = hashlib.sha256(
            chain.lower(state0, K_LO).as_text().encode()).hexdigest()[:16]
        dev = chain(state0, K_LO)
        pull(chain(dev, K_HI))
        if nm == "on":
            state = dev  # developed 2 steps, same as bench.py's develop
        chains[nm] = chain
        print(f"{nm}: compiled in {time.perf_counter() - t0:.0f}s "
              f"hlo={hlo[nm]}", flush=True)
    set_gates(True)
    assert hlo["on"] != hlo["off"], "gate configs lowered identically!"

    # parity on the developed chain (one more step each config)
    a = chains["on"](state, jnp.asarray(1))
    b = chains["off"](state, jnp.asarray(1))
    dv = float(jnp.max(jnp.abs(a.velocity - b.velocity)))
    ds = max(float(jnp.max(jnp.abs(a.scalars[k] - b.scalars[k])))
             for k in a.scalars)
    print(f"parity on developed chain: |dvel|={dv:.3e} |dscal|={ds:.3e}",
          flush=True)

    mins = {"on": [float("inf")] * 2, "off": [float("inf")] * 2}
    per_round = {"on": [], "off": []}
    for r in range(10):
        if r:
            time.sleep(20)
        pull(chains["on"](state, K_LO))  # post-idle throwaway
        order = (("on", "off") if r % 2 == 0 else ("off", "on"))
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
    for nm in ("on", "off"):
        lo, hi = mins[nm]
        anchor = (hi - lo) / span
        cand = [s for s in per_round[nm] if s >= 0.5 * anchor]
        est = min(cand + [anchor])
        res[nm] = est
        print(f"{nm}: bench-estimator {est * 1e3:.2f} ms/step  "
              f"anchor {anchor * 1e3:.2f} (lo {lo:.3f} hi {hi:.3f})  "
              f"round-min {min(per_round[nm]) * 1e3:.2f}", flush=True)
    print(f"ratio on/off = {res['on'] / res['off']:.3f}", flush=True)
    out({"on_ms": res["on"] * 1e3, "off_ms": res["off"] * 1e3,  # noqa: F821
         "parity_dvel": dv, "parity_dscal": ds})


main()
