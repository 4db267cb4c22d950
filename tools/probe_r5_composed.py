"""Round-5 composed-gates A/B (VERDICT r4 next-2): the full bench step with
ALL round-4 default gates on (FWD_NARROW dispatch + TAIL_KERNEL +
PLANES_HALO) vs the round-3 configuration (all three off), interleaved in
the same windows, chain-slope timed (2 vs 12 dependent steps,
min-of-rounds). Also prints the one-step parity |diff| between the two
configurations on the developed bench chain.

Run: python tools/tpu_submit.py 130_composed tools/probe_r5_composed.py 2400
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

    def make_chain(on: bool):
        set_gates(on)

        @jax.jit
        def chain(s, k):
            return jax.lax.fori_loop(
                0, k, lambda _, x: plume_step(topo, x, params, cfg), s)

        return chain

    state = zeros_state(topo)
    ch_on = make_chain(True)
    state = ch_on(state, jnp.asarray(2))  # develop through the ON chain
    jax.block_until_ready(state.velocity)
    ch_off = make_chain(False)
    set_gates(True)  # restore defaults for any later submission
    print("compiled", flush=True)

    # parity on the developed chain (one more step each config)
    a = ch_on(state, jnp.asarray(1))
    b = ch_off(state, jnp.asarray(1))
    dv = float(jnp.max(jnp.abs(a.velocity - b.velocity)))
    ds = max(float(jnp.max(jnp.abs(a.scalars[k] - b.scalars[k])))
             for k in a.scalars)
    print(f"parity on developed chain: |dvel|={dv:.3e} |dscal|={ds:.3e}",
          flush=True)

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    K_LO, K_HI = jnp.asarray(2), jnp.asarray(12)
    span = 10.0
    for fn in (ch_on, ch_off):
        pull(fn(state, K_HI))  # warm hi traces

    mins = {"on": [float("inf")] * 2, "off": [float("inf")] * 2}
    for r in range(8):
        if r:
            time.sleep(20)
        msg = []
        for nm, fn in (("on", ch_on), ("off", ch_off)):
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
            msg.append(f"{nm}={(hi - lo) / span * 1e3:.2f}")
        print(f"round {r}: " + "  ".join(msg) + " ms/step", flush=True)

    for nm in ("on", "off"):
        lo, hi = mins[nm]
        print(f"anchor {nm}: {(hi - lo) / span * 1e3:.2f} ms/step "
              f"(lo {lo:.3f} hi {hi:.3f})", flush=True)


main()
