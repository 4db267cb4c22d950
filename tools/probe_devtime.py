"""Profiler-derived DEVICE time of the bench step vs wall-clock chains.

The tunneled chip is time-shared for hours at a stretch (probes 049/068:
every round ~2.4x congested). If preemption happens BETWEEN device ops,
the profiler's per-op durations measure what a dedicated chip would do —
a congestion-immune measurement. This probe traces a step chain, sums
op durations per TPU plane line, and compares against the wall slope.

Run: python tools/tpu_submit.py 0NN_devtime tools/probe_devtime.py 1200
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

import glob
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.models.plume import PlumeConfig, plume_step

    params = SolverParams(dt=1.0 / 24.0, iterations=50, voxel_size=0.5)
    cfg = PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    state = zeros_state(topo)
    for _ in range(2):
        state = plume_step(topo, state, params, cfg)
    jax.block_until_ready(state.velocity)

    @jax.jit
    def chain(s, k):
        def body(_, s):
            return plume_step(topo, s, params, cfg)
        return jax.lax.fori_loop(0, k, body, s)

    jax.block_until_ready(chain(state, jnp.asarray(1)))
    print("compiled", flush=True)

    def wall(k):
        b = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(state, jnp.asarray(k)))
            b = min(b, time.perf_counter() - t0)
        return b

    NSTEP = 8
    tdir = "/tmp/devtime_trace"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    jax.block_until_ready(chain(state, jnp.asarray(NSTEP)))
    jax.profiler.stop_trace()
    w2, w12 = wall(2), wall(12)
    print(f"wall slope: {(w12 - w2) / 10 * 1e3:.2f} ms/step "
          f"(2-chain {w2:.3f}s)", flush=True)

    files = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    print(f"trace files: {files}", flush=True)
    if not files:
        return
    from jax.profiler import ProfileData

    pd = ProfileData.from_file(files[0])
    for plane in pd.planes:
        tot_busy = 0  # union-ish: sum of line maxima of busy time
        nlines = 0
        for line in plane.lines:
            dur = sum(ev.duration_ns for ev in line.events)
            lo = min((ev.start_ns for ev in line.events), default=0)
            hi = max((ev.end_ns for ev in line.events), default=0)
            nlines += 1
            lname = getattr(line, "name", "?")
            if dur > 1e6:
                print(f"  plane={plane.name} line={lname}: busy "
                      f"{dur / 1e6:.2f} ms span {(hi - lo) / 1e6:.2f} ms",
                      flush=True)
            tot_busy += dur
        print(f"plane {plane.name}: lines={nlines} "
              f"total busy {tot_busy / 1e6:.2f} ms "
              f"(/{NSTEP} steps = {tot_busy / 1e6 / NSTEP:.2f} ms/step)",
              flush=True)


main()
