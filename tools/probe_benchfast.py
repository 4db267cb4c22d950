"""bench.py end-to-end through the worker with the sampling trimmed to 2
rounds — a COMPILE + estimator + JSON smoke check after solver-dispatch
changes, not a recorded measurement (the driver's standalone run does
that with the full congestion-spanning budget).

Run: python tools/tpu_submit.py NNN_benchfast tools/probe_benchfast.py 1200
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

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402

bench.ROUNDS = 2
bench.MAX_ROUNDS = 2
bench.WALL_BUDGET_S = 600.0
bench.main()
