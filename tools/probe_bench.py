"""bench.py through the persistent worker, with the namespace purge the
standalone driver run doesn't need (prior jobs' globals pin HBM — NOTES
fact 21; the 1024^3 probes leave ~12 GB referenced).

Run: python tools/tpu_submit.py NNN_bench tools/probe_bench.py 1400
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

bench.main()
