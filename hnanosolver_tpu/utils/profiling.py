"""jax.profiler integration — the deep-tracing layer above utils/timers.py
(SURVEY §5.1: the reference only has RAII printf timers; we add real device
traces viewable in TensorBoard/Perfetto)."""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/hnano_trace"):
    """Capture a device profile around a block:

        with device_trace("/tmp/trace"):
            state = step(topo, state, params)
            jax.block_until_ready(state)

    Open the directory with TensorBoard's profile plugin or xprof."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for labeling step phases inside traces."""
    return jax.profiler.TraceAnnotation(name)
