"""Does Mosaic's tpu.dynamic_gather (jnp.take_along_axis in-kernel) support
arbitrary cross-row gathers on a [T,512] VMEM value?

If yes (and fast), the lagged pressure solve can go fully VMEM-resident:
per-sweep halo refresh (textbook convergence) with zero HBM face traffic.
Checks (a) compile, (b) bit-correctness vs XLA jnp.take, (c) chain-slope
timing of 6 gathers/iteration vs the XLA take path, at bench topology.

Run: python tools/tpu_submit.py 089_dgather tools/probe_dgather.py 900
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
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import bench
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.ops.pallas_pressure import _DIRS
    from hnanosolver_tpu.ops.shifts import d_of

    tiles = bench.build_plume_envelope()
    n = len(np.unique(tiles, axis=0))
    topo = build_topology(tiles, capacity=((n + 1 + 511) // 512) * 512)
    T = int(topo.capacity)
    print(f"T={T}", flush=True)

    nbr6 = jnp.stack([topo.nbr[:, d_of(off)] for off in _DIRS])  # [6,T]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (T, 512), jnp.float32)

    # --- tiny compile test first: 8-row operand (vreg-local) --------------
    def k_small(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    try:
        f_small = pl.pallas_call(
            k_small,
            out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
        )
        idx8 = jnp.broadcast_to(
            jnp.arange(7, -1, -1, dtype=jnp.int32)[:, None], (8, 512))
        got = f_small(x[:8], idx8)
        want = x[:8][::-1]
        print(f"small(8row): max|diff|={float(jnp.max(jnp.abs(got-want))):.2e}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"small(8row) FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # --- full-size cross-row gather ---------------------------------------
    def k_full(x_ref, i_ref, o_ref):
        idx = jnp.broadcast_to(i_ref[:].reshape(T, 1), (T, 512))
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx, axis=0)

    try:
        f_full = pl.pallas_call(
            k_full,
            out_shape=jax.ShapeDtypeStruct((T, 512), jnp.float32),
        )
        rows = nbr6[0]
        got = jax.block_until_ready(f_full(x, rows))
        want = jnp.take(x, rows, axis=0)
        err = float(jnp.max(jnp.abs(got - want)))
        print(f"full(T-row): max|diff|={err:.2e}", flush=True)
        ok_full = err == 0.0
    except Exception as e:  # noqa: BLE001
        print(f"full(T-row) FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        ok_full = False

    if not ok_full:
        print("cross-row dynamic_gather unusable; stopping", flush=True)
        return

    # --- timing: 6 face gathers per iteration, in-kernel vs XLA ----------
    def k_time(reps, x_ref, n_ref, o_ref):
        def body(_, acc):
            s = acc
            for d in range(6):
                idx = jnp.broadcast_to(n_ref[d].reshape(T, 1), (T, 512))
                s = s + jnp.take_along_axis(x_ref[:], idx, axis=0) * 1e-30
            return s
        o_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:])

    def build_timed(reps):
        return pl.pallas_call(
            functools.partial(k_time, reps),
            out_shape=jax.ShapeDtypeStruct((T, 512), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

    @jax.jit
    def xla_time(x, k):
        nbr_cat = jnp.concatenate([nbr6[d] for d in range(6)])

        def body(_, q):
            f = jnp.take(q, nbr_cat, axis=0)
            return q + f[:T] * 1e-30
        return jax.lax.fori_loop(0, k, body, x)

    f_lo, f_hi = build_timed(4), build_timed(24)

    def pull(v):
        np.asarray(v).ravel()[:1]

    pull(f_lo(x, nbr6)); pull(f_hi(x, nbr6))
    pull(xla_time(x, jnp.asarray(4))); pull(xla_time(x, jnp.asarray(24)))

    def best(fn, *a, rep=4):
        b = float("inf")
        for _ in range(rep):
            t0 = time.perf_counter()
            pull(fn(*a))
            b = min(b, time.perf_counter() - t0)
        return b

    for r in range(4):
        if r:
            time.sleep(8)
        klo = best(f_lo, x, nbr6)
        khi = best(f_hi, x, nbr6)
        xlo = best(xla_time, x, jnp.asarray(4))
        xhi = best(xla_time, x, jnp.asarray(24))
        print(
            f"round {r}: in-kernel 6-gather={1e3*(khi-klo)/20:.3f} ms/iter"
            f"  xla take6={1e3*(xhi-xlo)/20:.3f} ms/iter", flush=True)


main()
