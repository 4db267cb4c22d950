"""Decompose the BALANCED-tier megakernel cost at bench size.

Fact 16 (NOTES r3) proved the STRICT kernel is MXU-bound (assembly and
weight construction hide under the 6-pass HIGHEST dot). Balanced runs a
3-limb bf16 dot — half the MXU passes — so the VPU-side work (W hat
products/repeats/concats, the _split limb converts over [G,256,512])
may no longer hide. Variants, all on the balanced chain unless noted:

  full    — as shipped (3-limb bf16 dot, real W build + splits)
  noW     — W/wxT replaced by one-add materialized fakes (same shapes,
            data-dependent, Mosaic-safe): isolates W-construction cost
  dot1    — prec="fast" (single bf16 dot, real W build): isolates the
            MXU pass count 3 -> 1 and the W limb split
  strict  — prec="strict" (6-pass HIGHEST): the fact-16 reference point

Reading: noW << full => W build is the balanced bound (restructure it);
full ~= noW and (full-dot1) ~ 2 MXU passes => still MXU/limb-bound.

The fakes crash-isolated: a Mosaic SIGABRT on one variant must not kill
the probe (the first version died building a stride-0 broadcast operand).

Run: python tools/tpu_submit.py 0NN_wdecomp tools/probe_wdecomp.py 1800
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
    inv_dx, dt = params.inv_voxel_size, params.dt
    scal = dict(state.scalars)
    print(f"domain: {int(topo.n_active)} tiles", flush=True)

    real_weights = pb._weights

    def fake_weights(G, win, dx, dy, dz, dtype=jnp.float32):
        # same shapes/dtypes as the real operands, data-dependent so
        # nothing constant-folds, but built with ONE broadcast-add each
        # (the same iota+add pattern the real _weights opens with, which
        # Mosaic compiles; stride-0 broadcast_to operands SIGABRT it)
        nb = win // 8
        aw = jax.lax.broadcasted_iota(
            jnp.int32, (1, win, 1), 1).astype(jnp.float32)
        wxT = dx[:, None, :] * 1e-3 + aw * (1.0 / win)
        ak = jax.lax.broadcasted_iota(
            jnp.int32, (1, nb * nb * 64, 1), 1).astype(jnp.float32)
        W = ((dy[:, None, :] + dz[:, None, :]) * 1e-3
             + ak * 0.001).astype(dtype)
        return wxT, W

    def make_chain(tier):
        @jax.jit
        def chain(v, s, k):
            def body(_, c):
                v, s = c
                out = adv.advect_scalars_fused(topo, v, s, dt, inv_dx,
                                               fast=tier)
                return v, out
            return jax.lax.fori_loop(0, k, body, (v, s))[1]
        return chain

    variants = [
        ("full", real_weights, "balanced"),
        ("noW", fake_weights, "balanced"),
        ("dot1", real_weights, "fast"),
        ("strict", real_weights, "strict"),
    ]
    chains = {}
    for name, w, tier in variants:
        pb._weights = w
        pb._build.cache_clear()
        fn = make_chain(tier)
        try:
            jax.block_until_ready(fn(state.velocity, scal, jnp.asarray(1)))
            chains[name] = fn
            print(f"compiled {name}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    pb._weights = real_weights

    def t(fn, k):
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(state.velocity, scal, jnp.asarray(k)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for r in range(3):
        line = []
        for name, fn in chains.items():
            s = (t(fn, 9) - t(fn, 3)) / 6
            line.append(f"{name}={s * 1e3:.2f}ms")
        print(f"round {r}: " + "  ".join(line), flush=True)


main()
