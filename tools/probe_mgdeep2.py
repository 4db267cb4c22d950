"""Deep-hierarchy MG mask-semantics experiment (CPU): per-cycle residual
trace for mask_mode in {any, all} at depth 1..5.

Hypothesis under test: the ANY-of-children coarse mask OVER-covers the fine
domain (by up to 2^k - 1 fine voxels at depth k); the coarse Dirichlet
problem on that larger domain over-corrects the global mode, so deep
V-cycles amplify (probe r4/103: depth-5 0.567 @2cyc -> 0.900 @4cyc) and a
more exact coarsest solve makes it WORSE. ALL-of-children UNDER-covers and
can only undershoot, so cycles stay contractive.

Run: JAX_PLATFORMS=cpu python tools/probe_mgdeep2.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp

from hnanosolver_tpu.core.layout import positions_flat
from hnanosolver_tpu.core.topology import build_topology
from hnanosolver_tpu.ops import pressure as prs
from hnanosolver_tpu.ops.multigrid import build_hierarchy, v_cycle

R = 10  # tile-radius sphere (~4.2k tiles)
g = np.arange(-R, R + 1)
X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
m = (X * X + Y * Y + Z * Z) <= R * R
coords = (np.stack([X[m], Y[m], Z[m]], -1) + 64).astype(np.int32)
topo = build_topology(coords)
n = int(topo.n_active)
print(f"fine tiles {n}")

rng = np.random.default_rng(0)
div = np.zeros((topo.capacity, 512), np.float32)
div[1 : n + 1] = 0.3 * rng.normal(size=(n, 512)).astype(np.float32)
px, py, pz = (np.asarray(p, np.float32) for p in positions_flat(topo))
k = 2 * np.pi / (16 * R)  # the global mode: wavelength ~ the domain size
div[1 : n + 1] += 5.0 * (
    np.sin(k * px) * np.sin(k * py) * np.sin(k * pz)
)[1 : n + 1]
div = jnp.asarray(div)
dx = 1.0
div0 = float(jnp.max(jnp.abs(div[1 : n + 1])))
print(f"div0 {div0:.4f}")

for mode in ("any", "all"):
    for depth in (3, 4, 5):
        hier = build_hierarchy(topo, depth, mask_mode=mode)
        sizes = [int(h.topo.n_active) for h in hier]
        p = jnp.zeros_like(div)
        trace = []
        for _ in range(6):
            p = v_cycle(topo, list(hier), div, p, dx, omega=1.0)
            r = prs.residual(topo, p, div, dx)
            rmax = float(jnp.max(jnp.abs(r[1 : n + 1])))
            trace.append(rmax / div0)
        print(
            f"{mode} depth {depth} {sizes}: "
            + " ".join(f"{t:.4f}" for t in trace),
            flush=True,
        )
