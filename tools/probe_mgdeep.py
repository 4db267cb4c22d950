"""CPU repro of the deep-hierarchy MG divergence seen at 1024^3 (r4 probe
103: mg5 residual ratio 0.567 @2cyc -> 0.900 @4cyc; more coarsest sweeps
made it WORSE). Sphere-of-tiles domain, depth x cycles sweep, residual
ratio per config. Run: JAX_PLATFORMS=cpu python tools/probe_mgdeep.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp

from hnanosolver_tpu.core.topology import build_topology
from hnanosolver_tpu.ops import pressure as prs
from hnanosolver_tpu.ops.multigrid import build_hierarchy, solve_pressure_mg

R = 12  # tile-radius sphere (~7.2k tiles, 3.7M voxels)
g = np.arange(-R, R + 1)
X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
m = (X * X + Y * Y + Z * Z) <= R * R
coords = (np.stack([X[m], Y[m], Z[m]], -1) + 64).astype(np.int32)
topo = build_topology(coords)
n = int(topo.n_active)
print(f"fine tiles {n}")

rng = np.random.default_rng(0)
div = np.zeros((topo.capacity, 512), np.float32)
div[1 : n + 1] = rng.normal(size=(n, 512)).astype(np.float32)
# add a smooth low-frequency component (the mode MG exists for)
from hnanosolver_tpu.core.layout import positions_flat

px, py, pz = (np.asarray(p, np.float32) for p in positions_flat(topo))
k = 2 * np.pi / (16 * R)
div[1 : n + 1] += 5.0 * (
    np.sin(k * px) * np.sin(k * py) * np.sin(k * pz)
)[1 : n + 1]
div = jnp.asarray(div)
dx = 1.0
div0 = float(jnp.max(jnp.abs(div[1 : n + 1])))
print(f"div0 {div0:.4f}")

for depth in (1, 2, 3, 4):
    hier = build_hierarchy(topo, depth)
    sizes = [int(h.topo.n_active) for h in hier]
    line = [f"depth {depth} {sizes}"]
    for cycles in (1, 2, 4, 8):
        p = solve_pressure_mg(topo, list(hier), div, cycles, dx, omega=1.0)
        r = prs.residual(topo, p, div, dx)
        rmax = float(jnp.max(jnp.abs(r[1 : n + 1])))
        line.append(f"c{cycles}={rmax / div0:.4f}")
    print("  ".join(line), flush=True)
