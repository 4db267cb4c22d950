"""SDF collision boundaries — flat layout ([T,512] sdf, [3,T,512] velocity).

Reference semantics (`/root/reference/src/Cuda/Kernel.cu:8-116`):
- SDF < 0: inside the solid, velocity is zeroed.
- 0 <= SDF < margin (0.1 voxels): blend toward the no-slip (tangential)
  projection ``v - (v.n) n`` with blend = 1 - sdf/margin.
- SDF gradient via central differences scaled by 0.5/dx; normal is the
  normalized gradient (zero if degenerate, eps 1e-6).
- Backtraced sample positions that land inside the solid are rejected and
  replaced by the previous position (implemented inside ops/advection.py).

The reference represents "no SDF" as nullptr; we gate on
``SolverParams.has_collision`` instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hnanosolver_tpu.core.topology import Topology
from hnanosolver_tpu.ops.shifts import shifted_view

COLLISION_MARGIN = 0.1  # voxels; Kernel.cu:99


def sdf_normal_field(topo: Topology, sdf: jax.Array, inv_dx: float) -> jax.Array:
    """Normalized SDF gradient at every active voxel, [3,T,512]."""
    g = jnp.stack(
        [
            shifted_view(topo, sdf, (1, 0, 0)) - shifted_view(topo, sdf, (-1, 0, 0)),
            shifted_view(topo, sdf, (0, 1, 0)) - shifted_view(topo, sdf, (0, -1, 0)),
            shifted_view(topo, sdf, (0, 0, 1)) - shifted_view(topo, sdf, (0, 0, -1)),
        ]
    ) * (0.5 * inv_dx)
    glen = jnp.sqrt(jnp.sum(g * g, axis=0, keepdims=True))
    return jnp.where(glen > 1e-6, g / jnp.maximum(glen, 1e-30), 0.0)


def no_slip(vel: jax.Array, normal: jax.Array) -> jax.Array:
    """Project velocity onto the boundary tangent plane (Kernel.cu:57-74)."""
    vdotn = jnp.sum(vel * normal, axis=0, keepdims=True)
    return vel - normal * vdotn


def enforce_collision(
    topo: Topology,
    vel: jax.Array,
    sdf: jax.Array,
    inv_dx: float,
    margin: float = COLLISION_MARGIN,
    blend_denom: float | None = None,
) -> jax.Array:
    """enforceCollisionBoundaries (Kernel.cu:77-116): zero inside, distance-
    blended no-slip within ``margin``. ``blend_denom`` lets callers reproduce
    advect_vector's quirk of blending with 1 - sdf/1.5 while gating on 0.1
    (Kernel.cu:439-442)."""
    if blend_denom is None:
        blend_denom = margin
    normal = sdf_normal_field(topo, sdf, inv_dx)
    blend = jnp.clip(1.0 - sdf / blend_denom, 0.0, 1.0)[None]
    blended = vel * (1.0 - blend) + no_slip(vel, normal) * blend
    near = (sdf < margin)[None]
    out = jnp.where(near, blended, vel)
    inside = (sdf < 0.0)[None]
    return jnp.where(inside, 0.0, out)
