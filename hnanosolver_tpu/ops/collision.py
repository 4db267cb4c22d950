"""SDF collision boundaries.

Reference semantics (`/root/reference/src/Cuda/Kernel.cu:8-116`):
- SDF < 0: inside the solid, velocity is zeroed.
- 0 <= SDF < margin (0.1 voxels): blend toward the no-slip (tangential)
  projection ``v - (v.n) n`` with blend = 1 - sdf/margin.
- SDF gradient via central differences scaled by 0.5/dx; normal is the
  normalized gradient (zero if degenerate, eps 1e-6).
- Backtraced sample positions that land inside the solid are rejected and
  replaced by the previous position (used by advection).

The reference represents "no SDF" as nullptr; we gate on
``SolverParams.has_collision`` instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hnanosolver_tpu.core.topology import Topology
from hnanosolver_tpu.ops.halo import face_shift_views, gather_halo, shift
from hnanosolver_tpu.ops.sampling import sample_trilinear

COLLISION_MARGIN = 0.1  # voxels; Kernel.cu:99


def sdf_normal_field(topo: Topology, sdf: jax.Array, inv_dx: float) -> jax.Array:
    """Normalized SDF gradient at every active voxel, [T,8,8,8,3]."""
    v = face_shift_views(topo, sdf)
    gx = (v[(1, 0, 0)] - v[(-1, 0, 0)]) * (0.5 * inv_dx)
    gy = (v[(0, 1, 0)] - v[(0, -1, 0)]) * (0.5 * inv_dx)
    gz = (v[(0, 0, 1)] - v[(0, 0, -1)]) * (0.5 * inv_dx)
    g = jnp.stack([gx, gy, gz], axis=-1)
    glen = jnp.sqrt(jnp.sum(g * g, axis=-1, keepdims=True))
    return jnp.where(glen > 1e-6, g / jnp.maximum(glen, 1e-30), 0.0)


def no_slip(vel: jax.Array, normal: jax.Array) -> jax.Array:
    """Project velocity onto the boundary tangent plane (Kernel.cu:57-74)."""
    vdotn = jnp.sum(vel * normal, axis=-1, keepdims=True)
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
    blend = jnp.clip(1.0 - sdf / blend_denom, 0.0, 1.0)[..., None]
    blended = vel * (1.0 - blend) + no_slip(vel, normal) * blend
    near = (sdf < margin)[..., None]
    out = jnp.where(near, blended, vel)
    inside = (sdf < 0.0)[..., None]
    return jnp.where(inside, 0.0, out)


def reject_colliding_positions(
    topo: Topology, sdf: jax.Array, pos: jax.Array, fallback: jax.Array
) -> jax.Array:
    """Replace trace positions that land inside the solid (SDF < 0, sampled
    trilinearly) with ``fallback`` — the reference's backtrace rejection
    (Kernel.cu:141-155)."""
    d = sample_trilinear(topo, sdf, pos)
    return jnp.where((d < 0.0)[..., None], fallback, pos)
