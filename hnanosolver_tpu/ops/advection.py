"""MacCormack/BFECC advection of scalar and vector fields.

Reference kernels:
- advect_scalars (fused multi-field): `/root/reference/src/Cuda/Kernel.cu:118-266`
- advect_scalar  (single field):      `/root/reference/src/Cuda/Kernel.cu:269-352`
- advect_vector  (velocity self-adv): `/root/reference/src/Cuda/Kernel.cu:354-453`

Scheme per voxel at position x (index space, scaled_dt = dt / dx):
  1. backPos  = x - u(x) * scaled_dt               (semi-Lagrangian backtrace)
  2. phiF     = phi(backPos)                        (trilinear)
  3. fwdPos2  = backPos + u(backPos) * scaled_dt    (forward re-trace)
  4. phiB     = phi(fwdPos2)
  5. phiCorr  = phiF + 0.5 * (phi(x) - phiB)        (BFECC correction)
  6. clamp phiCorr to [min, max] over {phi(x), 6-neighbors of x, phiF}
With an SDF: trace positions landing inside the solid are rejected back to
the previous position; advect_vector additionally applies its no-slip tail.

TPU mapping: trace displacements are expressed relative to each voxel and
sampled through per-tile halo blocks (ops/sampling.py local samplers) —
contiguous row gathers + batched in-row gathers only; no binary searches or
flat element gathers (which lower catastrophically on TPU). Displacements
are CFL-clamped to the halo radius (default 4 voxels/step; static config) —
a documented deviation: the reference lets traces run arbitrarily far
(`Kernel.cu:139`), but a plume at sane dt stays well under this. The fused
multi-field variant stacks scalars on a trailing axis so one halo block and
one set of corner indices serves every field, the same optimization the
fused CUDA kernel does by hand.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from hnanosolver_tpu.core.topology import Topology
from hnanosolver_tpu.ops import collision as col
from hnanosolver_tpu.ops.halo import gather_halo, shift
from hnanosolver_tpu.ops.sampling import (
    _clamp_disp,
    sample_trilinear_local,
)

DEFAULT_RADIUS = 4  # halo radius in voxels = max trace displacement + 1


def _neighbor_minmax(topo: Topology, field: jax.Array, include: jax.Array):
    """Min/max over the voxel itself, its 6 face neighbors, and ``include``
    (the semi-Lagrangian value), per the reference's clamp (Kernel.cu:249-261).
    Out-of-domain neighbors contribute background 0 — same as the reference's
    sampler-based variant (Kernel.cu:329-346)."""
    pad = gather_halo(topo, field, 1)
    nbrs = [
        shift(pad, 1, 0, 0),
        shift(pad, -1, 0, 0),
        shift(pad, 0, 1, 0),
        shift(pad, 0, -1, 0),
        shift(pad, 0, 0, 1),
        shift(pad, 0, 0, -1),
    ]
    lo = jnp.minimum(field, include)
    hi = jnp.maximum(field, include)
    for n in nbrs:
        lo = jnp.minimum(lo, n)
        hi = jnp.maximum(hi, n)
    return lo, hi


def _trace_displacements(
    topo: Topology,
    vel: jax.Array,
    scaled_dt: float,
    sdf: Optional[jax.Array],
    radius: int,
    vel_block: jax.Array,
    sdf_block: Optional[jax.Array],
):
    """Backtrace/retrace displacements relative to each voxel's position.
    Returns (disp_back, disp_fwd2)."""
    zero = jnp.zeros_like(vel)
    disp_back = _clamp_disp(-vel * scaled_dt, radius)
    if sdf is not None:
        # reject backtraces that land inside the solid (Kernel.cu:141-155)
        d = sample_trilinear_local(topo, sdf, disp_back, radius, block=sdf_block)
        disp_back = jnp.where((d < 0.0)[..., None], zero, disp_back)
    vel_f = sample_trilinear_local(topo, vel, disp_back, radius, block=vel_block)
    disp_fwd2 = _clamp_disp(disp_back + vel_f * scaled_dt, radius)
    if sdf is not None:
        d2 = sample_trilinear_local(topo, sdf, disp_fwd2, radius, block=sdf_block)
        disp_fwd2 = jnp.where((d2 < 0.0)[..., None], disp_back, disp_fwd2)
    return disp_back, disp_fwd2


def advect_scalars_fused(
    topo: Topology,
    vel: jax.Array,
    scalars: Dict[str, jax.Array],
    dt: float,
    inv_dx: float,
    sdf: Optional[jax.Array] = None,
    radius: int = DEFAULT_RADIUS,
) -> Dict[str, jax.Array]:
    """BFECC-advect every scalar field by ``vel``, sharing halos, trace
    displacements and corner indices across fields (the fused advect_scalars
    kernel)."""
    if not scalars:
        return {}
    scaled_dt = dt * inv_dx
    vel_block = gather_halo(topo, vel, radius)
    sdf_block = gather_halo(topo, sdf, radius) if sdf is not None else None
    disp_back, disp_fwd2 = _trace_displacements(
        topo, vel, scaled_dt, sdf, radius, vel_block, sdf_block
    )

    names = sorted(scalars)
    stacked = jnp.stack([scalars[n] for n in names], axis=-1)  # [T,8,8,8,F]
    blk = gather_halo(topo, stacked, radius)
    phi0 = stacked
    phi_f = sample_trilinear_local(topo, stacked, disp_back, radius, block=blk)
    phi_b = sample_trilinear_local(topo, stacked, disp_fwd2, radius, block=blk)
    corr = phi_f + 0.5 * (phi0 - phi_b)
    lo, hi = _neighbor_minmax(topo, stacked, phi_f)
    out = jnp.clip(corr, lo, hi)
    return {n: out[..., i] for i, n in enumerate(names)}


def advect_scalar(
    topo: Topology,
    vel: jax.Array,
    field: jax.Array,
    dt: float,
    inv_dx: float,
    sdf: Optional[jax.Array] = None,
    radius: int = DEFAULT_RADIUS,
) -> jax.Array:
    """Single-field BFECC advection (the standalone HNanoAdvect node path)."""
    return advect_scalars_fused(topo, vel, {"f": field}, dt, inv_dx, sdf, radius)["f"]


def advect_velocity(
    topo: Topology,
    vel: jax.Array,
    dt: float,
    inv_dx: float,
    sdf: Optional[jax.Array] = None,
    radius: int = DEFAULT_RADIUS,
) -> jax.Array:
    """BFECC self-advection of the velocity field with per-component clamping
    and the reference's near-boundary no-slip tail (Kernel.cu:354-453)."""
    scaled_dt = dt * inv_dx
    vel_block = gather_halo(topo, vel, radius)
    sdf_block = gather_halo(topo, sdf, radius) if sdf is not None else None
    disp_back, disp_fwd2 = _trace_displacements(
        topo, vel, scaled_dt, sdf, radius, vel_block, sdf_block
    )

    vel_f = sample_trilinear_local(topo, vel, disp_back, radius, block=vel_block)
    vel_b = sample_trilinear_local(topo, vel, disp_fwd2, radius, block=vel_block)
    corr = vel_f + 0.5 * (vel - vel_b)
    lo, hi = _neighbor_minmax(topo, vel, vel_f)
    corr = jnp.clip(corr, lo, hi)

    if sdf is not None:
        # advect_vector's tail: gate at 0.1 but blend with 1 - sdf/1.5
        # (Kernel.cu:433-450) — a reference quirk we preserve.
        corr = col.enforce_collision(
            topo, corr, sdf, inv_dx, margin=0.1, blend_denom=1.5
        )
    return corr
