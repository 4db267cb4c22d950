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

TPU mapping: every sub-step is a batched gather/FMA over all active voxels
at once — the per-thread scalar loops of the CUDA kernels become whole-array
ops the VPU chews through; the trilinear gathers go through the sorted-key
lookup (ops/sampling.py). The fused multi-field variant stacks scalars on a
leading axis so XLA shares the interpolation weights across fields, the same
optimization the fused CUDA kernel does by hand.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from hnanosolver_tpu.core.topology import Topology, voxel_positions
from hnanosolver_tpu.ops import collision as col
from hnanosolver_tpu.ops.halo import gather_halo, shift
from hnanosolver_tpu.ops.sampling import sample_trilinear


def _neighbor_minmax(topo: Topology, field: jax.Array, include: jax.Array):
    """Min/max over the voxel itself, its 6 face neighbors, and ``include``
    (the semi-Lagrangian value), per the reference's clamp (Kernel.cu:249-261).
    Out-of-domain neighbors contribute background 0 — same as the reference's
    sampler-based variant (Kernel.cu:329-346)."""
    pad = gather_halo(topo, field)
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


def _trace_positions(
    topo: Topology,
    vel: jax.Array,
    scaled_dt: float,
    sdf: Optional[jax.Array],
):
    """Common backtrace/retrace machinery. Returns (backPos, fwdPos2)."""
    pos = voxel_positions(topo).astype(vel.dtype)
    back = pos - vel * scaled_dt
    if sdf is not None:
        back = col.reject_colliding_positions(topo, sdf, back, pos)
    vel_f = sample_trilinear(topo, vel, back)
    fwd2 = back + vel_f * scaled_dt
    if sdf is not None:
        fwd2 = col.reject_colliding_positions(topo, sdf, fwd2, back)
    return back, fwd2


def advect_scalars_fused(
    topo: Topology,
    vel: jax.Array,
    scalars: Dict[str, jax.Array],
    dt: float,
    inv_dx: float,
    sdf: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """BFECC-advect every scalar field by ``vel``, sharing trace positions and
    interpolation indices across fields (the fused advect_scalars kernel)."""
    if not scalars:
        return {}
    scaled_dt = dt * inv_dx
    back, fwd2 = _trace_positions(topo, vel, scaled_dt, sdf)

    names = sorted(scalars)
    stacked = jnp.stack([scalars[n] for n in names], axis=-1)  # [T,8,8,8,F]
    phi0 = stacked
    phi_f = sample_trilinear(topo, stacked, back)
    phi_b = sample_trilinear(topo, stacked, fwd2)
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
) -> jax.Array:
    """Single-field BFECC advection (the standalone HNanoAdvect node path)."""
    return advect_scalars_fused(topo, vel, {"f": field}, dt, inv_dx, sdf)["f"]


def advect_velocity(
    topo: Topology,
    vel: jax.Array,
    dt: float,
    inv_dx: float,
    sdf: Optional[jax.Array] = None,
) -> jax.Array:
    """BFECC self-advection of the velocity field with per-component clamping
    and the reference's near-boundary no-slip tail (Kernel.cu:354-453)."""
    scaled_dt = dt * inv_dx
    back, fwd2 = _trace_positions(topo, vel, scaled_dt, sdf)

    vel_f = sample_trilinear(topo, vel, back)
    vel_b = sample_trilinear(topo, vel, fwd2)
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
