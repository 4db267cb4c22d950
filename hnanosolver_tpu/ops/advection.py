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

TPU mapping (three design rules, each measured on v5e):
- No element gathers / binary searches (they lower to ~16M elem/s): all
  sampling goes through per-tile halo blocks (contiguous row gathers) +
  batched in-row ``take_along_axis`` corner reads.
- Displacements are CFL-clamped to the halo radius (default 4 voxels/step;
  static config) — a documented deviation: the reference lets traces run
  arbitrarily far (`Kernel.cu:139`); a plume at sane dt stays well under.
- The tile axis is processed in ``lax.map`` chunks so radius-4 halo blocks
  stay ~45 MB instead of ~0.7 GB at full capacity; one compiled chunk body,
  XLA pipelines the sequence.
The fused multi-field variant stacks scalars on a trailing axis so one halo
block and one set of corner indices serves every field — the same
optimization the fused CUDA kernel does by hand.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from hnanosolver_tpu.core.topology import Topology
from hnanosolver_tpu.ops import collision as col
from hnanosolver_tpu.ops.halo import _dst, _src, shift
from hnanosolver_tpu.ops.sampling import _block_gather, _clamp_disp

DEFAULT_RADIUS = 4  # halo radius in voxels = max trace displacement + 1
DEFAULT_CHUNK = 512  # tiles per lax.map chunk (bounds halo-block temporaries)


def _gather_halo_rows(field: jax.Array, nbr_rows: jax.Array, radius: int) -> jax.Array:
    """Halo blocks for an arbitrary set of table rows.

    ``field`` is the FULL [T, 8,8,8, *ch] array; ``nbr_rows`` [C, 27] are the
    neighbor table rows of the C tiles to process (center at index 13).
    Returns [C, E, E, E, *ch], E = 8+2*radius. Row-gathers only."""
    r = radius
    C = nbr_rows.shape[0]
    ch = field.shape[4:]
    E = 8 + 2 * r
    pad = jnp.zeros((C, E, E, E) + ch, field.dtype)
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                sub = field[:, _src(ox, r), _src(oy, r), _src(oz, r)]
                d = (ox + 1) * 9 + (oy + 1) * 3 + (oz + 1)
                vals = jnp.take(sub, nbr_rows[:, d], axis=0)
                pad = pad.at[:, _dst(ox, r), _dst(oy, r), _dst(oz, r)].set(vals)
    return pad


def _sample_block(block: jax.Array, disp: jax.Array, radius: int) -> jax.Array:
    """Trilinear sample of halo blocks [C,E,E,E,*ch] at per-voxel
    displacements [C,8,8,8,3] (already clamped)."""
    E = block.shape[1]
    C = block.shape[0]
    ch = block.shape[4:]
    block_flat = block.reshape((C, E * E * E) + ch)

    lx = jax.lax.broadcasted_iota(jnp.float32, (8, 8, 8), 0)
    ly = jax.lax.broadcasted_iota(jnp.float32, (8, 8, 8), 1)
    lz = jax.lax.broadcasted_iota(jnp.float32, (8, 8, 8), 2)
    local = jnp.stack([lx, ly, lz], axis=-1)[None] + float(radius) + disp
    base = jnp.floor(local)
    frac = local - base
    base = jnp.clip(base.astype(jnp.int32), 0, E - 2)

    tx, ty, tz = frac[..., 0], frac[..., 1], frac[..., 2]
    itx, ity, itz = 1.0 - tx, 1.0 - ty, 1.0 - tz
    w = {
        (0, 0, 0): itx * ity * itz,
        (1, 0, 0): tx * ity * itz,
        (0, 1, 0): itx * ty * itz,
        (1, 1, 0): tx * ty * itz,
        (0, 0, 1): itx * ity * tz,
        (1, 0, 1): tx * ity * tz,
        (0, 1, 1): itx * ty * tz,
        (1, 1, 1): tx * ty * tz,
    }
    acc = None
    for (di, dj, dk), wt in w.items():
        b = base + jnp.array([di, dj, dk], jnp.int32)
        idx = ((b[..., 0] * E + b[..., 1]) * E + b[..., 2]).reshape(C, 512)
        v = _block_gather(block_flat, idx)
        v = v * (wt[..., None] if ch else wt)
        acc = v if acc is None else acc + v
    return acc


def _minmax_from_block(block1, center_vals, include):
    """Clamp bounds from a radius-1 halo block (Kernel.cu:249-261 semantics:
    voxel itself, 6 face neighbors, and the semi-Lagrangian value)."""
    lo = jnp.minimum(center_vals, include)
    hi = jnp.maximum(center_vals, include)
    for off in [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]:
        n = shift(block1, *off)
        lo = jnp.minimum(lo, n)
        hi = jnp.maximum(hi, n)
    return lo, hi


def _chunked_rows(topo: Topology, chunk: int):
    """Reshape the neighbor table into [K, C, 27] map chunks (capacity is a
    power of two, so it divides evenly for chunk <= capacity)."""
    T = topo.capacity
    c = min(chunk, T)
    K = T // c
    return topo.nbr.reshape(K, c, 27)


def _advect_chunk_body(
    vel: jax.Array,
    stacked: Optional[jax.Array],
    sdf: Optional[jax.Array],
    scaled_dt: float,
    radius: int,
    self_advect: bool,
):
    """Returns fn(nbr_rows_chunk) -> advected chunk values."""

    def body(nbr_rows):
        rows = nbr_rows[:, 13]  # own table row of each tile in the chunk
        vel_c = jnp.take(vel, rows, axis=0)
        vel_block = _gather_halo_rows(vel, nbr_rows, radius)
        sdf_block = (
            _gather_halo_rows(sdf, nbr_rows, radius) if sdf is not None else None
        )

        zero = jnp.zeros_like(vel_c)
        disp_back = _clamp_disp(-vel_c * scaled_dt, radius)
        if sdf_block is not None:
            d = _sample_block(sdf_block, disp_back, radius)
            disp_back = jnp.where((d < 0.0)[..., None], zero, disp_back)
        vel_f = _sample_block(vel_block, disp_back, radius)
        disp_fwd2 = _clamp_disp(disp_back + vel_f * scaled_dt, radius)
        if sdf_block is not None:
            d2 = _sample_block(sdf_block, disp_fwd2, radius)
            disp_fwd2 = jnp.where((d2 < 0.0)[..., None], disp_back, disp_fwd2)

        if self_advect:
            phi_block, phi_c = vel_block, vel_c
            phi_f = vel_f
        else:
            phi_block = _gather_halo_rows(stacked, nbr_rows, radius)
            phi_c = jnp.take(stacked, rows, axis=0)
            phi_f = _sample_block(phi_block, disp_back, radius)
        phi_b = _sample_block(phi_block, disp_fwd2, radius)
        corr = phi_f + 0.5 * (phi_c - phi_b)

        # clamp bounds via the center 1-shell of the already-built block
        r = radius
        block1 = phi_block[
            :, r - 1 : r + 9, r - 1 : r + 9, r - 1 : r + 9
        ]
        lo, hi = _minmax_from_block(block1, phi_c, phi_f)
        return jnp.clip(corr, lo, hi)

    return body


def advect_scalars_fused(
    topo: Topology,
    vel: jax.Array,
    scalars: Dict[str, jax.Array],
    dt: float,
    inv_dx: float,
    sdf: Optional[jax.Array] = None,
    radius: int = DEFAULT_RADIUS,
    chunk: int = DEFAULT_CHUNK,
) -> Dict[str, jax.Array]:
    """BFECC-advect every scalar field by ``vel``, sharing halos, trace
    displacements and corner indices across fields (the fused advect_scalars
    kernel)."""
    if not scalars:
        return {}
    names = sorted(scalars)
    stacked = jnp.stack([scalars[n] for n in names], axis=-1)  # [T,8,8,8,F]
    body = _advect_chunk_body(
        vel, stacked, sdf, dt * inv_dx, radius, self_advect=False
    )
    nbr_chunks = _chunked_rows(topo, chunk)
    out = jax.lax.map(body, nbr_chunks)  # [K, C, 8,8,8, F]
    out = out.reshape(stacked.shape)
    return {n: out[..., i] for i, n in enumerate(names)}


def advect_scalar(
    topo: Topology,
    vel: jax.Array,
    field: jax.Array,
    dt: float,
    inv_dx: float,
    sdf: Optional[jax.Array] = None,
    radius: int = DEFAULT_RADIUS,
    chunk: int = DEFAULT_CHUNK,
) -> jax.Array:
    """Single-field BFECC advection (the standalone HNanoAdvect node path)."""
    return advect_scalars_fused(
        topo, vel, {"f": field}, dt, inv_dx, sdf, radius, chunk
    )["f"]


def advect_velocity(
    topo: Topology,
    vel: jax.Array,
    dt: float,
    inv_dx: float,
    sdf: Optional[jax.Array] = None,
    radius: int = DEFAULT_RADIUS,
    chunk: int = DEFAULT_CHUNK,
) -> jax.Array:
    """BFECC self-advection of the velocity field with per-component clamping
    and the reference's near-boundary no-slip tail (Kernel.cu:354-453)."""
    body = _advect_chunk_body(vel, None, sdf, dt * inv_dx, radius, self_advect=True)
    nbr_chunks = _chunked_rows(topo, chunk)
    corr = jax.lax.map(body, nbr_chunks).reshape(vel.shape)

    if sdf is not None:
        # advect_vector's tail: gate at 0.1 but blend with 1 - sdf/1.5
        # (Kernel.cu:433-450) — a reference quirk we preserve.
        corr = col.enforce_collision(
            topo, corr, sdf, inv_dx, margin=0.1, blend_denom=1.5
        )
    return corr
