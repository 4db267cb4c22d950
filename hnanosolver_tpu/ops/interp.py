"""Trilinear interpolation as MXU one-hot contractions.

Per-voxel dynamic gathers (take_along_axis / lax.gather) lower to ~90 ms per
[8192,512] pass on v5e — the measured bottleneck of semi-Lagrangian
advection. This module reformulates trilinear sampling as dense tensor
contractions that run on the MXU:

  out[v] = sum_{a,b,c} Wx[v,a] * Wy[v,b] * Wz[v,c] * B[a,b,c]

where ``B`` is the tile's 3x3x3-neighborhood block (24^3 voxels, assembled
from the 27-table by static reshapes) and ``Wx/Wy/Wz [512, 24]`` are
per-voxel hat-function weights, each row holding the two nonzero trilinear
coefficients at floor(pos) and floor(pos)+1. The first contraction is a
real [512,24]x[24,576] matmul per tile (MXU); the remaining two collapse
small axes on the VPU. FLOPs are ~27x the minimal 8-corner formula, but the
MXU supplies them at bandwidth instead of the gather unit's trickle.

Displacements must satisfy |d| < 7 per axis (corner coords stay inside the
3x3x3 neighborhood) — the same CFL clamp the advection applies.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from hnanosolver_tpu.core.layout import CX, CY, CZ, TILE

A = 24  # neighborhood extent per axis (3 tiles x 8 voxels)


def assemble_blocks(table: jax.Array) -> jax.Array:
    """27-table [C, 27*512] -> neighborhood blocks [C, 24, 24, 24].

    Table entry d*512+col with d=(dx+1)*9+(dy+1)*3+(dz+1), col=x*64+y*8+z:
    pure static reshape/transpose."""
    C = table.shape[0]
    t = table.reshape(C, 3, 3, 3, 8, 8, 8)  # [C, dx, dy, dz, x, y, z]
    t = jnp.transpose(t, (0, 1, 4, 2, 5, 3, 6))  # [C, dx, x, dy, y, dz, z]
    return t.reshape(C, A, A, A)


def hat_weights(local: jax.Array) -> jax.Array:
    """Per-voxel 1-D interpolation weights [C, 512, 24] for sample positions
    ``local`` [C,512] in neighborhood coords ([0, 24); = in-tile coord + 8 +
    displacement). Two nonzeros per row: (1-frac) at floor, frac at floor+1."""
    base = jnp.floor(local)
    frac = local - base
    b = base.astype(jnp.int32)
    ar = jax.lax.broadcasted_iota(jnp.int32, (1, 1, A), 2)
    b = b[:, :, None]
    frac = frac[:, :, None]
    return jnp.where(ar == b, 1.0 - frac, 0.0) + jnp.where(ar == b + 1, frac, 0.0)


def trilinear_mxu(
    tables: Sequence[jax.Array],
    dx: jax.Array,
    dy: jax.Array,
    dz: jax.Array,
) -> List[jax.Array]:
    """Sample every field's 27-table at per-voxel displacements (one chunk).

    tables: list of [C, 27*512]; dx/dy/dz: [C,512] clamped displacements.
    Returns list of [C,512] sampled values."""
    C = dx.shape[0]
    wx = hat_weights(CX.astype(jnp.float32) + 8.0 + dx)  # [C,512,24]
    wy = hat_weights(CY.astype(jnp.float32) + 8.0 + dy)
    wz = hat_weights(CZ.astype(jnp.float32) + 8.0 + dz)
    outs = []
    for tb in tables:
        B = assemble_blocks(tb).reshape(C, A, A * A)
        # MXU: [C,512,24] x [C,24,576] -> [C,512,576]
        t1 = jax.lax.dot_general(
            wx, B,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            # TPU DEFAULT matmul precision is one bf16 pass; this path is
            # parity-grade, so force true-f32 accumulation
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(C, TILE, A, A)
        t2 = jnp.sum(t1 * wy[:, :, :, None], axis=2)  # [C,512,24]
        outs.append(jnp.sum(t2 * wz, axis=2))  # [C,512]
    return outs
