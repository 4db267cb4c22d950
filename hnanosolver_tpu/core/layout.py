"""Canonical field layouts and flat<->block conversion.

TPU registers tile the LAST TWO dims of an array onto (8 sublanes, 128
lanes). A `[T,8,8,8]` field therefore uses 8 of 128 lanes (16x waste) and a
`[T,8,8,8,3]` velocity uses 3 of 128 (42x waste) — measured as 17 ms per
pressure sweep and 2.6 s per advection at 2.1M voxels. The canonical layouts
used by every hot op are:

- scalar field:   ``[T, 512]``      (512 = 4x128 lanes; x-major in-tile
                                     order col = x*64 + y*8 + z)
- velocity:       ``[3, T, 512]``   (channel-major: each component tiles
                                     perfectly; ops touch components anyway)

Block views ``[T,8,8,8]`` / ``[T,8,8,8,3]`` exist only at API boundaries
(I/O, tests, conversion) via the helpers here.

In-tile neighbor access in flat layout is a lane roll; see
``ops/stencil.py`` / ``ops/pressure.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TILE = 512

# static per-column coordinate decompositions (col = x*64 + y*8 + z)
COL = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
CX = COL // 64
CY = (COL // 8) % 8
CZ = COL % 8


def scalar_to_blocks(f: jax.Array) -> jax.Array:
    """[T,512] -> [T,8,8,8] (layout copy; boundary use only)."""
    return f.reshape(f.shape[0], 8, 8, 8)


def scalar_from_blocks(f: jax.Array) -> jax.Array:
    """[T,8,8,8] -> [T,512]."""
    return f.reshape(f.shape[0], TILE)


def vec_to_blocks(v: jax.Array) -> jax.Array:
    """[3,T,512] -> [T,8,8,8,3]."""
    return jnp.moveaxis(v, 0, -1).reshape(v.shape[1], 8, 8, 8, 3)


def vec_from_blocks(v: jax.Array) -> jax.Array:
    """[T,8,8,8,3] -> [3,T,512]."""
    return jnp.moveaxis(v.reshape(v.shape[0], TILE, 3), -1, 0)


def positions_flat(topo) -> tuple[jax.Array, jax.Array, jax.Array]:
    """World voxel coordinates as three [T,512] int32 arrays."""
    org = topo.origins * 8  # [T,3]
    return (
        org[:, 0:1] + CX,
        org[:, 1:2] + CY,
        org[:, 2:3] + CZ,
    )


def parity_flat(topo) -> jax.Array:
    """(i+j+k) & 1 per column, [T,512] int32."""
    org = topo.origins * 8
    base = (org[:, 0] + org[:, 1] + org[:, 2])[:, None]
    return (base + CX + CY + CZ) & 1
