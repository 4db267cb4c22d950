"""Dense array <-> sparse tile conversion.

The device-side analog of the reference's IndexGridBuilder encode/decode
(`/root/reference/src/Utils/GridBuilder.hpp:87-216`): where the reference
memcpy's OpenVDB leaf buffers into flat SoA arrays per leaf (TBB-parallel),
we reshape/transpose between ``[N, N, N]`` boxes and ``[T, 8, 8, 8]`` tile
stacks — pure layout ops XLA compiles to copies. Used by tests, I/O, and the
viewer; large-scale host-side encode lives in the native C++ tile builder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hnanosolver_tpu.core import coords as C
from hnanosolver_tpu.core.topology import Topology, lookup_tiles


def dense_to_tiles(topo: Topology, dense: jax.Array, origin=(0, 0, 0)) -> jax.Array:
    """Scatter a dense ``[Nx, Ny, Nz, *ch]`` box (voxel ``origin`` aligned to
    8) into tile layout ``[T, 8, 8, 8, *ch]`` matching ``topo``. Tiles outside
    the box become zero."""
    L = C.LEAF
    Nx, Ny, Nz = dense.shape[:3]
    ch = dense.shape[3:]
    assert Nx % L == 0 and Ny % L == 0 and Nz % L == 0
    tx, ty, tz = Nx // L, Ny // L, Nz // L
    # [tx,ty,tz,8,8,8,*ch] tile-major blocks
    blocks = dense.reshape((tx, L, ty, L, tz, L) + ch)
    blocks = jnp.moveaxis(blocks, (1, 3), (3, 4))  # -> tx,ty,tz,8,8,8,ch
    blocks = blocks.reshape((tx * ty * tz, L, L, L) + ch)

    ot = np.asarray(origin, np.int32) // L
    gx, gy, gz = np.meshgrid(
        np.arange(tx) + ot[0], np.arange(ty) + ot[1], np.arange(tz) + ot[2],
        indexing="ij",
    )
    tiles = jnp.asarray(np.stack([gx, gy, gz], -1).reshape(-1, 3))
    ids = lookup_tiles(topo, tiles)  # [tx*ty*tz]

    out = jnp.zeros((topo.capacity, L, L, L) + ch, dense.dtype)
    # rows with id 0 all write the null tile; make those writes zero so the
    # null-tile invariant survives.
    blocks = jnp.where(
        (ids > 0).reshape((-1,) + (1,) * (blocks.ndim - 1)), blocks, 0
    )
    return out.at[ids].set(blocks)


def tiles_to_dense(
    topo: Topology, field: jax.Array, shape, origin=(0, 0, 0)
) -> jax.Array:
    """Gather tiles back into a dense box (zeros where no tile is active)."""
    L = C.LEAF
    Nx, Ny, Nz = (int(s) for s in shape)
    ch = field.shape[4:]
    tx, ty, tz = Nx // L, Ny // L, Nz // L
    ot = np.asarray(origin, np.int32) // L
    gx, gy, gz = np.meshgrid(
        np.arange(tx) + ot[0], np.arange(ty) + ot[1], np.arange(tz) + ot[2],
        indexing="ij",
    )
    tiles = jnp.asarray(np.stack([gx, gy, gz], -1).reshape(-1, 3))
    ids = lookup_tiles(topo, tiles)
    blocks = jnp.take(field, ids, axis=0)  # [tx*ty*tz,8,8,8,ch]
    blocks = blocks.reshape((tx, ty, tz, L, L, L) + ch)
    blocks = jnp.moveaxis(blocks, (3, 4), (1, 3))
    return blocks.reshape((Nx, Ny, Nz) + ch)
