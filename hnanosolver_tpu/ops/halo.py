"""Halo assembly: gather 1-voxel shells from the 26 neighbor tiles.

The TPU-native equivalent of the reference's shared-memory 10^3 halo load
(`/root/reference/src/Cuda/Kernel.cu:539-548,714-722`): instead of per-thread
tree probes into NanoVDB, each offset direction performs ONE vectorized
gather of pre-sliced neighbor planes/edges/corners via the precomputed
``Topology.nbr`` table. Missing neighbors resolve to tile 0 (the null tile),
whose values are identically zero — background semantics for free.

All gathers are row-gathers over the leading (tile) axis, which XLA lowers
to efficient dynamic-gather loops on TPU; read volume is proportional to the
shell actually needed (faces 64 voxels, edges 8, corners 1), not whole tiles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hnanosolver_tpu.core.topology import Topology

# slice selectors per axis offset: source slice in the neighbor tile and
# destination slice in the padded tile.
#   offset -1: neighbor below provides its top plane (idx 7) -> pad idx 0
#   offset  0: own full extent (0..8) -> pad 1..9
#   offset +1: neighbor above provides its bottom plane (idx 0) -> pad idx 9
_SRC = {-1: slice(7, 8), 0: slice(0, 8), 1: slice(0, 1)}
_DST = {-1: slice(0, 1), 0: slice(1, 9), 1: slice(9, 10)}


def gather_halo(topo: Topology, field: jax.Array) -> jax.Array:
    """[T, 8, 8, 8, *ch] -> [T, 10, 10, 10, *ch] with 1-voxel neighbor halo."""
    T = field.shape[0]
    ch = field.shape[4:]
    pad = jnp.zeros((T, 10, 10, 10) + ch, field.dtype)
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                sub = field[:, _SRC[ox], _SRC[oy], _SRC[oz]]
                if (ox, oy, oz) == (0, 0, 0):
                    vals = sub
                else:
                    d = (ox + 1) * 9 + (oy + 1) * 3 + (oz + 1)
                    vals = jnp.take(sub, topo.nbr[:, d], axis=0)
                pad = pad.at[:, _DST[ox], _DST[oy], _DST[oz]].set(vals)
    return pad


def center(pad: jax.Array) -> jax.Array:
    """The un-padded 8^3 interior of a halo array."""
    return pad[:, 1:9, 1:9, 1:9]


def shift(pad: jax.Array, dx: int, dy: int, dz: int) -> jax.Array:
    """Neighbor view at integer offset (dx,dy,dz), each in [-1, 1]:
    ``shift(pad, 1, 0, 0)[t, i, j, k] == field[t-site + (1,0,0)]``."""
    return pad[:, 1 + dx : 9 + dx, 1 + dy : 9 + dy, 1 + dz : 9 + dz]
