"""Flat-layout pressure solver: the TPU-optimal formulation.

Arrays shaped [T, 8, 8, 8] tile onto TPU registers as (sublane=8, lane=8),
wasting 15/16 of every lane — measured 17 ms per red-black iteration at 2.1M
voxels. This module works on the flat view ``p [T, 512]`` (x-major in-tile
order), which tiles PERFECTLY ((8,128) native f32 tiles, 512 = 4x128):

- in-tile neighbor access  = lane rolls (+-1 for z, +-8 for y, +-64 for x),
- cross-tile faces         = one full-row gather per direction (contiguous
  2 KB rows — the measured-fast gather) + a roll that lands the neighbor's
  boundary plane on our boundary columns + a masked select,
- the whole sweep fuses into a single elementwise pass.

Semantics identical to ops/pressure.py (reference redBlackGaussSeidelUpdate,
`/root/reference/src/Cuda/Kernel.cu:591-623`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from hnanosolver_tpu.core.topology import Topology, voxel_positions

# column decomposition of the flat index: col = x*64 + y*8 + z
_COL = jax.lax.broadcasted_iota(jnp.int32, (1, 512), 1)
_CX = _COL // 64
_CY = (_COL // 8) % 8
_CZ = _COL % 8

# (direction) -> (axis masks, in-tile roll, neighbor-fix roll, nbr index)
# roll semantics: jnp.roll(p, s, 1)[col] == p[col - s]
_DIRS = {
    # +x: value at (x+1,y,z) = col+64; boundary x==7 takes neighbor's x=0
    # plane (cols 0..63) placed at cols 448..511 -> roll by +448
    (1, 0, 0): (_CX == 7, -64, 448),
    (-1, 0, 0): (_CX == 0, 64, -448),
    (0, 1, 0): (_CY == 7, -8, 56),
    (0, -1, 0): (_CY == 0, 8, -56),
    (0, 0, 1): (_CZ == 7, -1, 7),
    (0, 0, -1): (_CZ == 0, 1, -7),
}


def _d_of(off: Tuple[int, int, int]) -> int:
    return (off[0] + 1) * 9 + (off[1] + 1) * 3 + (off[2] + 1)


def shifted_views_flat(topo: Topology, p: jax.Array):
    """All six +-1 face-shifted views of ``p [T,512]``, background-correct.

    Note the boundary fix roll is exact: for +y, our col (x,7,z) needs the
    +y neighbor's (x,0,z) = col - 56; rolls for z wrap within groups but the
    mask only reads the correctly-aligned positions."""
    out = {}
    for off, (mask, s_in, s_fix) in _DIRS.items():
        n = jnp.take(p, topo.nbr[:, _d_of(off)], axis=0)
        rolled_p = jnp.roll(p, s_in, axis=1)
        rolled_n = jnp.roll(n, s_fix, axis=1)
        out[off] = jnp.where(mask, rolled_n, rolled_p)
    return out


def neighbor_sum_flat(topo: Topology, p: jax.Array) -> jax.Array:
    v = shifted_views_flat(topo, p)
    return (
        v[(1, 0, 0)] + v[(-1, 0, 0)]
        + v[(0, 1, 0)] + v[(0, -1, 0)]
        + v[(0, 0, 1)] + v[(0, 0, -1)]
    )


def _parity_flat(topo: Topology) -> jax.Array:
    """(i+j+k)&1 per flat column, [T,512]."""
    org = topo.origins * 8
    base = (org[:, 0] + org[:, 1] + org[:, 2])[:, None]
    return (base + _CX + _CY + _CZ) & 1


def solve_pressure_flat(
    topo: Topology,
    div: jax.Array,
    iterations: int,
    dx: float,
    omega: float,
    p0=None,
) -> jax.Array:
    """Drop-in replacement for ops.pressure.solve_pressure; accepts/returns
    [T,8,8,8] (reshaped to flat internally, once)."""
    T = div.shape[0]
    div_f = div.reshape(T, 512)
    parity = _parity_flat(topo)
    red = parity == 0
    dx2 = dx * dx
    p = jnp.zeros_like(div_f) if p0 is None else p0.reshape(T, 512)

    def sweep(p, mask):
        pgs = (neighbor_sum_flat(topo, p) - div_f * dx2) * (1.0 / 6.0)
        return jnp.where(mask, p + omega * (pgs - p), p)

    def body(_, p):
        p = sweep(p, red)
        p = sweep(p, ~red)
        return p

    p = jax.lax.fori_loop(0, iterations, body, p)
    return p.reshape(div.shape)
