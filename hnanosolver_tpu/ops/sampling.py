"""Sparse field samplers: nearest and trilinear at arbitrary positions.

Functional re-design of the reference's device samplers
(`/root/reference/src/Utils/Stencils.hpp:20-173`):

- ``IndexSampler<T,0>`` (nearest)    -> :func:`sample_nearest`
- ``IndexSampler<T,1>``/``TrilinearSampler`` -> :func:`sample_trilinear`

Inactive voxels read as exact background 0 via the null tile. Note the
reference's *manual* interpolation paths clamp a missing offset to array
index 0 — i.e. they read voxel 0's value instead of background
(`/root/reference/src/Cuda/Kernel.cu:132-133,191-192`); we implement the
correct background convention everywhere (documented deviation, SURVEY §7.5).

Positions are in index space (voxel units), matching the reference's
``coord.asVec3s()`` convention where voxel centers sit at integer positions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hnanosolver_tpu.core import coords as C
from hnanosolver_tpu.core.topology import Topology, lookup_voxels


def _flat(field: jax.Array) -> jax.Array:
    """[T,8,8,8,*ch] -> [T*512, *ch]."""
    T = field.shape[0]
    return field.reshape((T * C.TILE_VOXELS,) + field.shape[4:])


def sample_nearest(topo: Topology, field: jax.Array, voxel_coords) -> jax.Array:
    """Integer-coordinate read; background 0 outside the active set."""
    idx = lookup_voxels(topo, voxel_coords)
    return jnp.take(_flat(field), idx, axis=0)


def sample_trilinear(topo: Topology, field: jax.Array, pos) -> jax.Array:
    """Trilinear interpolation at float positions ``[..., 3]``.

    8-corner gather with fused weight products, mirroring the math of
    `/root/reference/src/Utils/Stencils.hpp:95-164` (lerp ordering) and the
    manual path in `/root/reference/src/Cuda/Kernel.cu:163-196` (weight
    products w00*itz etc.), with true zero background at inactive corners.
    """
    pos = jnp.asarray(pos)
    base = jnp.floor(pos)
    frac = pos - base
    base = base.astype(jnp.int32)

    tx, ty, tz = frac[..., 0], frac[..., 1], frac[..., 2]
    itx, ity, itz = 1.0 - tx, 1.0 - ty, 1.0 - tz
    w00, w10 = itx * ity, tx * ity
    w01, w11 = itx * ty, tx * ty
    weights = (
        w00 * itz,  # (0,0,0)
        w10 * itz,  # (1,0,0)
        w01 * itz,  # (0,1,0)
        w11 * itz,  # (1,1,0)
        w00 * tz,  # (0,0,1)
        w10 * tz,  # (1,0,1)
        w01 * tz,  # (0,1,1)
        w11 * tz,  # (1,1,1)
    )
    corners = (
        (0, 0, 0),
        (1, 0, 0),
        (0, 1, 0),
        (1, 1, 0),
        (0, 0, 1),
        (1, 0, 1),
        (0, 1, 1),
        (1, 1, 1),
    )
    flat = _flat(field)
    vector = field.ndim == 5
    acc = None
    for (di, dj, dk), w in zip(corners, weights):
        coord = base + jnp.array([di, dj, dk], dtype=jnp.int32)
        idx = lookup_voxels(topo, coord)
        v = jnp.take(flat, idx, axis=0)
        if vector:
            v = v * w[..., None]
        else:
            v = v * w
        acc = v if acc is None else acc + v
    return acc
