"""Per-frame topology activation: grow/shrink the active tile set as the
simulation evolves, remapping field state between topologies.

The reference rebuilds its NanoVDB index grid from scratch every cook from
the union of all field topologies plus dilation
(`/root/reference/src/SOP/HNanoSolver/SOP_HNanoSolver.cpp:188-199`,
`HNanoSolver.cu:375-384`). The TPU equivalent keeps a capacity-padded table
and *remaps by key*: activation within capacity changes array values only
(no recompile); capacity grows by doubling (amortized recompiles).

Split of responsibilities:
- ``occupied_tile_mask`` (device): which active tiles still hold matter.
- ``topology_from_mask`` (host): new tile set = occupied tiles dilated by a
  radius, plus always-kept tiles (emitters); builds the new Topology.
- ``remap`` (device): gather every field from old rows to new rows by key.
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hnanosolver_tpu.core import coords as C
from hnanosolver_tpu.core.topology import Topology, build_topology
from hnanosolver_tpu.fields import COLLISION_FIELD, FieldState


def occupied_tile_mask(
    topo: Topology, state: FieldState, threshold: float = 1e-4
) -> jax.Array:
    """[T] bool: tile holds any field value above threshold (device-side).
    Velocity counts via its max |component|; collision_sdf does not count
    (solids don't drive topology in the reference either — the SDF is
    unioned separately by the caller if desired)."""
    occ = jnp.max(jnp.abs(state.velocity), axis=(0, 2))  # [3,T,512] -> [T]
    for name, f in state.scalars.items():
        if name == COLLISION_FIELD:
            continue
        occ = jnp.maximum(occ, jnp.max(jnp.abs(f), axis=1))  # [T,512] -> [T]
    ids = jax.lax.broadcasted_iota(jnp.int32, (topo.capacity, 1), 0)[:, 0]
    active = (ids >= 1) & (ids <= topo.n_active)
    return active & (occ > threshold)


def occupied_voxel_bboxes(
    topo: Topology, state: FieldState, threshold: float = 1e-4
):
    """Per-tile local bbox of occupied VOXELS (device-side).

    Returns (occ [T] bool, lo [T,3] int32, hi [T,3] int32) with lo/hi in
    local voxel coords [0,8); tiles with no occupied voxel have occ False.
    This is what voxel-granularity dilation needs: the reference's
    ``padding`` parameter dilates active VOXELS
    (`/root/reference/src/SOP/HNanoSolver/SOP_HNanoSolver.cpp:188-199`),
    not whole leaves."""
    v = jnp.max(jnp.abs(state.velocity), axis=0)  # [T,512]
    for name, f in state.scalars.items():
        if name == COLLISION_FIELD:
            continue
        v = jnp.maximum(v, jnp.abs(f))
    hot = (v > threshold).reshape(topo.capacity, 8, 8, 8)
    ids = jax.lax.broadcasted_iota(jnp.int32, (topo.capacity, 1), 0)[:, 0]
    active = (ids >= 1) & (ids <= topo.n_active)
    hot = hot & active[:, None, None, None]
    occ = jnp.any(hot, axis=(1, 2, 3))
    axes = [(2, 3), (1, 3), (1, 2)]
    lo, hi = [], []
    for a, other in enumerate(axes):
        proj = jnp.any(hot, axis=other)  # [T,8]
        lo.append(jnp.argmax(proj, axis=1))
        hi.append(7 - jnp.argmax(proj[:, ::-1], axis=1))
    return occ, jnp.stack(lo, -1).astype(jnp.int32), jnp.stack(hi, -1).astype(jnp.int32)


def tiles_covering_boxes(
    wmin: np.ndarray, wmax: np.ndarray, padding: int
) -> np.ndarray:
    """Tile coords covering every world-voxel box [wmin,wmax] dilated by
    Chebyshev-``padding`` voxels (box dilation — the semantics of repeated
    NN_FACE_EDGE_VERTEX dilateVoxels). [B,3] int voxel bounds in, [*,3]
    int32 tile coords out (duplicates allowed; build_topology dedups)."""
    if not len(wmin):
        return np.zeros((0, 3), np.int32)
    lo_t = np.floor_divide(np.asarray(wmin) - padding, 8)
    hi_t = np.floor_divide(np.asarray(wmax) + padding, 8)
    R = int((hi_t - lo_t).max()) + 1
    offs = np.stack(
        np.meshgrid(*([np.arange(R)] * 3), indexing="ij"), -1
    ).reshape(-1, 3)
    cand = lo_t[:, None, :] + offs[None]
    cand = np.minimum(cand, hi_t[:, None, :])  # clip; unique dedups
    return cand.reshape(-1, 3).astype(np.int32)


def topology_from_bboxes(
    topo: Topology,
    occ: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    padding: int,
    keep_tiles: Optional[np.ndarray] = None,
    min_capacity: Optional[int] = None,
) -> Topology:
    """Host-side voxel-granularity activation: the new tile set covers every
    occupied voxel's Chebyshev-``padding`` neighborhood (box dilation — the
    semantics of repeated NN_FACE_EDGE_VERTEX dilateVoxels). Tiles whose
    nearest occupied voxel is farther than ``padding`` stay inactive, unlike
    tile-radius dilation which over-activates by up to 7 voxels."""
    origins = np.asarray(topo.origins)
    occ = np.asarray(occ)
    wmin = origins[occ] * 8 + np.asarray(lo)[occ]
    wmax = origins[occ] * 8 + np.asarray(hi)[occ]
    parts = []
    if len(wmin):
        parts.append(tiles_covering_boxes(wmin, wmax, padding))
    if keep_tiles is not None and len(keep_tiles):
        parts.append(np.asarray(keep_tiles, np.int32))
    tiles = (np.concatenate(parts, axis=0) if parts
             else np.zeros((0, 3), np.int32))
    cap = max(topo.capacity, min_capacity or 0)
    n_unique = len(np.unique(C.pack_keys_np(tiles))) if len(tiles) else 0
    if cap < n_unique + 1:
        from hnanosolver_tpu.core.topology import _round_capacity

        cap = max(cap, _round_capacity(n_unique))
    return build_topology(tiles, capacity=cap)


def topology_from_mask(
    topo: Topology,
    occ_mask: np.ndarray,
    radius: int = 1,
    keep_tiles: Optional[np.ndarray] = None,
    min_capacity: Optional[int] = None,
) -> Topology:
    """Host-side: new topology = occupied tiles dilated by ``radius`` (tile
    granularity) union ``keep_tiles``. Capacity never shrinks below the
    current one (so steady states never recompile)."""
    origins = np.asarray(topo.origins)
    occ = np.asarray(occ_mask)
    hot = origins[occ]
    parts = [hot]
    if keep_tiles is not None and len(keep_tiles):
        parts.append(np.asarray(keep_tiles, np.int32))
    if not parts or sum(len(p) for p in parts) == 0:
        tiles = np.zeros((0, 3), np.int32)
    else:
        tiles = np.concatenate(parts, axis=0)
    if radius > 0 and len(tiles):
        offs = np.array(
            [
                (dx, dy, dz)
                for dx in range(-radius, radius + 1)
                for dy in range(-radius, radius + 1)
                for dz in range(-radius, radius + 1)
            ],
            np.int32,
        )
        tiles = (tiles[:, None, :] + offs[None, :, :]).reshape(-1, 3)
    cap = max(topo.capacity, min_capacity or 0)
    # Grow via the same slack policy as initial builds (topology._round_capacity:
    # pow2 below 2048 tiles, 25% slack above) — in-run growth previously doubled,
    # silently forfeiting the measured 1.4x slack win on growing sims.
    n_unique = len(np.unique(C.pack_keys_np(tiles))) if len(tiles) else 0
    if cap < n_unique + 1:
        from hnanosolver_tpu.core.topology import _round_capacity

        cap = max(cap, _round_capacity(n_unique))
    return build_topology(tiles, capacity=cap)


def remap_rows(old: Topology, new: Topology) -> jax.Array:
    """[T_new] int32: for each new table row, the old row holding the same
    tile key (0 where the tile is newly activated). Row 0 maps to row 0."""
    pos = jnp.searchsorted(old.keys, new.keys).astype(jnp.int32)
    pos = jnp.minimum(pos, old.capacity - 1)
    found = old.keys[pos] == new.keys
    rows = jnp.where(found, pos, 0)
    # padding rows of the new table must read zeros -> old row 0
    ids = jax.lax.broadcasted_iota(jnp.int32, (new.capacity, 1), 0)[:, 0]
    return jnp.where((ids >= 1) & (ids <= new.n_active), rows, 0)


def remap_state(old: Topology, new: Topology, state: FieldState) -> FieldState:
    """Gather every field from the old layout into the new one (device-side,
    jit-friendly when capacities match)."""
    rows = remap_rows(old, new)
    return FieldState(
        velocity=jnp.take(state.velocity, rows, axis=1),
        scalars={k: jnp.take(v, rows, axis=0) for k, v in state.scalars.items()},
    )


def expand_for_state(
    topo: Topology,
    state: FieldState,
    threshold: float = 1e-4,
    radius: int = 1,
    keep_tiles: Optional[np.ndarray] = None,
    padding: Optional[int] = None,
):
    """Host-driver convenience: one activation pass. Returns (topo, state),
    unchanged (same objects) if the active set is already exact.

    ``padding``: dilation in VOXELS (the reference SOP's parameter) — when
    set it replaces the tile-granularity ``radius``."""
    if padding is not None:
        occ, lo, hi = occupied_voxel_bboxes(topo, state, threshold)
        new_topo = topology_from_bboxes(
            topo, np.asarray(occ), np.asarray(lo), np.asarray(hi),
            padding, keep_tiles=keep_tiles,
        )
    else:
        occ = np.asarray(occupied_tile_mask(topo, state, threshold))
        new_topo = topology_from_mask(
            topo, occ, radius=radius, keep_tiles=keep_tiles
        )
    if new_topo.capacity == topo.capacity and bool(
        jnp.all(new_topo.keys == topo.keys)
    ):
        return topo, state
    return new_topo, remap_state(topo, new_topo, state)
