"""Explicit slab decomposition: shard_map + ppermute ghost-tile exchange.

The reference is single-GPU (SURVEY §5.8); this is the TPU-native scale-out
design (SURVEY §7.2 phase 5, BASELINE config 5):

- Active tiles are partitioned into D contiguous **x-slabs** (packed keys
  sort x-major, so slab = contiguous key range) balanced by tile count,
  with slab boundaries snapped to x-layers so every cross-slab neighbor
  lives on an adjacent device.
- Each device's local tile table is ``[null, ghosts_lo, local, ghosts_hi,
  pad..., trash]`` — still key-sorted, so all single-device machinery
  (sorted lookup, neighbor table, halo gathers, local samplers) runs
  unchanged on the local slice.
- **Ghost refresh** = one ``lax.ppermute`` per direction over the ICI ring:
  owners push their boundary-layer tiles into the neighbors' ghost rows.
  This is the distributed analog of the reference's shared-memory halo load
  (`/root/reference/src/Cuda/Kernel.cu:539-548`) — ghosts refresh before
  every halo-consuming op and every pressure sweep.
- Compute runs redundantly on ghost rows and is masked out of outputs; only
  the refresh communicates. Per-step traffic = boundary layers only
  (2 x-layers per device per refresh), riding ICI.

Capacities are padded to a common power-of-two so arrays stack to
``[D, Tl, ...]`` and shard on axis 0 of a 1-D mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hnanosolver_tpu.config import SolverParams
from hnanosolver_tpu.core import coords as C
from hnanosolver_tpu.core.topology import Topology, build_topology
from hnanosolver_tpu.fields import FieldState


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SlabTopology:
    """Stacked per-device local tables, sharded on axis 0 under shard_map."""

    keys: jax.Array  # [D, Tl]
    origins: jax.Array  # [D, Tl, 3]
    nbr: jax.Array  # [D, Tl, 27]
    n_rows: jax.Array  # [D] rows in use (null + ghosts + local)
    local_mask: jax.Array  # [D, Tl] 1.0 on OWNED rows only
    send_lo: jax.Array  # [D, G] local rows whose values go to device d-1
    send_hi: jax.Array  # [D, G] local rows whose values go to device d+1
    recv_lo: jax.Array  # [D, G] ghost rows receiving from d-1 (trash-padded)
    recv_hi: jax.Array  # [D, G] ghost rows receiving from d+1

    @property
    def n_devices(self) -> int:
        return self.keys.shape[0]

    @property
    def capacity(self) -> int:
        return self.keys.shape[1]

    def tree_flatten(self):
        return (
            self.keys, self.origins, self.nbr, self.n_rows, self.local_mask,
            self.send_lo, self.send_hi, self.recv_lo, self.recv_hi,
        ), ()

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


def _snap_partition(xs: np.ndarray, n_dev: int) -> List[Tuple[int, int]]:
    """Split sorted x-layer values into n_dev contiguous layer ranges with
    balanced tile counts. Returns [(x_min, x_max_inclusive)] per device."""
    layers, counts = np.unique(xs, return_counts=True)
    if len(layers) < n_dev:
        raise ValueError(
            f"need >= {n_dev} x tile-layers to shard over {n_dev} devices, "
            f"have {len(layers)}"
        )
    total = counts.sum()
    cum = np.cumsum(counts)
    # cut after the layer whose cumulative count is closest to d*total/D,
    # keeping at least one layer per device on both sides of every cut.
    cuts = [0]
    for d in range(1, n_dev):
        ideal = d * total / n_dev
        lo = cuts[-1] + 1  # leave >= 1 layer for this slab
        hi = len(layers) - (n_dev - d)  # leave >= 1 layer per remaining slab
        cand = np.arange(lo, hi + 1)
        best = cand[np.argmin(np.abs(cum[cand - 1] - ideal))]
        cuts.append(int(best))
    cuts.append(len(layers))
    return [
        (int(layers[cuts[d]]), int(layers[cuts[d + 1] - 1])) for d in range(n_dev)
    ]


def build_slabs(topo: Topology, n_devices: int, capacity: Optional[int] = None) -> SlabTopology:
    """Host-side: partition an existing Topology into per-device local tables
    with ghost layers and exchange index maps."""
    n = int(topo.n_active)
    tiles = np.asarray(topo.origins[1 : n + 1])  # sorted by key (x-major)
    bounds = _snap_partition(tiles[:, 0], n_devices)

    locals_: List[np.ndarray] = []
    ghosts_lo: List[np.ndarray] = []
    ghosts_hi: List[np.ndarray] = []
    for d, (x0, x1) in enumerate(bounds):
        own = tiles[(tiles[:, 0] >= x0) & (tiles[:, 0] <= x1)]
        locals_.append(own)
        if d > 0:
            px0, px1 = bounds[d - 1]
            ghosts_lo.append(tiles[tiles[:, 0] == px1])  # prev device's top layer
        else:
            ghosts_lo.append(np.zeros((0, 3), np.int32))
        if d < n_devices - 1:
            nx0, nx1 = bounds[d + 1]
            ghosts_hi.append(tiles[tiles[:, 0] == nx0])
        else:
            ghosts_hi.append(np.zeros((0, 3), np.int32))

    n_rows_needed = max(
        1 + len(g0) + len(lc) + len(g1)
        for g0, lc, g1 in zip(ghosts_lo, locals_, ghosts_hi)
    )
    cap = capacity or 16
    while cap < n_rows_needed + 1:  # +1 for the trash row at the end
        cap *= 2
    G = max(max(len(g) for g in ghosts_lo), max(len(g) for g in ghosts_hi), 1)
    trash = cap - 1

    D = n_devices
    keys = np.full((D, cap), C.PAD_KEY, np.int32)
    origins = np.full((D, cap, 3), 1 << 20, np.int32)
    nbr = np.zeros((D, cap, 27), np.int32)
    n_rows = np.zeros((D,), np.int32)
    local_mask = np.zeros((D, cap), np.float32)
    send_lo = np.zeros((D, G), np.int32)
    send_hi = np.zeros((D, G), np.int32)
    recv_lo = np.full((D, G), trash, np.int32)
    recv_hi = np.full((D, G), trash, np.int32)

    offs = np.array(
        [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
        np.int32,
    )

    row_of: List[dict] = []
    for d in range(D):
        table = np.concatenate([ghosts_lo[d], locals_[d], ghosts_hi[d]], axis=0)
        k = C.pack_keys_np(table)
        order = np.argsort(k)  # ghosts_lo < local < ghosts_hi already, but be safe
        table, k = table[order], k[order]
        m = len(table)
        keys[d, 0] = C.NULL_KEY
        keys[d, 1 : m + 1] = k
        origins[d, 1 : m + 1] = table
        n_rows[d] = m + 1
        # neighbor table within the local key set
        nk = C.pack_keys_np(table[:, None, :] + offs[None, :, :])
        pos = np.searchsorted(k, nk)
        posc = np.minimum(pos, m - 1)
        found = k[posc] == nk
        nbr[d, 1 : m + 1] = np.where(found, posc + 1, 0)
        rows = {int(kk): i + 1 for i, kk in enumerate(k)}
        row_of.append(rows)
        x0, x1 = bounds[d]
        own_mask = (table[:, 0] >= x0) & (table[:, 0] <= x1)
        local_mask[d, 1 : m + 1] = own_mask.astype(np.float32)

    for d in range(D):
        if d > 0:
            g = ghosts_lo[d]  # owned by d-1 (its top layer)
            gk = C.pack_keys_np(g)
            for i, kk in enumerate(gk):
                recv_lo[d, i] = row_of[d][int(kk)]
                send_hi[d - 1, i] = row_of[d - 1][int(kk)]
        if d < D - 1:
            g = ghosts_hi[d]
            gk = C.pack_keys_np(g)
            for i, kk in enumerate(gk):
                recv_hi[d, i] = row_of[d][int(kk)]
                send_lo[d + 1, i] = row_of[d + 1][int(kk)]

    return SlabTopology(
        keys=jnp.asarray(keys),
        origins=jnp.asarray(origins),
        nbr=jnp.asarray(nbr),
        n_rows=jnp.asarray(n_rows),
        local_mask=jnp.asarray(local_mask),
        send_lo=jnp.asarray(send_lo),
        send_hi=jnp.asarray(send_hi),
        recv_lo=jnp.asarray(recv_lo),
        recv_hi=jnp.asarray(recv_hi),
    )


def scatter_state(topo: Topology, slab: SlabTopology, state: FieldState) -> FieldState:
    """Re-layout a global FieldState into stacked per-device local tables
    (host-side, by key match; ghosts filled too)."""
    D, Tl = slab.keys.shape

    pos = jnp.searchsorted(topo.keys, slab.keys.reshape(-1)).astype(jnp.int32)
    pos = jnp.minimum(pos, topo.capacity - 1)
    found = topo.keys[pos] == slab.keys.reshape(-1)
    rows = jnp.where(found, pos, 0)

    def remap(field):  # scalars [T,512] -> [D,Tl,512]
        return jnp.take(field, rows, axis=0).reshape((D, Tl) + field.shape[1:])

    # velocity [3,T,512] -> [D,3,Tl,512] (device axis outermost for sharding)
    vel = jnp.take(state.velocity, rows, axis=1).reshape(3, D, Tl, -1)
    return FieldState(
        velocity=jnp.moveaxis(vel, 0, 1),
        scalars={k: remap(v) for k, v in state.scalars.items()},
    )


def gather_state(topo: Topology, slab: SlabTopology, state: FieldState) -> FieldState:
    """Inverse of scatter_state: merge owned rows back into the global table."""
    D, Tl = slab.keys.shape
    flat_keys = np.asarray(slab.keys).reshape(-1)
    owned = np.asarray(slab.local_mask).reshape(-1) > 0
    gk = np.asarray(topo.keys)
    pos = np.searchsorted(gk, flat_keys[owned])
    rows = jnp.asarray(pos.astype(np.int32))

    sel = jnp.asarray(np.flatnonzero(owned))

    def merge(field):  # [D,Tl,512] -> [T,512]
        flat = field.reshape((D * Tl,) + field.shape[2:])
        out = jnp.zeros((topo.capacity,) + field.shape[2:], field.dtype)
        return out.at[rows].set(flat[sel])

    # velocity [D,3,Tl,512] -> [3,T,512]
    velf = jnp.moveaxis(state.velocity, 1, 0).reshape(3, D * Tl, -1)
    velo = jnp.zeros((3, topo.capacity, velf.shape[-1]), velf.dtype)
    velo = velo.at[:, rows].set(velf[:, sel])
    return FieldState(
        velocity=velo,
        scalars={k: merge(v) for k, v in state.scalars.items()},
    )


# ---------------------------------------------------------------------------
# Device-local step under shard_map
# ---------------------------------------------------------------------------


def _local_topo(slab_slice) -> Topology:
    keys, origins, nbr, n_rows = slab_slice
    return Topology(keys=keys, origins=origins, nbr=nbr, n_active=n_rows - 1)


def make_refresh(axis: str, send_lo, send_hi, recv_lo, recv_hi, n_devices: int):
    """Ghost refresh closure for use inside shard_map: one ppermute per
    direction pushes boundary-layer tile values into neighbor ghost rows.
    Handles both [T,512] scalars and [3,T,512] velocity (row axis differs)."""
    fwd = [(i, i + 1) for i in range(n_devices - 1)]
    bwd = [(i + 1, i) for i in range(n_devices - 1)]

    def refresh(field: jax.Array) -> jax.Array:
        ax = 1 if field.ndim == 3 else 0  # velocity is channel-major
        up = jax.lax.ppermute(jnp.take(field, send_hi, axis=ax), axis, fwd)
        dn = jax.lax.ppermute(jnp.take(field, send_lo, axis=ax), axis, bwd)
        # trash-row padding absorbs unused slots; row 0 (null) is never a
        # recv target so the background invariant holds.
        if ax == 0:
            return field.at[recv_lo].set(up).at[recv_hi].set(dn)
        return field.at[:, recv_lo].set(up).at[:, recv_hi].set(dn)

    return refresh


def sharded_plume_step(
    mesh: Mesh,
    slab: SlabTopology,
    params: SolverParams,
    cfg=None,
    axis: str = "x",
):
    """jit(shard_map(...)) full step over stacked slab state. Returns
    fn(slab, state) -> state with every field sharded on the device axis."""
    try:
        from jax import shard_map  # jax >= 0.5
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    from hnanosolver_tpu.fields import COLLISION_FIELD
    from hnanosolver_tpu.models.plume import emit
    from hnanosolver_tpu.ops import advection as adv
    from hnanosolver_tpu.ops import collision as col
    from hnanosolver_tpu.ops import combustion as comb
    from hnanosolver_tpu.ops import pressure as prs
    from hnanosolver_tpu.ops import stencil as stn

    D = slab.n_devices
    c = params.combustion
    inv_dx = params.inv_voxel_size
    dt = params.dt

    def local_step(slab_arrs, vel, scalars):
        # shard_map hands each [D, ...] array as its local [1, ...] block
        (keys, origins, nbr, n_rows, local_mask,
         send_lo, send_hi, recv_lo, recv_hi) = (a[0] for a in slab_arrs)
        vel = vel[0]
        scalars = {k: v[0] for k, v in scalars.items()}
        n_rows = n_rows[()] if n_rows.ndim == 0 else n_rows
        topo = _local_topo((keys, origins, nbr, n_rows))
        refresh = make_refresh(axis, send_lo, send_hi, recv_lo, recv_hi, D)

        vel = refresh(vel)
        scalars = {k: refresh(v) for k, v in scalars.items()}
        state = FieldState(velocity=vel, scalars=scalars)
        if cfg is not None:
            state = emit(topo, state, cfg, dt)
            state = FieldState(
                velocity=refresh(state.velocity),
                scalars={k: refresh(v) for k, v in state.scalars.items()},
            )
        vel = state.velocity
        scalars = state.scalars

        sdf = scalars.get(COLLISION_FIELD) if params.has_collision else None
        if sdf is not None:
            vel = refresh(col.enforce_collision(topo, vel, sdf, inv_dx))

        u_star = adv.advect_velocity(topo, vel, dt, inv_dx, sdf)
        u_star = refresh(u_star)
        u_star = stn.vorticity_confinement(
            topo, u_star, dt, inv_dx, c.vorticity_scale, c.factor_scale
        )
        u_star = refresh(u_star)
        div = stn.divergence(topo, u_star, inv_dx)

        fuel, waste, temp, flame, div = comb.combustion_oxygen(
            scalars["fuel"], scalars["waste"], scalars["temperature"],
            scalars["flame"], div, c.temperature_release, c.expansion_rate,
        )
        u_star = comb.temperature_buoyancy(
            u_star, temp, dt, c.ambient_temp, c.buoyancy_strength
        )

        # pressure loop with per-sweep ghost refresh
        from hnanosolver_tpu.core.layout import parity_flat

        dx2 = params.voxel_size * params.voxel_size
        parity = parity_flat(topo)
        p = jnp.zeros_like(div)
        div = refresh(div)

        def sweep(p, color):
            p = refresh(p)
            return prs._color_sweep(topo, p, div, dx2, params.omega, parity == color)

        def body(_, p):
            p = sweep(p, 0)
            p = sweep(p, 1)
            return p

        p = jax.lax.fori_loop(0, params.iterations, body, p)
        p = refresh(p)
        u_star = refresh(u_star)
        vel_out = stn.subtract_pressure_gradient(topo, u_star, p, inv_dx)
        if sdf is not None:
            vel_out = col.enforce_collision(topo, vel_out, sdf, inv_dx)
            vel_out = col.enforce_collision(topo, vel_out, sdf, inv_dx)
        vel_out = refresh(vel_out)

        to_advect = dict(scalars)
        to_advect.update(fuel=fuel, waste=waste, temperature=temp, flame=flame)
        sdf_in = to_advect.pop(COLLISION_FIELD, None)
        to_advect = {k: refresh(v) for k, v in to_advect.items()}
        advected = adv.advect_scalars_fused(
            topo, vel_out, to_advect, dt, inv_dx, sdf
        )
        if sdf_in is not None:
            advected[COLLISION_FIELD] = sdf_in

        m = local_mask[:, None]  # [Tl,1]
        return (
            (vel_out * m[None])[None],   # [1,3,Tl,512]
            {k: (v * m)[None] for k, v in advected.items()},
        )

    def step_fn(slab_in: SlabTopology, state: FieldState) -> FieldState:
        slab_leaves = tuple(slab_in.tree_flatten()[0])
        scalars_spec = {k: P(axis) for k in state.scalars}
        fn = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(
                tuple(P(axis) for _ in slab_leaves),
                P(axis),
                scalars_spec,
            ),
            out_specs=(P(axis), scalars_spec),
        )
        vel, scalars = fn(slab_leaves, state.velocity, state.scalars)
        return FieldState(velocity=vel, scalars=scalars)

    return jax.jit(step_fn)
