"""Dynamic topology activation: remap correctness and plume growth."""

import jax.numpy as jnp
import numpy as np
import pytest

from hnanosolver_tpu.config import SolverParams
from hnanosolver_tpu.core.activation import (
    expand_for_state,
    occupied_tile_mask,
    remap_state,
    topology_from_mask,
)
from hnanosolver_tpu.core.topology import (
    active_mask,
    build_topology,
    lookup_tiles,
)
from hnanosolver_tpu.fields import zeros_state
from hnanosolver_tpu.models.plume import (
    PlumeConfig,
    initial_state,
    initial_topology,
    run_plume,
)


def test_remap_preserves_values():
    from hnanosolver_tpu.core.layout import positions_flat

    old = build_topology(np.array([[0, 0, 0], [1, 0, 0]], np.int32))
    state = zeros_state(old)
    px, py, _ = positions_flat(old)
    rho = (px + 100 * py).astype(jnp.float32) * active_mask(old)[:, None]
    state = state.with_scalar("density", rho)

    new = build_topology(
        np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [0, 1, 0]], np.int32)
    )
    new_state = remap_state(old, new, state)
    # values carried over by key, not by row index
    for tile in [(0, 0, 0), (1, 0, 0)]:
        oid = int(lookup_tiles(old, jnp.array(tile, jnp.int32)))
        nid = int(lookup_tiles(new, jnp.array(tile, jnp.int32)))
        np.testing.assert_array_equal(
            np.asarray(new_state.scalars["density"][nid]),
            np.asarray(state.scalars["density"][oid]),
        )
    # newly activated tiles read zero
    nid2 = int(lookup_tiles(new, jnp.array([2, 0, 0], jnp.int32)))
    assert float(jnp.max(jnp.abs(new_state.scalars["density"][nid2]))) == 0.0


def test_occupancy_and_expand():
    topo = build_topology(np.array([[0, 0, 0], [3, 3, 3]], np.int32), capacity=64)
    state = zeros_state(topo)
    rho = jnp.zeros((topo.capacity, 512))
    id0 = int(lookup_tiles(topo, jnp.array([0, 0, 0], jnp.int32)))
    rho = rho.at[id0, (4 * 8 + 4) * 8 + 4].set(1.0)  # voxel (4,4,4)
    state = state.with_scalar("density", rho)

    occ = np.asarray(occupied_tile_mask(topo, state))
    assert occ[id0] and occ.sum() == 1

    new_topo, new_state = expand_for_state(topo, state, radius=1)
    # 27 neighbors of (0,0,0) active; the empty (3,3,3) tile dropped
    assert int(new_topo.n_active) == 27
    assert int(lookup_tiles(new_topo, jnp.array([3, 3, 3], jnp.int32))) == 0
    nid = int(lookup_tiles(new_topo, jnp.array([0, 0, 0], jnp.int32)))
    assert float(new_state.scalars["density"][nid, (4 * 8 + 4) * 8 + 4]) == 1.0
    # same capacity -> no recompile-triggering shape change
    assert new_topo.capacity == topo.capacity


@pytest.mark.slow
def test_plume_grows_and_rises():
    cfg = PlumeConfig(
        center=(32.0, 12.0, 32.0),
        radius=6.0,
        velocity_jet=4.0,
    )
    params = SolverParams(dt=0.25, iterations=8, voxel_size=0.5)
    topo = initial_topology(cfg)
    n0 = int(topo.n_active)
    topo, state = run_plume(6, params=params, cfg=cfg, topo=topo)
    assert int(topo.n_active) > n0  # plume expanded the active set
    # density mass exists and has risen above the emitter
    from hnanosolver_tpu.core.layout import positions_flat

    rho = state.scalars["density"]
    _, py, _ = positions_flat(topo)
    assert float(jnp.sum(rho)) > 0
    top_y = float(jnp.max(jnp.where(rho > 0.01, py.astype(jnp.float32), -1e9)))
    assert top_y > 12.0 + 6.0  # matter above the emitter sphere
    # null tile invariant survived repeated remaps
    assert float(jnp.max(jnp.abs(state.velocity[:, 0]))) == 0.0


def test_voxel_granularity_padding(rng):
    """The reference's `padding` dilates VOXELS: matter hugging one corner
    of a tile must activate only the tiles within `padding` voxels of that
    corner, not the full 26-tile ring."""
    import jax.numpy as jnp
    import numpy as np

    from hnanosolver_tpu.core.activation import (
        occupied_voxel_bboxes,
        topology_from_bboxes,
    )
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state

    topo = build_topology(np.array([[4, 4, 4]], np.int32))
    state = zeros_state(topo)
    # occupy exactly the (0,0,0) local corner voxel of the single tile
    dens = jnp.zeros((topo.capacity, 512)).at[1, 0].set(1.0)
    state = state.with_scalar("density", dens)

    occ, lo, hi = occupied_voxel_bboxes(topo, state, threshold=1e-4)
    assert bool(occ[1])
    assert np.asarray(lo)[1].tolist() == [0, 0, 0]
    assert np.asarray(hi)[1].tolist() == [0, 0, 0]

    new = topology_from_bboxes(topo, np.asarray(occ), np.asarray(lo),
                               np.asarray(hi), padding=1)
    got = set(map(tuple, np.asarray(new.origins[1 : int(new.n_active) + 1]).tolist()))
    # corner voxel (32,32,32) +-1 spans tiles {3,4}^3 = 8 tiles
    want = {(x, y, z) for x in (3, 4) for y in (3, 4) for z in (3, 4)}
    assert got == want, got

    # padding spanning a full tile reaches the +x ring too
    new8 = topology_from_bboxes(topo, np.asarray(occ), np.asarray(lo),
                                np.asarray(hi), padding=8)
    got8 = set(map(tuple, np.asarray(new8.origins[1 : int(new8.n_active) + 1]).tolist()))
    assert (5, 4, 4) in got8 and (2, 3, 3) not in got8
    # tile-granularity dilation would include the whole 26-ring around (4,4,4)
    assert (5, 5, 5) not in got
