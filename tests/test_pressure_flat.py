"""Flat-layout pressure solver must match the reference-layout solver."""

import jax.numpy as jnp
import numpy as np

from hnanosolver_tpu.core.topology import (
    active_mask,
    build_topology,
    build_topology_dense,
)
from hnanosolver_tpu.ops import pressure as prs
from hnanosolver_tpu.ops.pressure_flat import (
    neighbor_sum_flat,
    solve_pressure_flat,
)


def test_neighbor_sum_flat_matches(rng):
    tiles = [(x, y, z) for x in range(3) for y in range(3) for z in range(2)
             if (x + 2 * y + z) % 4 != 3]
    topo = build_topology(np.array(tiles, np.int32))
    p = jnp.asarray(
        rng.standard_normal((topo.capacity, 8, 8, 8)).astype(np.float32)
    ) * active_mask(topo)[:, None, None, None]
    want = prs._neighbor_sum(topo, p)
    got = neighbor_sum_flat(topo, p.reshape(topo.capacity, 512)).reshape(p.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_solver_flat_matches(rng):
    topo = build_topology_dense((16, 16, 16))
    div = jnp.asarray(
        rng.standard_normal((topo.capacity, 8, 8, 8)).astype(np.float32)
    ) * active_mask(topo)[:, None, None, None]
    want = prs.solve_pressure(topo, div, 7, 0.25, 1.17)
    got = solve_pressure_flat(topo, div, 7, 0.25, 1.17)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
