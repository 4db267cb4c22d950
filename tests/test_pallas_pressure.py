"""Fused Pallas color sweep vs the XLA red-black solver (interpret on CPU)."""

import jax.numpy as jnp
import numpy as np

from hnanosolver_tpu.core.topology import (
    active_mask,
    build_topology,
    build_topology_dense,
)
from hnanosolver_tpu.ops import pressure as prs
from hnanosolver_tpu.ops.pallas_pressure import solve_pressure_pallas


def _check(topo, rng, iters=6):
    div = jnp.asarray(
        rng.standard_normal((topo.capacity, 512)).astype(np.float32)
    ) * active_mask(topo)[:, None]
    dx, omega = 0.25, 1.17
    want = prs.solve_pressure(topo, div, iters, dx, omega)
    got = solve_pressure_pallas(topo, div, iters, dx, omega, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_pallas_pressure_dense(rng):
    _check(build_topology_dense((16, 16, 16)), rng)


def test_pallas_pressure_sparse(rng):
    tiles = [(x, y, z) for x in range(4) for y in range(3) for z in range(2)
             if (x * 7 + y * 3 + z) % 5 != 4]
    _check(build_topology(np.array(tiles, np.int32)), rng)
