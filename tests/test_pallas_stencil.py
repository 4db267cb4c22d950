"""Fused stencil kernels (ops/pallas_stencil.py): bit-exact vs the XLA
divergence / subtract-pressure-gradient forms."""

import jax.numpy as jnp
import numpy as np

from hnanosolver_tpu.core.topology import build_topology
from hnanosolver_tpu.ops import stencil as stn
from hnanosolver_tpu.ops.pallas_stencil import (
    divergence_fused,
    subtract_gradient_fused,
)


def _topo():
    tiles = [
        (x, y, z)
        for x in range(3)
        for y in range(3)
        for z in range(3)
        if (x * 7 + y * 3 + z) % 5 != 4
    ]
    return build_topology(np.array(tiles, np.int32))


def test_divergence_fused_bitwise():
    topo = _topo()
    rng = np.random.default_rng(2)
    vel = rng.normal(size=(3, topo.capacity, 512)).astype(np.float32)
    vel[:, 0] = 0.0
    vel = jnp.asarray(vel)
    inv_dx = 2.0
    got = divergence_fused(topo, vel, inv_dx, interpret=True)
    want = stn.divergence(topo, vel, inv_dx)
    assert jnp.array_equal(got, want), float(jnp.max(jnp.abs(got - want)))


def test_subtract_gradient_fused_bitwise():
    topo = _topo()
    rng = np.random.default_rng(9)
    vel = jnp.asarray(
        rng.normal(size=(3, topo.capacity, 512)).astype(np.float32))
    p = rng.normal(size=(topo.capacity, 512)).astype(np.float32)
    p[0] = 0.0
    p = jnp.asarray(p)
    inv_dx = 2.0
    got = subtract_gradient_fused(topo, vel, p, inv_dx, interpret=True)
    want = stn.subtract_pressure_gradient(topo, vel, p, inv_dx)
    assert jnp.array_equal(got, want), float(jnp.max(jnp.abs(got - want)))


def test_residual_fused_bitwise():
    from hnanosolver_tpu.ops import pressure as prs
    from hnanosolver_tpu.ops.pallas_stencil import residual_fused

    topo = _topo()
    rng = np.random.default_rng(5)
    p = rng.normal(size=(topo.capacity, 512)).astype(np.float32)
    p[0] = 0.0
    p = jnp.asarray(p)
    div = jnp.asarray(
        rng.normal(size=(topo.capacity, 512)).astype(np.float32))
    import jax

    for dx in (0.5, 0.3):
        got = residual_fused(topo, p, div, dx, interpret=True)
        # compare against the JITTED XLA form — the production path; the
        # eager dispatch path contracts (nbrsum - 6p)/dx^2 differently by
        # one ulp
        want = jax.jit(prs.residual, static_argnames=("dx",))(
            topo, p, div, dx=dx)
        assert jnp.array_equal(got, want), float(jnp.max(jnp.abs(got - want)))
