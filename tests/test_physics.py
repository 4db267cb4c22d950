"""Physics regression tests — the checks SURVEY §4 says the reference lacks:
projection reduces divergence, BFECC stays within clamp bounds, combustion
stoichiometry, buoyancy lifts a hot plume on a truly sparse topology.
Flat layout: scalars [T,512], velocity [3,T,512]."""

import jax.numpy as jnp
import numpy as np
import pytest

from hnanosolver_tpu.config import SolverParams
from hnanosolver_tpu.core.layout import positions_flat
from hnanosolver_tpu.core.topology import (
    active_mask,
    build_topology,
    build_topology_dense,
)
from hnanosolver_tpu.fields import zeros_state
from hnanosolver_tpu.ops import pressure as prs
from hnanosolver_tpu.ops import stencil as stn
from hnanosolver_tpu.solver import divergence_only, project, step


def _fpos(topo):
    return tuple(p.astype(jnp.float32) for p in positions_flat(topo))


def test_projection_reduces_divergence():
    """Projection must strongly damp smooth (band-limited) divergence.

    NOTE 1: the reference's collocated scheme solves the compact 7-point
    Laplacian but applies divergence/gradient at 2h spacing, so checkerboard
    divergence lies in the projection's null space (both for the CUDA code
    and here — SURVEY §7.5). Hence the smooth test field.
    NOTE 2: the reference's omega = 2/(1+sin(pi*dx)) hits the SOR stability
    limit (omega=2) at dx=1, so convergence requires dx < 1 — use 0.25.
    NOTE 3: the residual divergence concentrates in the boundary shell where
    the collocated scheme + zero background cannot remove it (reference
    behaves identically); the meaningful check is interior reduction."""
    topo = build_topology_dense((16, 16, 16))
    px, py, pz = _fpos(topo)
    k = 2 * np.pi / 16.0
    m = active_mask(topo)[:, None]
    vel = jnp.stack(
        [
            jnp.sin(k * px) * jnp.cos(k * py),
            jnp.sin(k * py) * jnp.cos(k * pz),
            jnp.sin(k * pz) * jnp.cos(k * px),
        ]
    ) * m[None]
    dx = 0.25
    div0 = divergence_only(topo, vel, dx)
    vel1 = project(topo, vel, iterations=80, voxel_size=dx)
    div1 = divergence_only(topo, vel1, dx)
    interior = (
        np.all([(np.asarray(p) >= 3) & (np.asarray(p) < 13) for p in (px, py, pz)], axis=0)
        & (np.asarray(m) > 0)
    )
    l0 = np.linalg.norm(np.asarray(div0)[interior])
    l1 = np.linalg.norm(np.asarray(div1)[interior])
    assert l1 < 0.15 * l0, (l0, l1)


def test_pressure_residual_decreases(rng):
    topo = build_topology_dense((16, 16, 16))
    div = jnp.asarray(
        rng.standard_normal((topo.capacity, 512)).astype(np.float32)
    ) * active_mask(topo)[:, None]
    dx = 0.25
    params = SolverParams(voxel_size=dx)
    m = active_mask(topo)[:, None]
    p10 = prs.solve_pressure(topo, div, 10, dx, params.omega)
    p40 = prs.solve_pressure(topo, div, 40, dx, params.omega)
    r10 = float(jnp.sqrt(jnp.sum((prs.residual(topo, p10, div, dx) * m) ** 2)))
    r40 = float(jnp.sqrt(jnp.sum((prs.residual(topo, p40, div, dx) * m) ** 2)))
    assert r40 < 0.5 * r10


def test_combustion_stoichiometry():
    from hnanosolver_tpu.ops.combustion import combustion_oxygen

    fuel = jnp.array([0.3, 0.0005, 0.9, 0.5])
    waste = jnp.array([0.0, 0.0, 0.5, 0.6])  # 3rd: invalid oxygen, 4th: invalid
    temp = jnp.zeros(4)
    flame = jnp.zeros(4)
    div = jnp.zeros(4)
    f, w, t, fl, d = combustion_oxygen(fuel, waste, temp, flame, div, 2.0, 0.5)
    np.testing.assert_allclose(np.asarray(f), [0.0, 0.0, 0.9, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), [0.6, 0.0, 0.5, 0.6], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), [0.6, 0.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), [0.15, 0.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(fl), [1.0, 0.0, 0.0, 0.0], atol=1e-6)


@pytest.mark.slow
def test_buoyant_plume_rises_sparse():
    """A hot blob on a sparse (non-box) topology gains upward velocity and
    transports density upward over a few steps."""
    tiles = [(x, y, z) for x in range(2) for y in range(4) for z in range(2)]
    topo = build_topology(np.array(tiles, np.int32))
    state = zeros_state(topo)
    px, py, pz = _fpos(topo)
    m = active_mask(topo)[:, None]
    blob = jnp.exp(-((px - 8) ** 2 + (py - 4) ** 2 + (pz - 8) ** 2) / 9.0) * m
    state = state.with_scalar("density", blob).with_scalar(
        "temperature", (23.0 + 50 * blob) * m
    )
    params = SolverParams(dt=0.5, iterations=10)

    def com_y(s):
        rho = s.scalars["density"]
        return float(jnp.sum(rho * py) / (jnp.sum(rho) + 1e-9))

    y0 = com_y(state)
    for _ in range(4):
        state = step(topo, state, params)
    y1 = com_y(state)
    assert y1 > y0 + 0.3, (y0, y1)
    # upward velocity somewhere
    assert float(jnp.max(state.velocity[1])) > 0.1
    # null tile stayed zero
    assert float(jnp.max(jnp.abs(state.velocity[:, 0]))) == 0.0
    assert float(jnp.max(state.scalars["density"][0])) == 0.0


def test_bfecc_clamp_no_overshoot(rng):
    """Advected density stays within [min, max] of the initial field + background."""
    from hnanosolver_tpu.ops.advection import advect_scalar

    topo = build_topology_dense((16, 16, 16))
    m = active_mask(topo)[:, None]
    rho = jnp.asarray(rng.uniform(0, 2, (topo.capacity, 512)).astype(np.float32)) * m
    vel = jnp.asarray(
        rng.standard_normal((3, topo.capacity, 512)).astype(np.float32)
    ) * m[None]
    out = advect_scalar(topo, vel, rho, dt=0.8, inv_dx=1.0)
    assert float(jnp.min(out)) >= 0.0 - 1e-6
    assert float(jnp.max(out)) <= float(jnp.max(rho)) + 1e-5


def test_divergence_of_constant_field_is_boundary_only():
    topo = build_topology_dense((16, 16, 16))
    m = active_mask(topo)[:, None]
    vel = jnp.ones((3, topo.capacity, 512)) * m[None]
    div = stn.divergence(topo, vel, 1.0)
    # interior voxels: exactly zero; boundary sees the background step
    px, py, pz = positions_flat(topo)
    inner = (
        np.all([(np.asarray(p) > 0) & (np.asarray(p) < 15) for p in (px, py, pz)], axis=0)
        & (np.asarray(m) > 0)
    )
    np.testing.assert_allclose(np.asarray(div)[inner], 0.0, atol=1e-6)


def test_rk_trace_orders(rng):
    """Higher-order backtraces run, stay within clamp bounds, and agree with
    the 1st-order trace in a uniform velocity field (exact for all orders)."""
    from hnanosolver_tpu.ops.advection import advect_scalar

    topo = build_topology_dense((16, 16, 16))
    m = active_mask(topo)[:, None]
    px, py, pz = _fpos(topo)
    rho = jnp.exp(-((px - 8) ** 2 + (py - 8) ** 2 + (pz - 8) ** 2) / 16.0) * m
    vel = jnp.stack([jnp.ones_like(rho), 0.5 * jnp.ones_like(rho),
                     jnp.zeros_like(rho)]) * m[None]
    o1 = advect_scalar(topo, vel, rho, 0.5, 1.0, trace_order=1)
    o2 = advect_scalar(topo, vel, rho, 0.5, 1.0, trace_order=2)
    o3 = advect_scalar(topo, vel, rho, 0.5, 1.0, trace_order=3)
    inner = np.asarray(m)[:, 0] > 0
    # uniform flow: all orders backtrace identically (interior; boundary
    # voxels see the velocity step to background)
    core = (
        np.all([(np.asarray(p) >= 2) & (np.asarray(p) < 14) for p in (px, py, pz)], axis=0)
    )
    np.testing.assert_allclose(np.asarray(o2)[core], np.asarray(o1)[core], atol=1e-5)
    np.testing.assert_allclose(np.asarray(o3)[core], np.asarray(o1)[core], atol=1e-5)
