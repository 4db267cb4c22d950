"""Sparse-vs-dense parity: a sparse topology covering exactly a dense box
must reproduce the dense oracle to float tolerance. This validates the whole
sparse machinery (lookup, shifts, samplers, flat layout) against an
independent implementation of the same physics."""

import jax.numpy as jnp
import numpy as np
import pytest

from hnanosolver_tpu.config import SolverParams
from hnanosolver_tpu.core import layout as L
from hnanosolver_tpu.core.convert import dense_to_tiles, tiles_to_dense
from hnanosolver_tpu.core.topology import build_topology_dense
from hnanosolver_tpu.dense import ops as D
from hnanosolver_tpu.dense.solver import step_dense
from hnanosolver_tpu.fields import FieldState
from hnanosolver_tpu.ops import advection as adv
from hnanosolver_tpu.ops import pressure as prs
from hnanosolver_tpu.ops import stencil as stn
from hnanosolver_tpu.solver import step

N = 24  # 3x3x3 tiles — small enough for CPU tests, crosses tile seams


def smooth_fields(rng, n=N):
    """Smooth-ish random fields (band-limited noise) on an n^3 box."""
    def smooth(a):
        for ax in range(3):
            a = (np.roll(a, 1, ax) + a + np.roll(a, -1, ax)) / 3.0
        return a

    x, y, z = np.meshgrid(*(np.arange(n),) * 3, indexing="ij")
    vel = np.stack(
        [
            np.sin(2 * np.pi * y / n) + 0.3 * smooth(rng.standard_normal((n,) * 3)),
            np.cos(2 * np.pi * z / n) + 0.3 * smooth(rng.standard_normal((n,) * 3)),
            np.sin(2 * np.pi * x / n) * 0.5,
        ],
        axis=-1,
    ).astype(np.float32)
    density = np.exp(
        -((x - n / 2) ** 2 + (y - n / 2) ** 2 + (z - n / 2) ** 2) / (n / 4) ** 2
    ).astype(np.float32)
    return jnp.asarray(vel), jnp.asarray(density)


def to_flat_scalar(topo, dense):
    return L.scalar_from_blocks(dense_to_tiles(topo, dense))


def to_flat_vec(topo, dense):
    return L.vec_from_blocks(dense_to_tiles(topo, dense))


def from_flat_scalar(topo, flat, shape=(N, N, N)):
    return tiles_to_dense(topo, L.scalar_to_blocks(flat), shape)


def from_flat_vec(topo, flat, shape=(N, N, N)):
    return tiles_to_dense(topo, L.vec_to_blocks(flat), shape)


@pytest.fixture
def setup(rng):
    topo = build_topology_dense((N, N, N))
    vel_d, rho_d = smooth_fields(rng)
    vel_t = to_flat_vec(topo, vel_d)
    rho_t = to_flat_scalar(topo, rho_d)
    return topo, vel_d, rho_d, vel_t, rho_t


def test_convert_roundtrip(setup):
    topo, vel_d, rho_d, vel_t, rho_t = setup
    np.testing.assert_array_equal(
        np.asarray(from_flat_vec(topo, vel_t)), np.asarray(vel_d)
    )
    np.testing.assert_array_equal(
        np.asarray(from_flat_scalar(topo, rho_t)), np.asarray(rho_d)
    )


def test_divergence_parity(setup):
    topo, vel_d, _, vel_t, _ = setup
    want = D.divergence(vel_d, 2.0)
    got = from_flat_scalar(topo, stn.divergence(topo, vel_t, 2.0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pressure_parity(setup):
    topo, vel_d, _, vel_t, _ = setup
    div_d = D.divergence(vel_d, 1.0)
    div_t = stn.divergence(topo, vel_t, 1.0)
    params = SolverParams(iterations=8)
    want = D.solve_pressure(div_d, 8, 1.0, params.omega)
    got = from_flat_scalar(topo, prs.solve_pressure(topo, div_t, 8, 1.0, params.omega))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_advection_parity(setup):
    topo, vel_d, rho_d, vel_t, rho_t = setup
    dt, inv_dx = 0.5, 1.0
    want = D.advect_bfecc(vel_d, rho_d, dt, inv_dx)
    got = from_flat_scalar(topo, adv.advect_scalar(topo, vel_t, rho_t, dt, inv_dx))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_velocity_advection_parity(setup):
    topo, vel_d, _, vel_t, _ = setup
    dt, inv_dx = 0.5, 1.0
    want = D.advect_bfecc(vel_d, vel_d, dt, inv_dx)
    got = from_flat_vec(topo, adv.advect_velocity(topo, vel_t, dt, inv_dx))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_full_step_parity(setup, rng):
    topo, vel_d, rho_d, vel_t, rho_t = setup
    temp = jnp.asarray((30.0 * rho_d).astype(np.float32))
    fuel = rho_d * 0.3
    scalars_d = {
        "density": rho_d,
        "temperature": temp,
        "fuel": fuel,
        "waste": jnp.zeros_like(rho_d),
        "flame": jnp.zeros_like(rho_d),
    }
    params = SolverParams(dt=0.2, iterations=6)
    want_v, want_s = step_dense(vel_d, scalars_d, params)

    state = FieldState(
        velocity=vel_t,
        scalars={k: to_flat_scalar(topo, v) for k, v in scalars_d.items()},
    )
    out = step(topo, state, params)
    got_v = from_flat_vec(topo, out.velocity)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), atol=2e-4)
    for k in scalars_d:
        got = from_flat_scalar(topo, out.scalars[k])
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want_s[k]), atol=2e-4, err_msg=k
        )


def test_vorticity_parity(setup):
    topo, vel_d, _, vel_t, _ = setup
    # factor_scale=1 exercises the offset-gradient path (27-table reads)
    want = D.vorticity_confinement(vel_d, 0.1, 1.0, 2.0, 1.0)
    got = from_flat_vec(topo, stn.vorticity_confinement(topo, vel_t, 0.1, 1.0, 2.0, 1.0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
