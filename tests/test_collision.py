"""SDF collision boundaries end-to-end (BASELINE config 4): a solid sphere
in a rising plume — velocity zeroed inside the solid, no-slip blending near
it, smoke does not penetrate the obstacle."""

import jax.numpy as jnp
import numpy as np
import pytest

from hnanosolver_tpu.config import SolverParams
from hnanosolver_tpu.core.layout import positions_flat
from hnanosolver_tpu.core.topology import active_mask, build_topology_dense
from hnanosolver_tpu.fields import zeros_state
from hnanosolver_tpu.ops.collision import enforce_collision, no_slip, sdf_normal_field
from hnanosolver_tpu.solver import step

CENTER = (16.0, 16.0, 16.0)
RADIUS = 5.0


def _setup():
    topo = build_topology_dense((32, 32, 32))
    px, py, pz = (p.astype(jnp.float32) for p in positions_flat(topo))
    m = active_mask(topo)[:, None]
    sdf = (
        jnp.sqrt((px - CENTER[0]) ** 2 + (py - CENTER[1]) ** 2 + (pz - CENTER[2]) ** 2)
        - RADIUS
    ) * m + (1.0 - m)  # background reads "outside"
    state = zeros_state(topo)
    blob = jnp.exp(-((px - 16) ** 2 + (py - 5) ** 2 + (pz - 16) ** 2) / 9.0) * m
    state = (
        state.with_scalar("collision_sdf", sdf)
        .with_scalar("density", blob)
        .with_scalar("temperature", (23.0 + 40.0 * blob) * m)
    )
    return topo, state, sdf, (px, py, pz), m


def test_enforce_collision_semantics():
    topo, state, sdf, (px, py, pz), m = _setup()
    vel = jnp.stack([jnp.ones_like(sdf), 2.0 * jnp.ones_like(sdf), jnp.zeros_like(sdf)]) * m[None]
    out = enforce_collision(topo, vel, sdf, inv_dx=2.0)
    inside = np.asarray(sdf) < 0.0
    # zero velocity inside the solid (Kernel.cu:93-96)
    for c in range(3):
        np.testing.assert_allclose(np.asarray(out[c])[inside], 0.0, atol=1e-6)
    # far from the solid: unchanged
    far = (np.asarray(sdf) > 1.0) & (np.asarray(m) > 0)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(out[c])[far], np.asarray(vel[c])[far], atol=1e-6
        )
    # no-slip projection removes the normal component
    normal = sdf_normal_field(topo, sdf, 2.0)
    tang = no_slip(vel, normal)
    dot = np.asarray(jnp.sum(tang * normal, axis=0))
    np.testing.assert_allclose(dot, 0.0, atol=1e-4)


@pytest.mark.slow
def test_plume_does_not_penetrate_solid():
    topo, state, sdf, (px, py, pz), m = _setup()
    params = SolverParams(dt=0.2, iterations=8, voxel_size=0.5, has_collision=True)
    for _ in range(5):
        state = step(topo, state, params)
    # velocity inside the solid stays zero
    inside = np.asarray(sdf) < 0.0
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(state.velocity[c])[inside], 0.0, atol=1e-5
        )
    # the deep interior of the solid accumulates (almost) no smoke
    deep = np.asarray(sdf) < -2.0
    assert float(np.abs(np.asarray(state.scalars["density"])[deep]).max()) < 5e-2
    # the SDF itself survived the step on active rows (the reference's
    # copy-back bug zeroed it — we don't); padding rows are re-masked to 0
    act = np.asarray(m)[:, 0] > 0
    np.testing.assert_allclose(
        np.asarray(state.scalars["collision_sdf"])[act], np.asarray(sdf)[act]
    )
    # smoke still rose around the obstacle
    assert float(jnp.max(state.velocity[1])) > 0.05


@pytest.mark.slow
def test_moving_collider_no_penetration_and_wake():
    """BASELINE config 4: an ANIMATED solid (translating sphere, SDF
    re-evaluated per frame on device) across >= 5 frames of a rising
    plume. Asserts: the solid actually moves, smoke never penetrates it,
    and the near-surface flow obeys no-slip (reference semantics
    re-applied per cook with whatever SDF was animated in,
    /root/reference/src/Cuda/Kernel.cu:77-116)."""
    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.models.collider import (
        ColliderConfig, run_collider, sphere_sdf, collider_center)
    from hnanosolver_tpu.models.plume import PlumeConfig
    from hnanosolver_tpu.core.layout import positions_flat
    from hnanosolver_tpu.ops.collision import sdf_normal_field

    from hnanosolver_tpu.config import CombustionParams
    params = SolverParams(
        dt=1.0 / 24.0, iterations=16, voxel_size=0.5,
        combustion=CombustionParams(vorticity_scale=0.0))
    cfg = PlumeConfig(center=(32.0, 8.0, 32.0), radius=6.0,
                      velocity_jet=10.0, temperature_target=60.0)
    col = ColliderConfig(center0=(26.0, 26.0, 32.0),
                         velocity=(36.0, 0.0, 0.0), radius=7.0)

    frames = 6
    seen = []

    def on_frame(f, topo, state):
        sdf = np.asarray(state.scalars["collision_sdf"])
        dens = np.asarray(state.scalars["density"])
        vel = np.asarray(state.velocity)
        n = np.asarray(sdf_normal_field(
            topo, state.scalars["collision_sdf"], 1.0 / params.voxel_size))
        seen.append((f, sdf, dens, vel, n))

    # fixed pre-built domain covering plume + full collider path: ONE
    # compile for all frames (growth recompiles are exercised elsewhere;
    # on CPU they would dominate this test's runtime)
    from hnanosolver_tpu.core.topology import build_topology_dense

    topo = build_topology_dense((56, 48, 56), origin=(8, 0, 8))
    run_collider(frames, params, cfg, col, topo=topo, grow_every=0,
                 on_frame=on_frame)

    assert len(seen) == frames
    centers = [np.asarray(collider_center(col, f, params.dt)) for f, *_ in seen]
    assert np.linalg.norm(centers[-1] - centers[0]) > 5.0  # it moved

    for f, sdf, dens, vel, n in seen:
        interior = sdf < -1.5
        if interior.any():
            # no smoke inside the moving solid, any frame
            assert float(np.abs(dens[interior]).max()) < 1e-4, f
            # velocity zeroed inside
            assert float(np.abs(vel[:, interior]).max()) < 1e-4, f
        shell = (sdf >= -0.5) & (sdf < 0.05)
        if shell.sum() > 10:
            vdotn = (vel * n).sum(axis=0)[shell]
            vmag = np.sqrt((vel * vel).sum(axis=0))[shell] + 1e-12
            # near-surface normal component is strongly suppressed
            assert float(np.median(np.abs(vdotn) / vmag)) < 0.35, f

    # wake plausibility: by the last frame the rising smoke has reached the
    # collider's altitude but pooled OUTSIDE it (upstream stagnation)
    f, sdf, dens, vel, n = seen[-1]
    near_out = (sdf > 0.5) & (sdf < 6.0)
    assert float(dens[near_out].max()) > 1e-3
