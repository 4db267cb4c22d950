"""Sampler semantics — port of the reference's IndexSamplerTest /
TrilinearSamplerTest (`/root/reference/Tests/IndexGrid.cpp:157-282`),
including the background-0 convention and cross-tile interpolation."""

import jax.numpy as jnp
import numpy as np
import pytest

from hnanosolver_tpu.core import coords as C
from hnanosolver_tpu.core.topology import build_topology, build_topology_dense
from hnanosolver_tpu.ops.halo import center, gather_halo, shift
from hnanosolver_tpu.ops.sampling import sample_nearest, sample_trilinear


def make_field(topo, fn):
    """Fill a scalar field from fn(x, y, z) evaluated at voxel coords."""
    from hnanosolver_tpu.core.topology import voxel_positions, active_mask

    pos = voxel_positions(topo).astype(jnp.float32)
    vals = fn(pos[..., 0], pos[..., 1], pos[..., 2])
    return vals * active_mask(topo)[:, None, None, None]


def test_nearest_matches_and_background():
    topo = build_topology(np.array([[0, 0, 0]], np.int32))
    f = make_field(topo, lambda x, y, z: x + 10 * y + 100 * z)
    got = sample_nearest(topo, f, jnp.array([[3, 4, 5], [7, 0, 0]], jnp.int32))
    np.testing.assert_allclose(np.asarray(got), [3 + 40 + 500, 7.0])
    # outside active set -> exact 0
    assert float(sample_nearest(topo, f, jnp.array([8, 0, 0], jnp.int32))) == 0.0
    assert float(sample_nearest(topo, f, jnp.array([-1, 0, 0], jnp.int32))) == 0.0


def test_trilinear_linear_field_exact():
    # Trilinear interp reproduces any linear field exactly in the interior.
    topo = build_topology_dense((16, 16, 16))
    f = make_field(topo, lambda x, y, z: 2 * x - 3 * y + 0.5 * z + 1)
    pts = jnp.array(
        [[3.25, 4.5, 5.75], [0.0, 0.0, 0.0], [10.9, 2.2, 7.6], [14.0, 14.5, 14.99]],
        jnp.float32,
    )
    got = np.asarray(sample_trilinear(topo, f, pts))
    want = 2 * pts[:, 0] - 3 * pts[:, 1] + 0.5 * pts[:, 2] + 1
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5)


def test_trilinear_crosses_tile_boundary():
    topo = build_topology_dense((16, 8, 8))
    f = make_field(topo, lambda x, y, z: x)
    # interpolate straddling the tile seam at x=7..8
    got = float(sample_trilinear(topo, f, jnp.array([7.5, 3.0, 3.0], jnp.float32)))
    np.testing.assert_allclose(got, 7.5, rtol=1e-6)


def test_trilinear_blends_to_background():
    topo = build_topology(np.array([[0, 0, 0]], np.int32))
    f = make_field(topo, lambda x, y, z: jnp.ones_like(x))
    # halfway past the +x boundary voxel: corners at x=7 (1.0) and x=8 (0.0)
    got = float(sample_trilinear(topo, f, jnp.array([7.5, 3.0, 3.0], jnp.float32)))
    np.testing.assert_allclose(got, 0.5, rtol=1e-6)


def test_trilinear_vector_field():
    topo = build_topology_dense((8, 8, 8))
    from hnanosolver_tpu.core.topology import voxel_positions, active_mask

    pos = voxel_positions(topo).astype(jnp.float32)
    vel = pos * active_mask(topo)[:, None, None, None, None]  # v = position
    got = np.asarray(
        sample_trilinear(topo, vel, jnp.array([3.5, 2.25, 6.0], jnp.float32))
    )
    np.testing.assert_allclose(got, [3.5, 2.25, 6.0], rtol=1e-6)


def test_halo_matches_neighbors():
    topo = build_topology_dense((16, 16, 16))
    f = make_field(topo, lambda x, y, z: x + 10 * y + 100 * z)
    pad = gather_halo(topo, f)
    assert pad.shape == (topo.capacity, 10, 10, 10)
    np.testing.assert_allclose(np.asarray(center(pad)), np.asarray(f))
    # shifted views equal nearest-neighbor reads
    from hnanosolver_tpu.core.topology import voxel_positions

    pos = voxel_positions(topo)
    for off in [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, 0, -1), (1, 1, 1), (-1, -1, 1)]:
        want = sample_nearest(topo, f, pos + jnp.array(off, jnp.int32))
        got = shift(pad, *off)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), err_msg=str(off))


def test_halo_vector_channels():
    topo = build_topology_dense((16, 8, 8))
    from hnanosolver_tpu.core.topology import voxel_positions, active_mask

    vel = voxel_positions(topo).astype(jnp.float32)
    vel = vel * active_mask(topo)[:, None, None, None, None]
    pad = gather_halo(topo, vel)
    assert pad.shape == (topo.capacity, 10, 10, 10, 3)
    got = np.asarray(shift(pad, 1, 0, 0))
    pos = np.asarray(voxel_positions(topo))
    want = (pos + [1, 0, 0]).astype(np.float32)
    # beyond the +x end of the box the neighbor is background 0
    want[pos[..., 0] + 1 >= 16] = 0
    active = np.asarray(active_mask(topo)).astype(bool)
    np.testing.assert_allclose(got[active], want[active])


def test_local_trilinear_matches_global(rng):
    """The halo-block local sampler must agree with the searchsorted global
    sampler for displacements within the halo radius."""
    from hnanosolver_tpu.core.topology import voxel_positions, active_mask
    from hnanosolver_tpu.ops.sampling import sample_trilinear_local
    import jax.numpy as jnp

    topo = build_topology_dense((24, 24, 24))
    f = make_field(topo, lambda x, y, z: jnp.sin(0.3 * x) + 0.5 * y - 0.1 * z * z)
    disp = jnp.asarray(
        rng.uniform(-2.5, 2.5, (topo.capacity, 8, 8, 8, 3)).astype(np.float32)
    )
    pos = voxel_positions(topo).astype(jnp.float32)
    want = sample_trilinear(topo, f, pos + disp)
    got = sample_trilinear_local(topo, f, disp, radius=4)
    active = np.asarray(active_mask(topo)).astype(bool)
    np.testing.assert_allclose(
        np.asarray(got)[active], np.asarray(want)[active], rtol=1e-5, atol=1e-4
    )


def test_local_trilinear_vector_and_offset(rng):
    from hnanosolver_tpu.core.topology import voxel_positions, active_mask
    from hnanosolver_tpu.ops.sampling import (
        sample_offset_local,
        sample_trilinear_local,
    )
    import jax.numpy as jnp

    topo = build_topology_dense((16, 16, 16))
    from hnanosolver_tpu.core.topology import voxel_positions as vp

    vel = vp(topo).astype(jnp.float32)
    vel = vel * active_mask(topo)[:, None, None, None, None]
    disp = jnp.asarray(
        rng.uniform(-1.5, 1.5, (topo.capacity, 8, 8, 8, 3)).astype(np.float32)
    )
    pos = vp(topo).astype(jnp.float32)
    want = sample_trilinear(topo, vel, pos + disp)
    got = sample_trilinear_local(topo, vel, disp, radius=3)
    active = np.asarray(active_mask(topo)).astype(bool)
    np.testing.assert_allclose(
        np.asarray(got)[active], np.asarray(want)[active], rtol=1e-5, atol=1e-4
    )
    # integer-offset nearest reads
    f = make_field(topo, lambda x, y, z: x + 10 * y + 100 * z)
    for off in [(2, 0, 0), (0, -3, 1), (-2, -2, -2)]:
        want_n = sample_nearest(
            topo, f, vp(topo) + jnp.array(off, jnp.int32)
        )
        got_n = sample_offset_local(topo, f, off)
        np.testing.assert_allclose(
            np.asarray(got_n)[active], np.asarray(want_n)[active], err_msg=str(off)
        )


@pytest.mark.slow  # non-default trace_order; RK order behavior covered fast by test_physics::test_rk_trace_orders
def test_rk4_trace_wiring(rng):
    """RK4 backtrace (reference rk4_integrate parity): exact agreement with
    order-1 in a uniform flow (all orders collapse there), finite and
    clamp-bounded output in a rotating flow."""
    import jax.numpy as jnp
    import numpy as np

    from hnanosolver_tpu.core.layout import positions_flat
    from hnanosolver_tpu.core.topology import active_mask, build_topology_dense
    from hnanosolver_tpu.ops.advection import advect_scalars_fused

    topo = build_topology_dense((16, 16, 16))
    px, py, pz = (p.astype(jnp.float32) for p in positions_flat(topo))
    m = active_mask(topo)[:, None]
    blob = jnp.exp(-((px - 8) ** 2 + (py - 8) ** 2 + (pz - 8) ** 2) / 12.0) * m
    uni = jnp.stack([jnp.ones_like(blob), 0.5 * jnp.ones_like(blob),
                     jnp.zeros_like(blob)]) * m
    o1 = advect_scalars_fused(topo, uni, {"d": blob}, 0.5, 1.0, None,
                              trace_order=1)["d"]
    o4 = advect_scalars_fused(topo, uni, {"d": blob}, 0.5, 1.0, None,
                              trace_order=4)["d"]
    core = np.all([(np.asarray(p) >= 2) & (np.asarray(p) < 14)
                   for p in (px, py, pz)], axis=0)
    np.testing.assert_allclose(np.asarray(o4)[core], np.asarray(o1)[core],
                               atol=1e-5)

    rot = jnp.stack([-(pz - 8.0) * 0.3, jnp.zeros_like(px),
                     (px - 8.0) * 0.3]) * m
    o4r = advect_scalars_fused(topo, rot, {"d": blob}, 1.0, 1.0, None,
                               trace_order=4)["d"]
    assert np.isfinite(np.asarray(o4r)).all()
    assert float(jnp.max(o4r)) <= float(jnp.max(blob)) + 1e-5  # BFECC clamp


def test_face_minmax_multi_matches_stacked_views():
    """The memory-lean per-direction min/max (1024^3 clamp path) equals the
    stacked face_views_multi reduction exactly."""
    import numpy as np
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.ops import shifts as sh

    tiles = [(x, y, z) for x in range(4) for y in range(3) for z in range(3)
             if (x + y + z) % 4 != 3]
    topo = build_topology(np.array(tiles, np.int32))
    rng = np.random.default_rng(1)
    fs = jnp.asarray(rng.normal(size=(3, topo.capacity, 512)).astype(np.float32))
    views = sh.face_views_multi(topo, fs)
    mins, maxs = sh.face_minmax_multi(topo, fs)
    np.testing.assert_array_equal(np.asarray(views.min(0)), np.asarray(mins))
    np.testing.assert_array_equal(np.asarray(views.max(0)), np.asarray(maxs))
