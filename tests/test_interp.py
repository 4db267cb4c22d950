"""MXU / Pallas trilinear samplers vs the gather formulation."""

import jax.numpy as jnp
import numpy as np
import pytest

from hnanosolver_tpu.core.topology import active_mask, build_topology_dense
from hnanosolver_tpu.ops import shifts as sh
from hnanosolver_tpu.ops.advection import _clamp, _corners, _sample
from hnanosolver_tpu.ops.interp import trilinear_mxu
from hnanosolver_tpu.ops.pallas_interp import trilinear_pallas


def _setup(rng):
    topo = build_topology_dense((24, 24, 24))
    T = topo.capacity
    m = np.asarray(active_mask(topo))[:, None]
    f1 = (rng.standard_normal((T, 512)).astype(np.float32) * m)
    f2 = (rng.uniform(0, 3, (T, 512)).astype(np.float32) * m)
    dx = jnp.asarray(rng.uniform(-3, 3, (T, 512)).astype(np.float32))
    dy = jnp.asarray(rng.uniform(-3, 3, (T, 512)).astype(np.float32))
    dz = jnp.asarray(rng.uniform(-3, 3, (T, 512)).astype(np.float32))
    tables = [sh.neighbor_table(topo, jnp.asarray(f)) for f in (f1, f2)]
    want = [
        _sample(t, _corners(_clamp(dx), _clamp(dy), _clamp(dz))) for t in tables
    ]
    return tables, dx, dy, dz, want


def test_mxu_matches_gather(rng):
    tables, dx, dy, dz, want = _setup(rng)
    got = trilinear_mxu(tables, _clamp(dx), _clamp(dy), _clamp(dz))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-4)


def test_pallas_matches_gather(rng):
    tables, dx, dy, dz, want = _setup(rng)
    got = trilinear_pallas(tables, _clamp(dx), _clamp(dy), _clamp(dz), interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-4)


def test_advection_pallas_matches_gather(rng):
    """Full BFECC advection with interp='pallas' (interpret mode on CPU)
    must match the gather formulation."""
    import jax

    from hnanosolver_tpu.core.topology import build_topology_dense
    from hnanosolver_tpu.ops.advection import _advect_chunked

    topo = build_topology_dense((16, 16, 16))
    T = topo.capacity
    m = np.asarray(active_mask(topo))[:, None]
    vel = jnp.asarray(rng.standard_normal((3, T, 512)).astype(np.float32) * 1.5) * m[None]
    rho = jnp.asarray(rng.uniform(0, 1, (T, 512)).astype(np.float32) * m)
    a = _advect_chunked(topo, vel, [rho], 0.5, None, 512, 1, "gather")
    b = _advect_chunked(topo, vel, [rho], 0.5, None, 512, 1, "pallas")
    np.testing.assert_allclose(np.asarray(b[0]), np.asarray(a[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b[1]), np.asarray(a[1]), rtol=1e-4, atol=1e-4)


def test_vmem_sampler_matches_gather(rng):
    """pallas_interp2.sample_tables (chunked unique-row VMEM sampler,
    interpret mode) must match the gather formulation on a SPARSE topology
    (exercises chunk_uniq/chunk_lnbr remapping and null-row background)."""
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.ops import pallas_interp2 as pi2

    tiles = rng.integers(0, 6, (60, 3)).astype(np.int32)  # sparse, holey
    topo = build_topology(tiles)
    T = topo.capacity
    m = np.asarray(active_mask(topo))[:, None]
    f1 = jnp.asarray(rng.standard_normal((T, 512)).astype(np.float32) * m)
    f2 = jnp.asarray(rng.uniform(0, 3, (T, 512)).astype(np.float32) * m)
    dx = _clamp(jnp.asarray(rng.uniform(-6, 6, (T, 512)).astype(np.float32)))
    dy = _clamp(jnp.asarray(rng.uniform(-6, 6, (T, 512)).astype(np.float32)))
    dz = _clamp(jnp.asarray(rng.uniform(-6, 6, (T, 512)).astype(np.float32)))
    tables = pi2.build_tables(topo, [f1, f2])
    got = pi2.sample_tables(topo, tables, 0, 2, dx, dy, dz, interpret=True)
    gtbl = [sh.neighbor_table(topo, f) for f in (f1, f2)]
    want = [_sample(t, _corners(dx, dy, dz)) for t in gtbl]
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-4)
    # field-range slicing: sample only field 1
    got1 = pi2.sample_tables(topo, tables, 1, 2, dx, dy, dz, interpret=True)
    np.testing.assert_allclose(np.asarray(got1[0]), np.asarray(want[1]),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_advection_vmem_matches_gather(rng):
    """Full BFECC advection through the vmem path (with SDF rejection and
    velocity self-advection dedupe) must match the gather formulation."""
    from hnanosolver_tpu.core.topology import build_topology_dense
    from hnanosolver_tpu.ops.advection import _advect_chunked, _advect_vmem

    topo = build_topology_dense((16, 16, 16))
    T = topo.capacity
    m = np.asarray(active_mask(topo))[:, None]
    vel = jnp.asarray(rng.standard_normal((3, T, 512)).astype(np.float32) * 1.5) * m[None]
    rho = jnp.asarray(rng.uniform(0, 1, (T, 512)).astype(np.float32) * m)
    sdf = jnp.asarray(rng.uniform(-0.2, 1.0, (T, 512)).astype(np.float32))
    for s in (None, sdf):
        a = _advect_chunked(topo, vel, [rho], 0.5, s, 512, 1, "gather")
        b = _advect_vmem(topo, vel, [rho], 0.5, s)
        np.testing.assert_allclose(np.asarray(b[0]), np.asarray(a[0]), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(b[1]), np.asarray(a[1]), rtol=1e-4, atol=1e-4)
    # self-advection dedupe path
    a = _advect_chunked(topo, vel, [vel[0], vel[1], vel[2]], 0.5, None, 512, 1,
                        "gather", fields_are_velocity=True)
    b = _advect_vmem(topo, vel, [vel[0], vel[1], vel[2]], 0.5, None,
                     fields_are_velocity=True)
    np.testing.assert_allclose(np.asarray(b[0]), np.asarray(a[0]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b[1]), np.asarray(a[1]), rtol=1e-4, atol=1e-4)
