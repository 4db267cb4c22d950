"""Multigrid: restriction/prolongation layout invariants and V-cycle
convergence vs plain red-black SOR at comparable work."""

import jax.numpy as jnp
import numpy as np
import pytest

from hnanosolver_tpu.core.topology import (
    active_mask,
    build_topology_dense,
    lookup_tiles,
    voxel_positions,
)
from hnanosolver_tpu.ops import pressure as prs
from hnanosolver_tpu.ops.multigrid import (
    build_hierarchy,
    prolong,
    prolong_trilinear,
    restrict,
    solve_pressure_mg,
    v_cycle,
)


def _l2(topo, x):
    m = active_mask(topo)[:, None]
    return float(jnp.sqrt(jnp.sum((x * m) ** 2)))


def test_hierarchy_shapes():
    topo = build_topology_dense((32, 32, 32))  # 4^3 = 64 fine tiles
    hier = build_hierarchy(topo, 2)
    assert int(hier[0].topo.n_active) == 8  # 2^3 coarse tiles
    assert int(hier[1].topo.n_active) == 1
    ch = np.asarray(hier[0].children)
    # every active coarse tile has exactly 8 children here (dense box)
    n = int(hier[0].topo.n_active)
    assert np.all(ch[1 : n + 1] > 0)


def test_restrict_prolong_constant_field():
    topo = build_topology_dense((16, 16, 16))
    hier = build_hierarchy(topo, 1)
    m = active_mask(topo)[:, None]
    f = jnp.ones((topo.capacity, 512)) * m
    c = restrict(hier[0], f)
    mc = jnp.broadcast_to(active_mask(hier[0].topo)[:, None], c.shape)
    np.testing.assert_allclose(np.asarray(c * mc), np.asarray(mc), atol=1e-6)
    back = prolong(hier[0], c, topo.capacity)
    # prolong of restrict of constant = constant on active fine tiles
    mf = jnp.broadcast_to(m, back.shape)
    np.testing.assert_allclose(np.asarray(back * mf), np.asarray(mf), atol=1e-6)


def test_restrict_positions():
    """Restriction of the x-coordinate field averages to the coarse cell's
    fine-x center: coarse voxel (I) covers fine [2I, 2I+1] -> mean 2I+0.5."""
    from hnanosolver_tpu.core.layout import positions_flat

    topo = build_topology_dense((16, 16, 16))
    hier = build_hierarchy(topo, 1)
    fx = positions_flat(topo)[0].astype(jnp.float32) * active_mask(topo)[:, None]
    c = restrict(hier[0], fx)
    cx = positions_flat(hier[0].topo)[0]
    nc = int(hier[0].topo.n_active)
    want = 2.0 * np.asarray(cx, np.float32) + 0.5
    np.testing.assert_allclose(
        np.asarray(c)[1 : nc + 1], want[1 : nc + 1], atol=1e-5
    )


@pytest.mark.slow
def test_vcycle_beats_rbgs_at_same_work():
    topo = build_topology_dense((32, 32, 32))
    hier = build_hierarchy(topo, 2)
    from hnanosolver_tpu.core.layout import positions_flat

    px, py, pz = (p.astype(jnp.float32) for p in positions_flat(topo))
    k = 2 * np.pi / 32.0
    # smooth forcing (low frequency = worst case for plain RBGS)
    div = jnp.sin(k * px) * jnp.sin(k * py) * jnp.sin(k * pz) * active_mask(topo)[:, None]
    dx = 0.25
    # 3 V-cycles (~3*(2+2) fine sweeps + coarse work) vs 30 RBGS sweeps.
    p_mg = solve_pressure_mg(topo, hier, div, cycles=3, dx=dx, omega=1.0)
    p_gs = prs.solve_pressure(topo, div, 30, dx, 1.0)
    r_mg = _l2(topo, prs.residual(topo, p_mg, div, dx))
    r_gs = _l2(topo, prs.residual(topo, p_gs, div, dx))
    r0 = _l2(topo, div)
    assert r_mg < 0.5 * r_gs, (r0, r_mg, r_gs)
    assert r_mg < 0.1 * r0
    # trilinear prolongation converges at least as fast as injection
    p_inj = solve_pressure_mg(
        topo, hier, div, cycles=3, dx=dx, omega=1.0, prolongation="injection"
    )
    r_inj = _l2(topo, prs.residual(topo, p_inj, div, dx))
    assert r_mg <= 1.05 * r_inj, (r_mg, r_inj)


def test_prolong_trilinear_reproduces_linear_fields():
    """Cell-centered trilinear 2x upsampling of c(i)=i gives f/2 - 0.25 at
    interior fine voxels (exact for linear fields away from the Dirichlet-0
    domain boundary)."""
    from hnanosolver_tpu.core.layout import positions_flat

    topo = build_topology_dense((32, 32, 32))
    hier = build_hierarchy(topo, 1)
    lvl = hier[0]
    cx = positions_flat(lvl.topo)[0].astype(jnp.float32)
    cx = cx * active_mask(lvl.topo)[:, None]
    fine = prolong_trilinear(lvl, cx)
    fx, fy, fz = (p.astype(np.float32) for p in positions_flat(topo))
    fx, fy, fz = np.asarray(fx), np.asarray(fy), np.asarray(fz)
    vals = np.asarray(fine)
    n = int(topo.n_active)
    interior = (
        (fx[1:n+1] > 1) & (fx[1:n+1] < 30)
        & (fy[1:n+1] > 1) & (fy[1:n+1] < 30)
        & (fz[1:n+1] > 1) & (fz[1:n+1] < 30)
    )
    want = fx[1:n+1] / 2.0 - 0.25
    np.testing.assert_allclose(
        vals[1:n+1][interior], want[interior], atol=1e-5
    )


def test_mg_residual_target_mode():
    """tol-mode stops early and meets the residual target."""
    topo = build_topology_dense((32, 32, 32))
    hier = build_hierarchy(topo, 2)
    rng = np.random.default_rng(7)
    div = jnp.asarray(
        rng.standard_normal((topo.capacity, 512)).astype(np.float32)
    ) * active_mask(topo)[:, None]
    dx = 0.25
    p = solve_pressure_mg(topo, hier, div, cycles=20, dx=dx, omega=1.0, tol=1e-3)
    r = float(jnp.max(jnp.abs(prs.residual(topo, p, div, dx))))
    scale = float(jnp.max(jnp.abs(div)))
    assert r <= 1e-3 * scale * 1.001, (r, scale)


def test_vcycle_on_sparse_topology():
    """V-cycle works when the fine tile set isn't a full box (odd children)."""
    tiles = [(x, y, z) for x in range(3) for y in range(2) for z in range(3)
             if (x + y + z) % 4 != 3]
    from hnanosolver_tpu.core.topology import build_topology

    topo = build_topology(np.array(tiles, np.int32))
    hier = build_hierarchy(topo, 1)
    rng = np.random.default_rng(3)
    div = jnp.asarray(
        rng.standard_normal((topo.capacity, 512)).astype(np.float32)
    ) * active_mask(topo)[:, None]
    dx = 0.25
    p1 = solve_pressure_mg(topo, hier, div, cycles=1, dx=dx)
    p3 = solve_pressure_mg(topo, hier, div, cycles=3, dx=dx)
    r1 = _l2(topo, prs.residual(topo, p1, div, dx))
    r3 = _l2(topo, prs.residual(topo, p3, div, dx))
    assert r3 < r1  # more cycles converge further
    assert np.isfinite(np.asarray(p3)).all()


def test_step_with_mg_pressure():
    """Full step with pressure_solver='mg' runs and is finite."""
    import jax.numpy as jnp

    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.solver import step
    from hnanosolver_tpu.ops.multigrid import build_hierarchy

    topo = build_topology_dense((16, 16, 16))
    hier = tuple(build_hierarchy(topo, 1))
    from hnanosolver_tpu.core.layout import positions_flat

    state = zeros_state(topo)
    px, py, _ = (p.astype(jnp.float32) for p in positions_flat(topo))
    m = active_mask(topo)[:, None]
    blob = jnp.exp(-((px - 8) ** 2 + (py - 4) ** 2) / 9.0) * m
    state = state.with_scalar("density", blob).with_scalar(
        "temperature", (23.0 + 40 * blob) * m
    )
    params = SolverParams(dt=0.25, iterations=2, pressure_solver="mg", voxel_size=0.25)
    out = step(topo, state, params, hierarchy=hier)
    assert np.isfinite(np.asarray(out.velocity)).all()
    assert float(jnp.max(out.velocity[1])) > 0  # buoyancy acted


@pytest.mark.slow
def test_vcycle_depth3_converges_on_sparse_cone():
    """Depth >= 3 was capped in round 2 (tile-approximate masks diverged on
    sparse domains). With masks carried as restricted data (any-of-children,
    voxel-exact at every depth) a 3-level V-cycle must converge on a sparse
    plume-like cone. Intent: the reference's commented V-cycle,
    /root/reference/src/Cuda/HNanoSolver.cu:399-506."""
    tiles = []
    for y in range(8):
        r = 1.0 + 1.5 * y / 7
        for x in range(-4, 5):
            for z in range(-4, 5):
                if x * x + z * z <= r * r:
                    tiles.append((x + 8, y, z + 8))
    from hnanosolver_tpu.core.topology import build_topology

    topo = build_topology(np.array(tiles, np.int32))
    hier3 = build_hierarchy(topo, 3)
    assert len(hier3) == 3
    # masks are restricted data: every level's mask is the any-reduction of
    # the level above (spot-check level 2 against a direct recomputation)
    m1 = np.asarray(hier3[0].mask)
    from hnanosolver_tpu.ops.multigrid import _restrict_mask_np

    np.testing.assert_array_equal(
        np.asarray(hier3[1].mask),
        _restrict_mask_np(np.asarray(hier3[1].children), m1))

    rng = np.random.default_rng(11)
    div = jnp.asarray(
        rng.standard_normal((topo.capacity, 512)).astype(np.float32)
    ) * active_mask(topo)[:, None]
    dx = 0.25
    r_prev = _l2(topo, div)
    for cycles in (1, 2, 3):
        p = solve_pressure_mg(topo, hier3, div, cycles=cycles, dx=dx)
        r = _l2(topo, prs.residual(topo, p, div, dx))
        assert np.isfinite(r)
        assert r < r_prev  # monotone convergence, no divergence at depth 3
        r_prev = r
    # 3 cycles of depth-3 must make real progress on the cone
    assert r_prev < 0.15 * _l2(topo, div)


def test_prolong_merged_matches_sequential_form():
    """The merged prolongation (one lane perm + one row gather) must be
    bit-identical to the 8-sequential-gather fallback for both the
    trilinear and piecewise-constant operators."""
    from hnanosolver_tpu.ops import multigrid as mg

    topo = build_topology_dense((24, 24, 24))
    hier = build_hierarchy(topo, 1)
    lvl = hier[0]
    rng = np.random.default_rng(3)
    coarse = np.zeros((lvl.topo.capacity, 512), np.float32)
    nc = int(lvl.topo.n_active)
    coarse[1 : nc + 1] = rng.normal(size=(nc, 512)).astype(np.float32)
    coarse = jnp.asarray(coarse)

    old_budget = mg.PROLONG_MERGE_BUDGET
    try:
        mg.PROLONG_MERGE_BUDGET = 1 << 60
        tri_m = prolong_trilinear(lvl, coarse)
        pc_m = prolong(lvl, coarse, topo.capacity)
        mg.PROLONG_MERGE_BUDGET = 0
        tri_s = prolong_trilinear(lvl, coarse)
        pc_s = prolong(lvl, coarse, topo.capacity)
    finally:
        mg.PROLONG_MERGE_BUDGET = old_budget

    assert jnp.array_equal(tri_m, tri_s)
    assert jnp.array_equal(pc_m, pc_s)
