"""The full-solver cook on user VDB files — `cli.py solve`, the behavioral
equivalent of the HNanoSolver SOP node's cook
(`/root/reference/src/SOP/HNanoSolver/SOP_HNanoSolver.cpp:105-199`):
feedback state in, optional compSum sourcing, optional collision SDF,
topology union + dilation, N full solver steps, VDB out."""

import numpy as np
import pytest

import jax.numpy as jnp

from hnanosolver_tpu import cli
from hnanosolver_tpu.core.layout import positions_flat
from hnanosolver_tpu.core.topology import active_mask, build_topology_dense
from hnanosolver_tpu.fields import zeros_state
from hnanosolver_tpu.io.vdb import read_vdb, state_to_vdb


def _grid(path, name):
    for g in read_vdb(path):
        if g["name"] == name:
            return g
    raise AssertionError(f"{name} not in {path}")


@pytest.fixture
def feedback_vdb(tmp_path):
    """A small smoke state: density blob + upward velocity, no combustion
    fields (the solve command must create them as zeros)."""
    topo = build_topology_dense((16, 16, 16))
    state = zeros_state(topo)
    px, py, pz = (p.astype(jnp.float32) for p in positions_flat(topo))
    m = active_mask(topo)[:, None]
    blob = jnp.exp(-((px - 8) ** 2 + (py - 6) ** 2 + (pz - 8) ** 2) / 12) * m
    state = state.with_scalar("density", blob)
    vel = jnp.stack([0.0 * px, 1.5 * m * jnp.ones_like(py), 0.0 * pz])
    state = state.replace(velocity=vel)
    p = str(tmp_path / "feedback.vdb")
    state_to_vdb(p, topo, state, voxel_size=0.5, fields=["density"])
    return p


def _total(path, name):
    return float(_grid(path, name)["values"].sum())


def test_solve_basic(tmp_path, feedback_vdb):
    """2 cooks on a plain smoke file: all fields written back, divergence
    drops through the projection, density mass is conserved within the
    BFECC clamp envelope. (Two frames are load-bearing: the post-step
    topology growth leaves boundary divergence that only the NEXT frame's
    projection removes — a 1-frame cook measures ~0.8x d_in however many
    sweeps it runs.)"""
    out = str(tmp_path / "a.vdb")
    cli.main(["solve", feedback_vdb, "--frames", "2", "--iterations", "20",
              "--out", out])
    # the solver created the combustion fields and wrote everything back
    for name in ("density", "velocity", "fuel", "waste", "temperature",
                 "flame"):
        _grid(out, name)
    # divergence of the projected output is well below the raw input's
    # (not zero: each cook adds buoyancy/advection divergence that the next
    # cook's projection removes — the bound is the per-cook reduction)
    div_out = str(tmp_path / "div_out.vdb")
    cli.main(["project", out, "--outdiv", "--out", div_out])
    div_in = str(tmp_path / "div_in.vdb")
    cli.main(["project", feedback_vdb, "--outdiv", "--out", div_in])
    d_in = np.abs(_grid(div_in, "divergence")["values"]).max()
    d_out = np.abs(_grid(div_out, "divergence")["values"]).max()
    assert d_in > 1.0  # the blob input is strongly divergent at its rim
    assert d_out < 0.45 * d_in
    # no sourcing: total smoke only moves (advection is clamped/limited,
    # mass drifts but stays the same order)
    m0 = _total(feedback_vdb, "density")
    m1 = _total(out, "density")
    assert 0.5 * m0 < m1 < 1.5 * m0


@pytest.mark.slow  # multi-cook scenario (VERDICT r4 next-8)
def test_solve_resume_bitexact(tmp_path, feedback_vdb):
    """solve N frames == solve 1 frame -> npz checkpoint -> solve N-1 more:
    the checkpoint path reproduces the uninterrupted run bit-exactly."""
    a = str(tmp_path / "a.vdb")
    cli.main(["solve", feedback_vdb, "--frames", "2", "--iterations", "5",
              "--ckpt-every", "1", "--out", a])
    ck = str(tmp_path / "solve_0001.npz")
    b = str(tmp_path / "b.vdb")
    cli.main(["solve", ck, "--frames", "1", "--iterations", "5",
              "--out", b])
    ga, gb = read_vdb(a), read_vdb(b)
    assert [g["name"] for g in ga] == [g["name"] for g in gb]
    for x, y in zip(ga, gb):
        assert np.array_equal(x["origins"], y["origins"]), x["name"]
        assert np.array_equal(x["values"], y["values"]), x["name"]


@pytest.mark.slow
def test_solve_foreign_source_collision(tmp_path):
    """The full three-input cook on a FOREIGN-encoded feedback file (the
    blosc-compressed layout a real OpenVDB writer emits), with compSum
    sourcing and a sphere-collider SDF: sourcing accumulates mass each
    frame, the solid interior stays at zero velocity, and the topology
    grows with the plume."""
    from tests.foreign_vdb import ForeignGrid, write_foreign_vdb

    # feedback: 4x4x4 tiles of still air with the combustion fields
    tiles = np.stack(np.meshgrid(*([np.arange(4)] * 3), indexing="ij"),
                     -1).reshape(-1, 3)
    origins = (tiles * 8).astype(np.int64)
    n = len(origins)
    zeros = np.zeros((n, 512), np.float64)
    fb_grids = [
        ForeignGrid("density", origins, zeros, voxel_size=0.5,
                    grid_class="fog volume"),
        ForeignGrid("temperature", origins, zeros, voxel_size=0.5),
        ForeignGrid("fuel", origins, zeros, voxel_size=0.5),
        ForeignGrid("waste", origins, zeros, voxel_size=0.5),
        ForeignGrid("flame", origins, zeros, voxel_size=0.5),
        ForeignGrid("velocity", origins, np.zeros((n, 512, 3), np.float64),
                    value_type="vec3s", voxel_size=0.5),
    ]
    fb = str(tmp_path / "feedback.vdb")
    write_foreign_vdb(fb, fb_grids, compress="blosc+mask")

    # source: a hot emitter blob in the lower middle + upward jet
    ijk = np.stack(np.meshgrid(*([np.arange(8)] * 3), indexing="ij"),
                   -1).reshape(512, 3)
    src_tiles = np.array([[1, 0, 1], [2, 0, 1], [1, 0, 2], [2, 0, 2]])
    src_org = (src_tiles * 8).astype(np.int64)
    pos = src_org[:, None, :] + ijk[None]  # [N,512,3] world voxel coords
    r2 = ((pos - np.array([16, 4, 16])) ** 2).sum(-1)
    blob = np.exp(-r2 / 18.0)
    svel = np.zeros((len(src_org), 512, 3))
    svel[..., 1] = 2.0 * blob
    src_grids = [
        ForeignGrid("density", src_org, 0.8 * blob, voxel_size=0.5),
        ForeignGrid("temperature", src_org, 40.0 * blob, voxel_size=0.5),
        ForeignGrid("velocity", src_org, svel, value_type="vec3s",
                    voxel_size=0.5),
    ]
    src = str(tmp_path / "source.vdb")
    write_foreign_vdb(src, src_grids, compress="zip")

    # collision: a sphere SDF at (24, 16, 16), radius 5 voxels
    col_tiles = np.stack(np.meshgrid(np.arange(2, 4), np.arange(1, 3),
                                     np.arange(1, 3), indexing="ij"),
                         -1).reshape(-1, 3)
    col_org = (col_tiles * 8).astype(np.int64)
    cpos = col_org[:, None, :] + ijk[None]
    sdf = np.sqrt(((cpos - np.array([24, 16, 16])) ** 2).sum(-1)) - 5.0
    col_grids = [ForeignGrid("collider", col_org, sdf, voxel_size=0.5,
                             background=3.0, grid_class="level set")]
    col = str(tmp_path / "collision.vdb")
    write_foreign_vdb(col, col_grids, compress="none")

    out = str(tmp_path / "solved.vdb")
    cli.main(["solve", fb, "--source", src, "--collision", col,
              "--frames", "3", "--iterations", "8", "--out", out])

    # sourcing accumulated smoke (3 frames of compSum minus advection losses)
    m_src = float(0.8 * blob.sum())
    m_out = _total(out, "density")
    assert m_out > 1.2 * m_src  # strictly more than one frame's sourcing
    # the SDF came through under its own grid name, NOT zeroed
    g_sdf = _grid(out, "collider")
    assert g_sdf["values"].min() < -2.0
    # velocity inside the solid is zero (enforceCollisionBoundaries); the
    # written-back SDF covers the whole (grown) domain, so read "inside"
    # off the output grid itself
    g_vel = _grid(out, "velocity")
    vel_rows = {tuple(o): i for i, o in enumerate(g_vel["origins"] // 8)}
    n_solid = 0
    for i, o in enumerate(g_sdf["origins"] // 8):
        if tuple(o) not in vel_rows:
            continue
        v = g_vel["values"][:, vel_rows[tuple(o)]]
        inside = g_sdf["values"][i] < -0.75
        n_solid += int(inside.sum())
        assert np.abs(v[:, inside]).max(initial=0.0) < 1e-5
    assert n_solid > 300  # the sphere interior is actually covered


@pytest.mark.slow  # two extra full-step compiles (distinct dt); the guard unit test runs fast in test_debug_utils
def test_solve_cfl_clamp_warns(tmp_path, feedback_vdb, capsys):
    """The CFL-clamp guard is LOUD in the user path (VERDICT r4 next-6):
    a dt that pushes |u|*dt/dx past the <7-voxel trace clamp
    (ops/advection.DISP_LIMIT; the reference traces unbounded,
    Kernel.cu:139) must print a warning during `cli solve`."""
    out = str(tmp_path / "cfl.vdb")
    # feedback velocity is 1.5 up, dx=0.5 -> 2*|u|*dt/dx > 7 needs dt > 7/6
    cli.main(["solve", feedback_vdb, "--frames", "1", "--iterations", "2",
              "--timestep", "2.0", "--out", out])
    assert "CFL clamp engaged" in capsys.readouterr().out

    # and a tame dt stays silent
    out2 = str(tmp_path / "ok.vdb")
    cli.main(["solve", feedback_vdb, "--frames", "1", "--iterations", "2",
              "--timestep", "0.04", "--out", out2])
    assert "CFL clamp engaged" not in capsys.readouterr().out
