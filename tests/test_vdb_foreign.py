"""Foreign OpenVDB ingestion: layouts real writers produce that our own
writer never does (reference contract: Utils.hpp:366-410 loads arbitrary
Houdini grids). Fixtures come from tests/foreign_vdb.py's independent
emulated encoder — no OpenVDB build exists in this image to generate real
ones (documented in the module)."""

import numpy as np
import pytest

from hnanosolver_tpu.io.vdb import read_vdb
from tests.foreign_vdb import ForeignGrid, write_foreign_vdb


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _leaves(rng, n=6, lo=-3, hi=3):
    o = np.unique(rng.integers(lo, hi, (n * 2, 3)), axis=0)[:n] * 8
    v = rng.normal(size=(len(o), 512)).astype(np.float32)
    return o, v


@pytest.mark.parametrize("compress", ["none", "zip", "blosc", "zip+mask",
                                      "blosc+mask", "mask"])
def test_dense_leaf_roundtrip(tmp_path, rng, compress):
    o, v = _leaves(rng)
    p = str(tmp_path / "f.vdb")
    write_foreign_vdb(p, [ForeignGrid("density", o, v, voxel_size=0.5)],
                      compress=compress)
    [g] = read_vdb(p)
    assert g["name"] == "density"
    assert g["voxel_size"] == 0.5
    got = {tuple(t): g["values"][i] for i, t in enumerate(g["origins"])}
    for i, t in enumerate(o):
        np.testing.assert_array_equal(got[tuple(t)], v[i])


def test_partial_masks_all_codes(tmp_path, rng):
    """Inactive-voxel reconstruction for every metadata code with a
    non-zero background (io/Compression.h semantics)."""
    bg = 2.5
    codes = [0, 1, 2, 3, 4, 5, 6]  # leaf i carries metadata code codes[i]
    n = len(codes)
    o = np.arange(n)[:, None] * np.array([[8, 0, 0]])
    v = rng.normal(size=(n, 512)).astype(np.float32)
    masks = rng.random((n, 512)) < 0.6
    sel = rng.random((n, 512)) < 0.5
    g = ForeignGrid("sdfish", o, v, leaf_masks=masks, leaf_codes=codes,
                    background=bg, grid_class="level set",
                    sel_masks={3: sel[3], 4: sel[4], 5: sel[5]},
                    inactive_vals={2: (7.25,), 4: (-4.5,), 5: (-4.5, 9.0)})
    p = str(tmp_path / "codes.vdb")
    write_foreign_vdb(p, [g], compress="zip+mask")
    [r] = read_vdb(p)
    got = {tuple(t): r["values"][i] for i, t in enumerate(r["origins"])}
    for i, t in enumerate(o):
        out = got[tuple(t)]
        m = masks[i]
        if codes[i] == 6:
            np.testing.assert_allclose(out, v[i], rtol=1e-6)
            continue
        np.testing.assert_allclose(out[m], v[i][m], rtol=1e-6)
        inactive = ~m
        if codes[i] == 0:
            np.testing.assert_allclose(out[inactive], bg)
        elif codes[i] == 1:
            np.testing.assert_allclose(out[inactive], -bg)
        elif codes[i] == 2:
            np.testing.assert_allclose(out[inactive], 7.25)
        elif codes[i] == 3:
            np.testing.assert_allclose(out[inactive & sel[i]], bg)
            np.testing.assert_allclose(out[inactive & ~sel[i]], -bg)
        elif codes[i] == 4:
            np.testing.assert_allclose(out[inactive & sel[i]], bg)
            np.testing.assert_allclose(out[inactive & ~sel[i]], -4.5)
        elif codes[i] == 5:
            np.testing.assert_allclose(out[inactive & sel[i]], 9.0)
            np.testing.assert_allclose(out[inactive & ~sel[i]], -4.5)


def test_vec3_and_double_types(tmp_path, rng):
    o = np.array([[0, 0, 0], [8, 8, 8]])
    vv = rng.normal(size=(2, 512, 3)).astype(np.float32)
    vd = rng.normal(size=(2, 512)).astype(np.float32)
    p = str(tmp_path / "v.vdb")
    write_foreign_vdb(p, [
        ForeignGrid("vel", o, vv, value_type="vec3s", grid_class="staggered"),
        ForeignGrid("vd", o, vv.astype(np.float64), value_type="vec3d"),
        ForeignGrid("dd", o, vd.astype(np.float64), value_type="double"),
    ], compress="blosc+mask")
    gs = read_vdb(p)
    assert [g["name"] for g in gs] == ["vel", "vd", "dd"]
    for g in gs[:2]:
        assert g["values"].shape == (3, 2, 512)
        np.testing.assert_allclose(
            np.moveaxis(g["values"], 0, -1), vv, rtol=1e-6)
    np.testing.assert_allclose(gs[2]["values"], vd, rtol=1e-6)


def test_half_float(tmp_path, rng):
    o, v = _leaves(rng, 3)
    p = str(tmp_path / "h.vdb")
    write_foreign_vdb(p, [ForeignGrid("density", o, v, half=True)],
                      compress="zip+mask")
    [g] = read_vdb(p)
    got = {tuple(t): g["values"][i] for i, t in enumerate(g["origins"])}
    for i, t in enumerate(o):
        np.testing.assert_array_equal(
            got[tuple(t)], v[i].astype(np.float16).astype(np.float32))


def test_internal_tiles_voxelize(tmp_path, rng):
    """Active int2-level tiles become constant leaves (the reference's
    voxelizeActiveTiles, SOP_VDBAdvect.cpp:105-110)."""
    o = np.array([[0, 0, 0]])
    v = rng.normal(size=(1, 512)).astype(np.float32)
    g = ForeignGrid("density", o, v,
                    int2_tiles=[((8, 0, 0), 3.5), ((0, 8, 0), -1.25)])
    p = str(tmp_path / "t.vdb")
    write_foreign_vdb(p, [g], compress="zip+mask")
    [r] = read_vdb(p)
    got = {tuple(t): r["values"][i] for i, t in enumerate(r["origins"])}
    assert set(got) == {(0, 0, 0), (8, 0, 0), (0, 8, 0)}
    np.testing.assert_allclose(got[(8, 0, 0)], 3.5)
    np.testing.assert_allclose(got[(0, 8, 0)], -1.25)
    np.testing.assert_array_equal(got[(0, 0, 0)], v[0])


def test_root_tiles(tmp_path, rng):
    o, v = _leaves(rng, 2)
    # inactive root tile: ignored; active zero-valued: ignored
    g = ForeignGrid("density", o, v,
                    root_tiles=[((4096, 0, 0), 1.5, False),
                                ((8192, 0, 0), 0.0, True)])
    p = str(tmp_path / "rt.vdb")
    write_foreign_vdb(p, [g], compress="none")
    [r] = read_vdb(p)
    assert len(r["origins"]) == len(o)
    # active non-zero root tile: grid skipped with a reason, not a crash
    g2 = ForeignGrid("density", o, v, root_tiles=[((4096, 0, 0), 1.5, True)])
    write_foreign_vdb(p, [g2], compress="none")
    skipped = []
    assert read_vdb(p, skipped=skipped) == []
    assert "root-level tile" in skipped[0][1]


@pytest.mark.parametrize("map_type,vs,tr", [
    ("UniformScaleTranslateMap", 0.25, (1.5, -2.0, 3.0)),
    ("ScaleTranslateMap", 0.5, (0.0, 4.0, 0.0)),
    ("TranslationMap", 1.0, (-1.0, -1.0, -1.0)),
    ("AffineMap", 2.0, (5.0, 6.0, 7.0)),
])
def test_transforms(tmp_path, rng, map_type, vs, tr):
    o, v = _leaves(rng, 2)
    p = str(tmp_path / "m.vdb")
    write_foreign_vdb(p, [ForeignGrid(
        "density", o, v, map_type=map_type, voxel_size=vs, translation=tr)])
    [g] = read_vdb(p)
    assert g["voxel_size"] == vs
    assert g["translation"] == tr


def test_instancing_and_unique_names(tmp_path, rng):
    o, v = _leaves(rng, 3)
    p = str(tmp_path / "i.vdb")
    write_foreign_vdb(p, [
        ForeignGrid("density", o, v, unique_suffix="\x1e[0]"),
        ForeignGrid("density", o, v * 0, unique_suffix="\x1e[1]",
                    instance_parent="density\x1e[0]"),
    ])
    gs = read_vdb(p)
    assert [g["name"] for g in gs] == ["density", "density"]
    np.testing.assert_array_equal(gs[1]["values"], gs[0]["values"])


def test_unsupported_grid_skipped(tmp_path, rng):
    o, v = _leaves(rng, 2)
    p = str(tmp_path / "u.vdb")
    write_foreign_vdb(p, [
        ForeignGrid("points", o, v, value_type="int32"),
        ForeignGrid("density", o, v),
    ])
    skipped = []
    gs = read_vdb(p, skipped=skipped)
    assert [g["name"] for g in gs] == ["density"]
    assert skipped[0][0] == "points"
    assert "unsupported grid type" in skipped[0][1]


def test_own_writer_is_foreign_readable_shape(tmp_path, rng):
    """Sanity lock: our writer's output parses through the SAME foreign
    code paths (full masks, code 0 internals, code 6 leaves)."""
    from hnanosolver_tpu.io.vdb import VdbGrid, write_vdb

    o, v = _leaves(rng, 4)
    p = str(tmp_path / "own.vdb")
    write_vdb(p, [VdbGrid("density", o, v, 0.25, "fog volume")],
              compress=True)
    [g] = read_vdb(p)
    got = {tuple(t): g["values"][i] for i, t in enumerate(g["origins"])}
    for i, t in enumerate(o):
        np.testing.assert_array_equal(got[tuple(t)], v[i])
