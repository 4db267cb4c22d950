"""OpenVDB .vdb writer/reader: structural invariants + round trips.

The environment has no OpenVDB to validate against (the reference vendors
NanoVDB only), so validation is (a) a strict independent parser over the
documented v224 layout, (b) byte-level header checks against the format
constants, (c) FieldState round trips, (d) consistency with the .nvdb path.
"""

import struct

import jax.numpy as jnp
import numpy as np

from hnanosolver_tpu.core.topology import active_mask, build_topology
from hnanosolver_tpu.fields import zeros_state
from hnanosolver_tpu.io.vdb import (
    VdbGrid,
    read_vdb,
    state_to_vdb,
    vdb_to_state,
    write_vdb,
)


def _scatter_grid(rng, n=9):
    origins = rng.choice(np.arange(-64, 64) * 8, size=(n, 3)).astype(np.int32)
    origins = np.unique(origins, axis=0)
    vals = rng.standard_normal((len(origins), 512)).astype(np.float32)
    return origins, vals


def _sorted(o, v):
    idx = np.lexsort((o[:, 2], o[:, 1], o[:, 0]))
    return o[idx], v[..., idx, :]


def test_header_bytes(tmp_path, rng):
    o, v = _scatter_grid(rng)
    path = str(tmp_path / "g.vdb")
    write_vdb(path, [VdbGrid("density", o, v, 0.5)])
    raw = open(path, "rb").read()
    magic, version, major, minor, offsets = struct.unpack("<qIIIb", raw[:21])
    assert magic == 0x56444220  # " BDV"
    assert version == 224
    assert offsets == 1
    uuid = raw[21:57].decode()
    assert len(uuid) == 36 and uuid[8] == uuid[13] == uuid[18] == uuid[23] == "-"


def test_scalar_roundtrip(tmp_path, rng):
    o, v = _scatter_grid(rng)
    path = str(tmp_path / "g.vdb")
    write_vdb(path, [VdbGrid("density", o, v, 0.25, "fog volume")])
    [g] = read_vdb(path)
    assert g["type"] == "Tree_float_5_4_3"
    assert g["grid_class"] == "fog volume"
    assert g["voxel_size"] == 0.25
    o1, v1 = _sorted(o, v)
    o2, v2 = _sorted(g["origins"], g["values"])
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(v1, v2)


def test_vector_roundtrip(tmp_path, rng):
    o, _ = _scatter_grid(rng)
    v = rng.standard_normal((3, len(o), 512)).astype(np.float32)
    path = str(tmp_path / "g.vdb")
    write_vdb(path, [VdbGrid("velocity", o, v, 0.5, "staggered")])
    [g] = read_vdb(path)
    assert g["type"] == "Tree_vec3s_5_4_3"
    o1, v1 = _sorted(o, v)
    o2, v2 = _sorted(g["origins"], g["values"])
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(v1, v2)


def test_state_roundtrip(tmp_path, rng):
    tiles = np.array(
        [(x, y, z) for x in range(3) for y in range(4) for z in range(2)
         if (x + 2 * y + z) % 5 != 4], np.int32,
    )
    topo = build_topology(tiles)
    state = zeros_state(topo)
    m = active_mask(topo)[:, None]
    n = int(topo.n_active)
    blob = jnp.asarray(
        rng.standard_normal((topo.capacity, 512)).astype(np.float32)
    ) * m
    state = state.with_scalar("density", blob).replace(
        velocity=jnp.asarray(
            rng.standard_normal((3, topo.capacity, 512)).astype(np.float32)
        ) * m[None]
    )
    path = str(tmp_path / "state.vdb")
    state_to_vdb(path, topo, state, voxel_size=0.5)

    coords, scalars, vel, vs = vdb_to_state(path)
    assert vs == 0.5
    want_tiles = np.asarray(topo.origins[1 : n + 1])
    o1 = want_tiles[np.lexsort(want_tiles.T[::-1])]
    o2 = coords[np.lexsort(coords.T[::-1])]
    np.testing.assert_array_equal(o1, o2)
    # values: match rows by tile coord
    order_in = np.lexsort(want_tiles.T[::-1])
    order_out = np.lexsort(coords.T[::-1])
    np.testing.assert_array_equal(
        np.asarray(blob[1 : n + 1])[order_in],
        scalars["density"][order_out],
    )
    np.testing.assert_array_equal(
        np.asarray(state.velocity[:, 1 : n + 1])[:, order_in],
        vel[:, order_out],
    )


def test_matches_nvdb_path(tmp_path, rng):
    """The .vdb and .nvdb exporters must agree on content for the same state."""
    from hnanosolver_tpu.io.nvdb import read_nvdb, write_nvdb

    o, v = _scatter_grid(rng, n=6)
    vdb_path = str(tmp_path / "g.vdb")
    nvdb_path = str(tmp_path / "g.nvdb")
    write_vdb(vdb_path, [VdbGrid("density", o, v, 0.5)])
    write_nvdb(nvdb_path, o // 8, v.reshape(-1, 8, 8, 8), name="density",
               voxel_size=0.5)
    [gv] = read_vdb(vdb_path)
    _, _, n_tiles, n_vals, _ = read_nvdb(nvdb_path)
    ov, vv = _sorted(gv["origins"] // 8, gv["values"])
    on, vn = _sorted(np.asarray(n_tiles), np.asarray(n_vals).reshape(-1, 512))
    np.testing.assert_array_equal(ov, on)
    np.testing.assert_array_equal(vv, vn)


def test_zip_roundtrip_and_flags(tmp_path, rng):
    """COMPRESS_ZIP|COMPRESS_ACTIVE_MASK: per-leaf zlib with the
    io::zipToStream Int64 framing; identical decoded values, smaller file
    for compressible fields."""
    o, v = _scatter_grid(rng, n=12)
    v = v * (rng.random(v.shape) < 0.2)  # sparse-ish: compressible
    plain = str(tmp_path / "p.vdb")
    zipped = str(tmp_path / "z.vdb")
    write_vdb(plain, [VdbGrid("density", o, v, 0.5, "fog volume")])
    write_vdb(zipped, [VdbGrid("density", o, v, 0.5, "fog volume")],
              compress=True)
    import os as _os

    assert _os.path.getsize(zipped) < _os.path.getsize(plain)
    [a] = read_vdb(plain)
    [b] = read_vdb(zipped)
    np.testing.assert_array_equal(*(_sorted(g["origins"], g["values"])[1]
                                    for g in (a, b)))

    # vector grids through the state path, compressed
    topo = build_topology((o // 8).astype(np.int32))
    state = zeros_state(topo)
    state = state.with_scalar(
        "density",
        jnp.asarray(rng.standard_normal((topo.capacity, 512)).astype(np.float32))
        * active_mask(topo)[:, None],
    )
    p = str(tmp_path / "s.vdb")
    state_to_vdb(p, topo, state, voxel_size=0.5, compress=True)
    tiles, scalars, vel, vs = vdb_to_state(p)
    assert vel is not None and vs == 0.5
    got = _sorted(np.asarray(tiles) * 8, scalars["density"])[1]
    n = int(topo.n_active)
    want = _sorted(np.asarray(topo.origins[1:n + 1]) * 8,
                   np.asarray(state.scalars["density"][1:n + 1]))[1]
    np.testing.assert_array_equal(got, want)
