"""Native C++ tile builder vs numpy fallback — encode/decode round-trip
invariants (the port of the reference's IndexGridBuilderTest /
EncodingDecodingTest, `/root/reference/Tests/IndexGrid.cpp:54-382`, to the
coordinate-list interchange format)."""

import numpy as np
import pytest

from hnanosolver_tpu.io import native as NT


@pytest.fixture(scope="module")
def coords(rng_module=None):
    rng = np.random.default_rng(1)
    c = rng.integers(-100, 100, (300_000, 3)).astype(np.int32)
    # unique voxels only: scatter/gather round-trip is only defined per voxel
    c = np.unique(c, axis=0)
    return c


def _numpy_only(fn, *args, **kw):
    saved = NT._lib
    NT._lib = None
    load = NT._load
    NT._load = lambda: None
    try:
        return fn(*args, **kw)
    finally:
        NT._load = load
        NT._lib = saved


def test_native_builds():
    assert NT.build_library() is not None
    assert NT.have_native()


def test_index_matches_numpy(coords):
    keys, origins, row, local = NT.build_index(coords)
    k2, o2, r2, l2 = _numpy_only(NT.build_index, coords)
    np.testing.assert_array_equal(keys, k2)
    np.testing.assert_array_equal(origins, o2)
    np.testing.assert_array_equal(row, r2)
    np.testing.assert_array_equal(local, l2)
    # keys sorted unique; rows 1-based within [1, M]
    assert np.all(np.diff(keys) > 0)
    assert row.min() >= 1 and row.max() == len(keys)


def test_scatter_gather_roundtrip(coords):
    rng = np.random.default_rng(2)
    vals = rng.standard_normal(len(coords)).astype(np.float32)
    keys, origins, row, local = NT.build_index(coords)
    tiles = NT.scatter(row, local, vals, num_rows=len(keys) + 1)
    assert tiles.shape == (len(keys) + 1, 512)
    assert np.all(tiles[0] == 0)  # null tile invariant
    back = NT.gather(row, local, tiles)
    np.testing.assert_array_equal(back, vals)
    # vector channel path
    v3 = rng.standard_normal((len(coords), 3)).astype(np.float32)
    t3 = NT.scatter(row, local, v3, num_rows=len(keys) + 1, channels=3)
    np.testing.assert_array_equal(NT.gather(row, local, t3, channels=3), v3)


def test_tile_coords_dense_per_leaf(coords):
    keys, origins, row, local = NT.build_index(coords[:5000])
    cl = NT.tile_coords(origins)
    assert cl.shape == (len(keys) * 512, 3)
    # every original coord appears in the dense list
    s = {tuple(c) for c in cl[:: 1]}
    for c in coords[:100]:
        assert tuple(c) in s
    # matches numpy fallback
    cl2 = _numpy_only(NT.tile_coords, origins)
    np.testing.assert_array_equal(cl, cl2)


def test_out_of_range_rejected():
    bad = np.array([[1 << 14, 0, 0]], np.int32)
    with pytest.raises(ValueError):
        NT.build_index(bad)
