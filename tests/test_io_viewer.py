"""Checkpoint round-trips and renderer smoke tests."""

import os

import jax.numpy as jnp
import numpy as np

from hnanosolver_tpu.config import SolverParams
from hnanosolver_tpu.core.topology import active_mask, build_topology, voxel_positions
from hnanosolver_tpu.fields import zeros_state
from hnanosolver_tpu.io.state import (
    load_npz,
    load_sparse_npz,
    save_npz,
    save_sparse_npz,
)


def _demo(capacity=None):
    from hnanosolver_tpu.core.layout import positions_flat

    topo = build_topology(
        np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.int32), capacity=capacity
    )
    state = zeros_state(topo)
    px, py, pz = (p.astype(jnp.float32) for p in positions_flat(topo))
    m = active_mask(topo)[:, None]
    state = state.with_scalar("density", (px + 0.5 * py) * m)
    state = state.replace(velocity=jnp.stack([px, py, pz]) * 0.1 * m[None])
    return topo, state


def test_npz_roundtrip(tmp_path):
    topo, state = _demo()
    params = SolverParams(iterations=7, voxel_size=0.25)
    p = str(tmp_path / "ckpt.npz")
    save_npz(p, topo, state, params, frame=42)
    topo2, state2, params2, frame = load_npz(p)
    assert frame == 42
    assert params2 == params
    assert int(topo2.n_active) == int(topo.n_active)
    np.testing.assert_array_equal(np.asarray(topo2.keys), np.asarray(topo.keys))
    np.testing.assert_array_equal(
        np.asarray(state2.velocity), np.asarray(state.velocity)
    )
    np.testing.assert_array_equal(
        np.asarray(state2.scalars["density"]), np.asarray(state.scalars["density"])
    )


def test_sparse_npz_roundtrip(tmp_path):
    topo, state = _demo(capacity=16)
    p = str(tmp_path / "sparse.npz")
    save_sparse_npz(p, topo, state, frame=7)
    topo2, state2, frame = load_sparse_npz(p, capacity=16)
    assert frame == 7
    np.testing.assert_array_equal(np.asarray(topo2.keys), np.asarray(topo.keys))
    np.testing.assert_allclose(
        np.asarray(state2.scalars["density"]), np.asarray(state.scalars["density"])
    )
    np.testing.assert_allclose(
        np.asarray(state2.velocity), np.asarray(state.velocity)
    )


def test_render_and_png(tmp_path):
    from hnanosolver_tpu.viewer.render import (
        render_orthographic,
        render_perspective,
        write_png,
    )

    x, y, z = np.meshgrid(*(np.linspace(-1, 1, 32),) * 3, indexing="ij")
    blob = np.exp(-(x**2 + y**2 + z**2) * 6).astype(np.float32)
    img = render_orthographic(blob)
    assert img.shape == (32, 32, 3)
    # the blob should brighten the center relative to the corner
    assert img[16, 16].sum() > img[0, 0].sum() + 0.1
    img2 = render_perspective(blob, size=(24, 24), steps=32)
    assert img2.shape == (24, 24, 3) and np.isfinite(img2).all()
    p = str(tmp_path / "frame.png")
    write_png(p, img)
    with open(p, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_render_solid_occludes():
    """An opaque solid between the camera and the smoke hides it (the
    collider demo's sphere); a solid BEHIND the smoke barely changes it."""
    from hnanosolver_tpu.viewer.render import render_orthographic

    n = 24
    dens = np.zeros((n, n, n), np.float32)
    dens[n // 2, :, :] = 4.0  # a bright slab mid-depth
    front = np.zeros((n, n, n), bool)
    front[2, 8:16, 8:16] = True  # between camera (i=0 side) and slab
    behind = np.zeros((n, n, n), bool)
    behind[n - 3, 8:16, 8:16] = True
    base = render_orthographic(dens, axis=0, smoke_color=(1.0, 1.0, 1.0))
    img_f = render_orthographic(
        dens, axis=0, smoke_color=(1.0, 1.0, 1.0), solid=front,
        solid_color=(0.0, 0.0, 0.0))
    img_b = render_orthographic(
        dens, axis=0, smoke_color=(1.0, 1.0, 1.0), solid=behind,
        solid_color=(0.0, 0.0, 0.0))
    # front solid: covered pixels go dark vs base
    assert img_f[10, 10].sum() < base[10, 10].sum() - 0.3
    # uncovered pixels unchanged
    np.testing.assert_allclose(img_f[2, 2], base[2, 2], atol=1e-6)
    # behind solid: smoke mostly absorbs the ray first; small change only
    assert abs(img_b[10, 10].sum() - base[10, 10].sum()) < 0.15


def test_turntable_and_apng(tmp_path, rng):
    """Orbit renders: frames differ across angles; APNG has valid chunks."""
    import struct
    import zlib as _zlib

    import jax.numpy as jnp
    import numpy as np

    from hnanosolver_tpu.core.topology import active_mask, build_topology_dense
    from hnanosolver_tpu.core.layout import positions_flat
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.viewer.render import render_turntable, write_apng

    topo = build_topology_dense((32, 32, 32))
    state = zeros_state(topo)
    px, py, pz = (p.astype(jnp.float32) for p in positions_flat(topo))
    # asymmetric blob so different view angles give different images
    blob = jnp.exp(-((px - 8) ** 2 / 20 + (py - 16) ** 2 / 60 + (pz - 24) ** 2 / 10))
    state = state.with_scalar("density", blob * active_mask(topo)[:, None])

    frames = render_turntable(topo, state, (32, 32, 32), frames=4,
                              size=(48, 48), steps=48)
    assert len(frames) == 4
    diffs = [float(np.abs(frames[0] - f).max()) for f in frames[1:]]
    assert max(diffs) > 0.01, diffs

    path = str(tmp_path / "turn.apng")
    write_apng(path, frames)
    raw = open(path, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"acTL" in raw and b"fcTL" in raw and b"fdAT" in raw
    # frame count in acTL
    i = raw.index(b"acTL")
    nf, loops = struct.unpack(">II", raw[i + 4 : i + 12])
    assert nf == 4 and loops == 0


def test_webapp_endpoints(tmp_path):
    """Interactive viewer server: /, /meta, /volume and /step contracts
    (the HNanoViewer-equivalent front end, viewer/webapp.py)."""
    import json
    import urllib.request

    from hnanosolver_tpu.viewer import webapp

    d = np.zeros((16, 16, 16), np.float32)
    d[4:12, 4:12, 4:12] = 2.0
    calls = []

    def stepper(n):
        calls.append(n)
        return {"density": d * (1.0 + len(calls))}

    src = webapp.VolumeSource({"density": d}, stepper)
    httpd, _ = webapp.serve(src, port=18642, block=False)
    try:
        base = "http://127.0.0.1:18642"
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"WebGL2" in page or b"webgl2" in page
        meta = json.loads(urllib.request.urlopen(base + "/meta", timeout=10).read())
        assert meta["fields"]["density"]["dims"] == [16, 16, 16]
        assert meta["live"] is True
        vol = urllib.request.urlopen(base + "/volume?field=density", timeout=10).read()
        assert len(vol) == 16 * 16 * 16
        arr = np.frombuffer(vol, np.uint8).reshape(16, 16, 16)  # (z,y,x)
        assert arr[8, 8, 8] == 255 and arr[0, 0, 0] == 0
        urllib.request.urlopen(base + "/step?n=3", timeout=10).read()
        assert calls == [3]
        meta2 = json.loads(urllib.request.urlopen(base + "/meta", timeout=10).read())
        assert meta2["frame"] == 3
    finally:
        httpd.shutdown()


def test_webapp_file_source(tmp_path):
    """file_source loads .nvdb and .vdb volumes into dense arrays."""
    from hnanosolver_tpu.core.topology import build_topology_dense
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.io.nvdb import write_state_nvdb
    from hnanosolver_tpu.viewer import webapp

    from hnanosolver_tpu.core.layout import positions_flat

    topo = build_topology_dense((16, 16, 16))
    state = zeros_state(topo)
    px, py, pz = positions_flat(topo)
    blob = jnp.exp(-((px.astype(jnp.float32) - 8) ** 2) / 30)
    state = state.with_scalar("density", blob * active_mask(topo)[:, None])
    paths = write_state_nvdb(str(tmp_path), topo, state, fields=["density"])
    dens = [p for p in paths if "density" in p][0]
    src = webapp.file_source(dens)
    (name, meta), = src.meta()["fields"].items()
    assert meta["dims"] == [16, 16, 16]
    assert meta["vmax"] > 0.5
