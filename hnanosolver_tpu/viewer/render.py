"""Software volume renderer — HNanoViewer parity without OpenGL.

The reference viewer bakes a VDB to a dense 3D texture and raymarches it in
a fragment shader: 256 fixed steps through the unit cube, front-to-back
alpha compositing with early exit at alpha ~ 0.95
(`/root/reference/HNanoViewer/shaders/fragment_shader.frag:13-60`,
`HNanoViewer/src/OpenVDBLoader.cpp:19-86`). This module reproduces that as a
batched jnp computation (rays = a pixel grid, marching via lax.fori_loop with
trilinear texture taps), plus an orthographic fast path, writing PNGs with a
dependency-free encoder. Fire rendering tints by temperature/flame like
typical smoke viewers; density drives opacity exactly like the shader's
``density * stepAlpha`` accumulation.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hnanosolver_tpu.core.convert import tiles_to_dense
from hnanosolver_tpu.core.topology import Topology
from hnanosolver_tpu.fields import FieldState


def write_png(path: str, rgb: np.ndarray) -> None:
    """Minimal PNG writer (8-bit RGB), no external deps."""
    rgb = np.clip(np.asarray(rgb) * 255.0, 0, 255).astype(np.uint8)
    h, w = rgb.shape[:2]
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def _sample_dense(tex: jax.Array, pos: jax.Array) -> jax.Array:
    """Trilinear tap of a dense [Nx,Ny,Nz] texture at float voxel coords,
    zero outside (the GL_CLAMP_TO_BORDER analog)."""
    from hnanosolver_tpu.dense.ops import sample_trilinear

    return sample_trilinear(tex, pos)


def render_orthographic(
    density: np.ndarray,
    axis: int = 2,
    absorption: float = 4.0,
    emission: Optional[np.ndarray] = None,
    emission_color=(1.0, 0.45, 0.12),
    smoke_color=(0.9, 0.9, 0.95),
    background=(0.05, 0.06, 0.08),
    solid: Optional[np.ndarray] = None,
    solid_color=(0.45, 0.47, 0.5),
) -> np.ndarray:
    """Fast orthographic front-to-back composite along an axis — the
    same accumulation loop as the reference shader, with the ray direction
    fixed to a grid axis (one fused scan instead of per-pixel marching).
    ``solid``: optional boolean mask rendered as an opaque surface (the
    collider demo's sphere — SDF < 0 cells)."""
    d = jnp.asarray(density)
    if axis != 0:
        d = jnp.moveaxis(d, axis, 0)
    e = None
    if emission is not None:
        e = jnp.asarray(emission)
        if axis != 0:
            e = jnp.moveaxis(e, axis, 0)
    s = None
    if solid is not None:
        s = jnp.asarray(solid).astype(jnp.float32)
        if axis != 0:
            s = jnp.moveaxis(s, axis, 0)
    n = d.shape[0]
    step = 1.0 / n
    alpha_step = jnp.clip(d * absorption * step, 0.0, 1.0)

    def body(carry, i):
        color, alpha = carry
        a = alpha_step[i] * (1.0 - alpha)
        base = jnp.asarray(smoke_color)[None, None] * a[..., None]
        if e is not None:
            base = base + jnp.asarray(emission_color)[None, None] * (
                e[i][..., None] * step * (1.0 - alpha[..., None])
            )
        if s is not None:  # opaque hit: absorbs everything still in flight
            a_s = s[i] * (1.0 - alpha - a)
            base = base + jnp.asarray(solid_color)[None, None] * a_s[..., None]
            a = a + a_s
        return (color + base, alpha + a), None

    init = (
        jnp.zeros(d.shape[1:] + (3,), jnp.float32),
        jnp.zeros(d.shape[1:], jnp.float32),
    )
    (color, alpha), _ = jax.lax.scan(body, init, jnp.arange(n))
    bg = jnp.asarray(background)[None, None]
    out = color + bg * (1.0 - alpha[..., None])
    return np.asarray(out)


def render_perspective(
    density: np.ndarray,
    cam_pos=(1.7, 1.3, 1.7),
    look_at=(0.5, 0.5, 0.5),
    fov_deg: float = 40.0,
    size: Tuple[int, int] = (512, 512),
    steps: int = 256,
    absorption: float = 6.0,
    smoke_color=(0.9, 0.9, 0.95),
    background=(0.05, 0.06, 0.08),
) -> np.ndarray:
    """Perspective raymarch: 256 steps through the unit cube, front-to-back
    alpha — the reference fragment shader's loop, batched over all pixels."""
    tex = jnp.asarray(density)
    N = jnp.asarray(tex.shape, jnp.float32)
    H, W = size

    cam = jnp.asarray(cam_pos, jnp.float32)
    fwd = jnp.asarray(look_at, jnp.float32) - cam
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, jnp.asarray([0.0, 1.0, 0.0]))
    right = right / jnp.linalg.norm(right)
    up = jnp.cross(right, fwd)
    tanf = np.tan(np.radians(fov_deg) / 2)

    ys = (jnp.linspace(1, -1, H) * tanf)[:, None, None]
    xs = (jnp.linspace(-1, 1, W) * tanf * (W / H))[None, :, None]
    dirs = fwd[None, None] + xs * right[None, None] + ys * up[None, None]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)  # [H,W,3]

    # ray / unit-cube intersection (slab method)
    inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-8, 1e-8, dirs)
    t0 = (0.0 - cam) * inv
    t1 = (1.0 - cam) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tmin = jnp.maximum(tmin, 0.0)
    hit = tmax > tmin

    dt = (tmax - tmin) / steps

    def body(i, carry):
        color, alpha = carry
        t = tmin + (i + 0.5) * dt
        p = cam[None, None] + dirs * t[..., None]  # unit-cube coords
        vox = p * (N - 1.0)[None, None]
        dens = _sample_dense(tex, vox)
        a = jnp.clip(dens * absorption * dt, 0.0, 1.0) * (1.0 - alpha) * hit
        color = color + jnp.asarray(smoke_color)[None, None] * a[..., None]
        return color, alpha + a

    color, alpha = jax.lax.fori_loop(
        0,
        steps,
        body,
        (jnp.zeros((H, W, 3), jnp.float32), jnp.zeros((H, W), jnp.float32)),
    )
    bg = jnp.asarray(background)[None, None]
    return np.asarray(color + bg * (1.0 - alpha[..., None]))


def render_state(
    topo: Topology,
    state: FieldState,
    shape,
    origin=(0, 0, 0),
    field: str = "density",
    mode: str = "ortho",
    **kw,
) -> np.ndarray:
    """Densify a field over a view box and render it."""
    dense = np.asarray(
        tiles_to_dense(topo, state.scalar_blocks(field), shape, origin)
    )
    if mode == "ortho":
        emission = None
        if "flame" in state.scalars:
            emission = np.asarray(
                tiles_to_dense(topo, state.scalar_blocks("flame"), shape, origin)
            )
        if "collision_sdf" in state.scalars and "solid" not in kw:
            sdf = np.asarray(tiles_to_dense(
                topo, state.scalar_blocks("collision_sdf"), shape, origin))
            kw["solid"] = sdf < 0.0
        return render_orthographic(dense, emission=emission, **kw)
    return render_perspective(dense, **kw)


def write_apng(path: str, frames, delay_ms: int = 50) -> None:
    """Animated PNG (APNG: acTL/fcTL/fdAT chunks) — a single self-playing
    animation artifact with no external encoder (the environment has no
    ffmpeg). Browsers and most viewers play APNG natively."""
    frames = [np.clip(np.asarray(f) * 255.0, 0, 255).astype(np.uint8)
              for f in frames]
    h, w = frames[0].shape[:2]

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    def zdata(rgb: np.ndarray) -> bytes:
        raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
        return zlib.compress(raw, 6)

    out = [b"\x89PNG\r\n\x1a\n"]
    out.append(chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
    out.append(chunk(b"acTL", struct.pack(">II", len(frames), 0)))  # loop
    seq = 0
    for i, f in enumerate(frames):
        fctl = struct.pack(
            ">IIIIIHHbb", seq, w, h, 0, 0, delay_ms, 1000, 0, 0
        )
        out.append(chunk(b"fcTL", fctl))
        seq += 1
        z = zdata(f)
        if i == 0:
            out.append(chunk(b"IDAT", z))
        else:
            out.append(chunk(b"fdAT", struct.pack(">I", seq) + z))
            seq += 1
    out.append(chunk(b"IEND", b""))
    with open(path, "wb") as fh:
        fh.write(b"".join(out))


def render_turntable(
    topo: Topology,
    state: FieldState,
    shape,
    origin=(0, 0, 0),
    frames: int = 24,
    elevation: float = 0.9,
    radius: float = 1.8,
    size: Tuple[int, int] = (384, 384),
    field: str = "density",
    **kw,
):
    """Orbit the perspective raymarcher around the domain — the offline
    equivalent of dragging HNanoViewer's camera
    (`/root/reference/HNanoViewer/src/HNanoViewer.cpp:106-362`). Returns the
    list of [H,W,3] frames; densification happens once."""
    dense = np.asarray(
        tiles_to_dense(topo, state.scalar_blocks(field), shape, origin)
    )
    out = []
    for i in range(frames):
        a = 2.0 * np.pi * i / frames
        cam = (0.5 + radius * np.cos(a), elevation, 0.5 + radius * np.sin(a))
        out.append(render_perspective(dense, cam_pos=cam, size=size, **kw))
    return out
