"""Dense-grid reference implementation of the solver physics.

Independent oracle for the sparse tile path: same math as the reference CUDA
kernels, written directly on ``[N, N, N]`` / ``[N, N, N, 3]`` arrays with
zero (background) boundary conditions — the role BASELINE.json config 1
assigns to a "CPU NanoVDB reference". Field values outside the box read as
exact 0, matching the sparse null-tile convention, so a sparse topology
covering exactly this box must reproduce these results to float tolerance.

This module is deliberately simple, not fast; performance work happens only
on the sparse path.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _shifted(f: jax.Array, dx: int, dy: int, dz: int) -> jax.Array:
    """f sampled at (i+dx, j+dy, k+dz) with zero outside the box."""
    pad = [(max(-dx, 0), max(dx, 0)), (max(-dy, 0), max(dy, 0)), (max(-dz, 0), max(dz, 0))]
    if f.ndim == 4:
        pad = pad + [(0, 0)]
    g = jnp.pad(f, pad)
    N = f.shape[0], f.shape[1], f.shape[2]
    sl = (
        slice(pad[0][0] + dx, pad[0][0] + dx + N[0]),
        slice(pad[1][0] + dy, pad[1][0] + dy + N[1]),
        slice(pad[2][0] + dz, pad[2][0] + dz + N[2]),
    )
    return g[sl]


def sample_nearest(f: jax.Array, coords: jax.Array) -> jax.Array:
    """Integer-coordinate gather with zero outside; coords [..., 3] int32."""
    N = jnp.array(f.shape[:3], jnp.int32)
    inside = jnp.all((coords >= 0) & (coords < N), axis=-1)
    c = jnp.clip(coords, 0, N - 1)
    vals = f[c[..., 0], c[..., 1], c[..., 2]]
    mask = inside if f.ndim == 3 else inside[..., None]
    return jnp.where(mask, vals, 0.0)


def sample_trilinear(f: jax.Array, pos: jax.Array) -> jax.Array:
    """Trilinear interpolation at float positions, zero background."""
    base = jnp.floor(pos).astype(jnp.int32)
    frac = pos - jnp.floor(pos)
    tx, ty, tz = frac[..., 0], frac[..., 1], frac[..., 2]
    itx, ity, itz = 1 - tx, 1 - ty, 1 - tz
    acc = None
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                w = (
                    (tx if di else itx)
                    * (ty if dj else ity)
                    * (tz if dk else itz)
                )
                v = sample_nearest(f, base + jnp.array([di, dj, dk], jnp.int32))
                v = v * (w[..., None] if f.ndim == 4 else w)
                acc = v if acc is None else acc + v
    return acc


def positions(shape) -> jax.Array:
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    k = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    return jnp.stack([i, j, k], axis=-1)


def divergence(vel: jax.Array, inv_dx: float) -> jax.Array:
    xp = 0.5 * (vel[..., 0] + _shifted(vel, 1, 0, 0)[..., 0])
    xm = 0.5 * (vel[..., 0] + _shifted(vel, -1, 0, 0)[..., 0])
    yp = 0.5 * (vel[..., 1] + _shifted(vel, 0, 1, 0)[..., 1])
    ym = 0.5 * (vel[..., 1] + _shifted(vel, 0, -1, 0)[..., 1])
    zp = 0.5 * (vel[..., 2] + _shifted(vel, 0, 0, 1)[..., 2])
    zm = 0.5 * (vel[..., 2] + _shifted(vel, 0, 0, -1)[..., 2])
    return (xp - xm + yp - ym + zp - zm) * inv_dx


def neighbor_sum(p: jax.Array) -> jax.Array:
    return (
        _shifted(p, 1, 0, 0)
        + _shifted(p, -1, 0, 0)
        + _shifted(p, 0, 1, 0)
        + _shifted(p, 0, -1, 0)
        + _shifted(p, 0, 0, 1)
        + _shifted(p, 0, 0, -1)
    )


def solve_pressure(
    div: jax.Array, iterations: int, dx: float, omega: float
) -> jax.Array:
    pos = positions(div.shape)
    parity = (pos[..., 0] + pos[..., 1] + pos[..., 2]) & 1
    dx2 = dx * dx

    def sweep(p, mask):
        pgs = (neighbor_sum(p) - div * dx2) / 6.0
        return jnp.where(mask, p + omega * (pgs - p), p)

    def body(_, p):
        p = sweep(p, parity == 0)
        p = sweep(p, parity == 1)
        return p

    return jax.lax.fori_loop(0, iterations, body, jnp.zeros_like(div))


def subtract_pressure_gradient(
    vel: jax.Array, p: jax.Array, inv_dx: float
) -> jax.Array:
    g = jnp.stack(
        [
            (_shifted(p, 1, 0, 0) - _shifted(p, -1, 0, 0)),
            (_shifted(p, 0, 1, 0) - _shifted(p, 0, -1, 0)),
            (_shifted(p, 0, 0, 1) - _shifted(p, 0, 0, -1)),
        ],
        axis=-1,
    ) * (0.5 * inv_dx)
    return vel - g


def vorticity_confinement(
    vel: jax.Array, dt: float, inv_dx: float, scale: float, factor_scale: float
) -> jax.Array:
    s = int(factor_scale)
    factor = 0.5 * inv_dx

    def curl_at(off):
        def v(o):
            return sample_nearest(
                vel, positions(vel.shape[:3]) + jnp.array(off, jnp.int32) + jnp.array(o, jnp.int32)
            )

        upx, umx = v((1, 0, 0)), v((-1, 0, 0))
        upy, umy = v((0, 1, 0)), v((0, -1, 0))
        upz, umz = v((0, 0, 1)), v((0, 0, -1))
        wx = ((upy[..., 2] - umy[..., 2]) - (upz[..., 1] - umz[..., 1])) * factor
        wy = ((upz[..., 0] - umz[..., 0]) - (upx[..., 2] - umx[..., 2])) * factor
        wz = ((upx[..., 1] - umx[..., 1]) - (upy[..., 0] - umy[..., 0])) * factor
        return jnp.stack([wx, wy, wz], axis=-1)

    omega = curl_at((0, 0, 0))
    if s == 0:
        grad = jnp.zeros_like(omega)
    else:
        def mag(off):
            w = curl_at(off)
            return jnp.sqrt(jnp.sum(w * w, axis=-1))

        grad = jnp.stack(
            [
                (mag((s, 0, 0)) - mag((-s, 0, 0))) * factor,
                (mag((0, s, 0)) - mag((0, -s, 0))) * factor,
                (mag((0, 0, s)) - mag((0, 0, -s))) * factor,
            ],
            axis=-1,
        )
    glen = jnp.sqrt(jnp.sum(grad * grad, axis=-1, keepdims=True)) + 1e-5
    return vel + scale * jnp.cross(grad / glen, omega) * dt


def advect_bfecc(
    vel: jax.Array, field: jax.Array, dt: float, inv_dx: float
) -> jax.Array:
    """BFECC advection of a scalar or vector field (no collisions)."""
    scaled_dt = dt * inv_dx
    pos = positions(vel.shape[:3]).astype(vel.dtype)
    back = pos - vel * scaled_dt
    vel_f = sample_trilinear(vel, back)
    fwd2 = back + vel_f * scaled_dt
    phi_f = sample_trilinear(field, back)
    phi_b = sample_trilinear(field, fwd2)
    corr = phi_f + 0.5 * (field - phi_b)
    lo = jnp.minimum(field, phi_f)
    hi = jnp.maximum(field, phi_f)
    for off in [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]:
        n = _shifted(field, *off)
        lo = jnp.minimum(lo, n)
        hi = jnp.maximum(hi, n)
    return jnp.clip(corr, lo, hi)
