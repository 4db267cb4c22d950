"""Collocated central-difference stencil ops: divergence, pressure-gradient
subtraction, vorticity confinement.

Semantics match the reference's device kernels exactly (collocated central
differences, NOT true MAC staggering — a documented reference quirk,
SURVEY §7.5):

- divergence:              `/root/reference/src/Cuda/Kernel.cu:499-519`
- subtractPressureGradient:`/root/reference/src/Cuda/Kernel.cu:765-829`
- vorticityConfinement:    `/root/reference/src/Cuda/Kernel.cu:970-1025`
  (+ computeVorticityMag,  `/root/reference/src/Cuda/Utils.cuh:226-243`)

All are built on halo gathers (ops/halo.py); out-of-domain reads are exact
background 0 via the null tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hnanosolver_tpu.core.topology import Topology, voxel_positions
from hnanosolver_tpu.ops.halo import center, face_shift_views, gather_halo, shift
from hnanosolver_tpu.ops.sampling import sample_nearest


def divergence(topo: Topology, vel: jax.Array, inv_dx: float) -> jax.Array:
    """div(u) at cell centers: per axis, average the face values
    0.5*(u_c + u_nbr) on both sides and difference them, scaled by 1/dx —
    the reference's scheme (`Kernel.cu:511-518`), which reduces to the plain
    central difference (u_{+1} - u_{-1}) / (2 dx) per axis."""
    v = face_shift_views(topo, vel)
    return (
        (v[(1, 0, 0)][..., 0] - v[(-1, 0, 0)][..., 0])
        + (v[(0, 1, 0)][..., 1] - v[(0, -1, 0)][..., 1])
        + (v[(0, 0, 1)][..., 2] - v[(0, 0, -1)][..., 2])
    ) * (0.5 * inv_dx)


def pressure_gradient(topo: Topology, p: jax.Array, inv_dx: float) -> jax.Array:
    """grad(p) at cell centers via central differences, (p_{+1}-p_{-1})/(2dx)."""
    v = face_shift_views(topo, p)
    gx = (v[(1, 0, 0)] - v[(-1, 0, 0)]) * (0.5 * inv_dx)
    gy = (v[(0, 1, 0)] - v[(0, -1, 0)]) * (0.5 * inv_dx)
    gz = (v[(0, 0, 1)] - v[(0, 0, -1)]) * (0.5 * inv_dx)
    return jnp.stack([gx, gy, gz], axis=-1)


def subtract_pressure_gradient(
    topo: Topology, vel: jax.Array, p: jax.Array, inv_dx: float
) -> jax.Array:
    """u <- u* - grad(p). dt/rho is absorbed into p's units, as in the
    reference (`Kernel.cu:804-806`). Collision no-slip blending is applied
    separately (ops/collision.py), matching the kernel's tail."""
    return vel - pressure_gradient(topo, p, inv_dx)


def _curl_from_views(v6, factor: float) -> jax.Array:
    """Vorticity omega = curl(u) from face-shifted views; factor = 0.5/dx."""
    upx, umx = v6[(1, 0, 0)], v6[(-1, 0, 0)]
    upy, umy = v6[(0, 1, 0)], v6[(0, -1, 0)]
    upz, umz = v6[(0, 0, 1)], v6[(0, 0, -1)]
    wx = ((upy[..., 2] - umy[..., 2]) - (upz[..., 1] - umz[..., 1])) * factor
    wy = ((upz[..., 0] - umz[..., 0]) - (upx[..., 2] - umx[..., 2])) * factor
    wz = ((upx[..., 1] - umx[..., 1]) - (upy[..., 0] - umy[..., 0])) * factor
    return jnp.stack([wx, wy, wz], axis=-1)


def vorticity_confinement(
    topo: Topology,
    vel: jax.Array,
    dt: float,
    inv_dx: float,
    confinement_scale: float,
    factor_scale: float,
) -> jax.Array:
    """u += scale * (N x omega) * dt with N = normalize(grad |omega|).

    The gradient of |omega| is sampled at integer offset ``s = int(factor_scale)``
    per axis — the reference constructs ``nanovdb::Coord(factorScale,0,0)``,
    truncating the float param to int (`Kernel.cu:998-1007`); with the SOP
    default 0.5 the offset truncates to 0 and the force vanishes. We keep
    that truncation for parity."""
    s = int(factor_scale)
    factor = 0.5 * inv_dx

    v6 = face_shift_views(topo, vel)
    omega = _curl_from_views(v6, factor)  # [T,8,8,8,3]

    if s == 0:
        grad = jnp.zeros_like(omega)
    else:
        # The reference recomputes |curl u| AT each offset coordinate through
        # the tree sampler (Utils.cuh:226-243) — so the magnitude can be
        # nonzero just outside the active set, where the curl stencil still
        # touches active voxels. Reproduce that with shift views over one
        # velocity halo of radius s+1 (row gathers only — no element gathers).
        big = gather_halo(topo, vel, s + 1)

        def mag_at(off):
            def v(axis_off):
                return shift(
                    big,
                    off[0] + axis_off[0],
                    off[1] + axis_off[1],
                    off[2] + axis_off[2],
                )

            upx, umx = v((1, 0, 0)), v((-1, 0, 0))
            upy, umy = v((0, 1, 0)), v((0, -1, 0))
            upz, umz = v((0, 0, 1)), v((0, 0, -1))
            wx = ((upy[..., 2] - umy[..., 2]) - (upz[..., 1] - umz[..., 1])) * factor
            wy = ((upz[..., 0] - umz[..., 0]) - (upx[..., 2] - umx[..., 2])) * factor
            wz = ((upx[..., 1] - umx[..., 1]) - (upy[..., 0] - umy[..., 0])) * factor
            return jnp.sqrt(wx * wx + wy * wy + wz * wz)

        gx = (mag_at((s, 0, 0)) - mag_at((-s, 0, 0))) * factor
        gy = (mag_at((0, s, 0)) - mag_at((0, -s, 0))) * factor
        gz = (mag_at((0, 0, s)) - mag_at((0, 0, -s))) * factor
        grad = jnp.stack([gx, gy, gz], axis=-1)

    # normalize with the reference's +1e-5 regularizer (Kernel.cu:1015)
    glen = jnp.sqrt(jnp.sum(grad * grad, axis=-1, keepdims=True)) + 1e-5
    N = grad / glen
    force = jnp.cross(N, omega)
    return vel + confinement_scale * force * dt
