"""Pressure solve: red-black Gauss-Seidel with SOR on the 7-point Laplacian.

Matches `/root/reference/src/Cuda/Kernel.cu:591-623` (redBlackGaussSeidelUpdate)
and the host loop `/root/reference/src/Cuda/HNanoSolver.cu:257-269`:

    pGS = (sum_{6 nbrs} p - div * dx^2) / 6
    p  += omega * (pGS - p)      for voxels of the active color

One reference "iteration" = a red sweep then a black sweep. The reference
launches all leaves in parallel with in-place global-memory updates, so its
cross-leaf ordering is chaotic; here each color sweep refreshes the halo
first, giving textbook RBGS — convergence is compared by residual, not by
matching the reference's nondeterministic intermediate states (SURVEY §7.4).

Out-of-domain pressure reads are background 0 (Dirichlet p=0 on the sparse
boundary), identical to the reference's index-sampler convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hnanosolver_tpu.core import coords as C
from hnanosolver_tpu.core.topology import Topology, voxel_positions
from hnanosolver_tpu.ops.halo import face_shift_views, gather_halo, shift


def _parity(topo: Topology) -> jax.Array:
    """(i+j+k) & 1 per voxel, [T,8,8,8] int32 (Kernel.cu:599-602)."""
    pos = voxel_positions(topo)
    return (pos[..., 0] + pos[..., 1] + pos[..., 2]) & 1


def _neighbor_sum(topo: Topology, p: jax.Array) -> jax.Array:
    # 7-point stencil as fused shifted views: 6 small row-gathers, no padded
    # buffer materialization (ops/halo.face_shift_views).
    v = face_shift_views(topo, p)
    return (
        v[(1, 0, 0)] + v[(-1, 0, 0)]
        + v[(0, 1, 0)] + v[(0, -1, 0)]
        + v[(0, 0, 1)] + v[(0, 0, -1)]
    )


def _color_sweep(topo, p, div, dx2, omega, color_mask):
    pgs = (_neighbor_sum(topo, p) - div * dx2) * (1.0 / 6.0)
    return jnp.where(color_mask, p + omega * (pgs - p), p)


def solve_pressure(
    topo: Topology,
    div: jax.Array,
    iterations: int,
    dx: float,
    omega: float,
    p0: jax.Array | None = None,
) -> jax.Array:
    """Run ``iterations`` red+black SOR sweeps from p0 (zeros by default)."""
    dx2 = dx * dx
    parity = _parity(topo)
    red = parity == 0
    black = parity == 1
    p = jnp.zeros_like(div) if p0 is None else p0

    def body(_, p):
        p = _color_sweep(topo, p, div, dx2, omega, red)
        p = _color_sweep(topo, p, div, dx2, omega, black)
        return p

    return jax.lax.fori_loop(0, iterations, body, p)


def residual(topo: Topology, p: jax.Array, div: jax.Array, dx: float) -> jax.Array:
    """Pointwise residual r = div - L(p) of the discrete Poisson problem
    L(p) = (sum nbrs - 6 p) / dx^2 (the system the GS update solves)."""
    lap = (_neighbor_sum(topo, p) - 6.0 * p) / (dx * dx)
    return div - lap


def jacobi_pressure(
    topo: Topology, div: jax.Array, iterations: int, dx: float, weight: float = 1.0
) -> jax.Array:
    """Weighted-Jacobi variant (fully parallel; smoother for multigrid)."""
    dx2 = dx * dx

    def body(_, p):
        pj = (_neighbor_sum(topo, p) - div * dx2) * (1.0 / 6.0)
        return p + weight * (pj - p)

    return jax.lax.fori_loop(0, iterations, body, jnp.zeros_like(div))
