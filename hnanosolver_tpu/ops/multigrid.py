"""Geometric multigrid pressure solver on the sparse tile hierarchy.

The reference *intended* a multigrid V-cycle — kernels are declared
(`/root/reference/src/Cuda/Kernels.cuh:40-49`), one restriction is written
(`Kernel.cu:625-658`), and the whole host driver exists as a comment
(`HNanoSolver.cu:399-506`) — but none of it runs (SURVEY §7.6). This module
implements it for real, TPU-style:

- Level k+1 tiles are the unique ``tile_coord >> 1`` of level k — each
  coarse 8^3 tile covers a 2x2x2 block of fine tiles, so restriction /
  prolongation are pure row-gathers + reshapes (no element gathers).
- Restriction: 2x2x2 averaging (full-weighting lite — exactly the
  reference's restrict_to_4x4x4 scheme at tile scale).
- Prolongation: piecewise-constant injection (the standard pairing with a
  red-black smoother; trilinear is a planned refinement).
- Smoother: the same red-black SOR sweep as the direct solver
  (ops/pressure.py), so a 0-level hierarchy degenerates to plain RBGS.

The discrete operator at every level is the 7-point Laplacian
L(p) = (sum_nbr p - 6 p) / dx^2 with Dirichlet-0 background (null tile),
with dx doubling per level.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from hnanosolver_tpu.core import coords as C
from hnanosolver_tpu.core.topology import Topology, build_topology
from hnanosolver_tpu.ops import pressure as prs


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MGLevel:
    """One coarse level: its topology plus child/parent row maps."""

    topo: Topology
    children: jax.Array  # [Tc, 8] fine-level rows per octant (0 = absent)
    parent: jax.Array  # [Tf] coarse-level row of each fine tile (0 = none)
    octant: jax.Array  # [Tf] in {0..7}: (tx&1)*4 + (ty&1)*2 + (tz&1)

    def tree_flatten(self):
        return (self.topo, self.children, self.parent, self.octant), ()

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


def build_hierarchy(topo: Topology, levels: int) -> List[MGLevel]:
    """Host-side construction of ``levels`` coarse levels below ``topo``."""
    out: List[MGLevel] = []
    fine = topo
    for _ in range(levels):
        nf = int(fine.n_active)
        fo = np.asarray(fine.origins[1 : nf + 1])  # fine tile coords
        co = fo >> 1
        coarse = build_topology(co)
        nc = int(coarse.n_active)

        # parent row per fine tile
        ckeys = np.asarray(coarse.keys)[1 : nc + 1]
        pk = C.pack_keys_np(co)
        prow = (np.searchsorted(ckeys, pk) + 1).astype(np.int32)
        parent = np.zeros(fine.capacity, np.int32)
        parent[1 : nf + 1] = prow
        oct_ = np.zeros(fine.capacity, np.int32)
        oct_[1 : nf + 1] = ((fo[:, 0] & 1) * 4 + (fo[:, 1] & 1) * 2 + (fo[:, 2] & 1))

        # children rows per coarse tile
        children = np.zeros((coarse.capacity, 8), np.int32)
        children[prow, oct_[1 : nf + 1]] = np.arange(1, nf + 1, dtype=np.int32)

        out.append(
            MGLevel(
                topo=coarse,
                children=jnp.asarray(children),
                parent=jnp.asarray(parent),
                octant=jnp.asarray(oct_),
            )
        )
        fine = coarse
    return out


def restrict(level: MGLevel, fine: jax.Array) -> jax.Array:
    """[Tf,512] -> [Tc,512] (flat layout): average 2x2x2 fine voxels,
    assemble the 8 child tiles into the coarse tile's octants."""
    Tf = fine.shape[0]
    # per-fine-tile 2x downsample -> [Tf,4,4,4] (flat order == block order)
    avg = fine.reshape(Tf, 4, 2, 4, 2, 4, 2).mean(axis=(2, 4, 6))
    Tc = level.children.shape[0]
    # gather children [Tc, 8, 4,4,4] (row gathers; absent -> null tile zeros)
    ch = jnp.take(avg, level.children.reshape(-1), axis=0).reshape(Tc, 2, 2, 2, 4, 4, 4)
    # octant (cx,cy,cz) occupies coarse[cx*4:(cx+1)*4, ...]
    out = jnp.moveaxis(ch, (1, 2, 3), (1, 3, 5))  # [Tc, 2,4, 2,4, 2,4]
    return out.reshape(Tc, 512)


def prolong(level: MGLevel, coarse: jax.Array, fine_capacity: int) -> jax.Array:
    """[Tc,512] -> [Tf,512] (flat layout): pick each fine tile's 4^3 octant
    of its parent and upsample 2x (piecewise constant)."""
    # parent rows + octant slices; gather parent tiles per fine tile
    par = jnp.take(coarse, level.parent, axis=0).reshape(-1, 8, 8, 8)
    # slice the octant: offsets 0 or 4 per axis
    ox = (level.octant >> 2) & 1
    oy = (level.octant >> 1) & 1
    oz = level.octant & 1
    # build per-tile 4^3 block via take_along_axis on each axis
    ix = (jnp.arange(4)[None, :] + ox[:, None] * 4)  # [Tf,4]
    iy = (jnp.arange(4)[None, :] + oy[:, None] * 4)
    iz = (jnp.arange(4)[None, :] + oz[:, None] * 4)
    blk = jnp.take_along_axis(par, ix[:, :, None, None], axis=1)
    blk = jnp.take_along_axis(blk, iy[:, None, :, None], axis=2)
    blk = jnp.take_along_axis(blk, iz[:, None, None, :], axis=3)  # [Tf,4,4,4]
    up = jnp.repeat(jnp.repeat(jnp.repeat(blk, 2, 1), 2, 2), 2, 3)
    return up.reshape(-1, 512)


def v_cycle(
    topo: Topology,
    hierarchy: List[MGLevel],
    div: jax.Array,
    p: jax.Array,
    dx: float,
    omega: float,
    n_pre: int = 2,
    n_post: int = 2,
    n_coarsest: int = 24,
) -> jax.Array:
    """One V-cycle of the reference's commented driver (HNanoSolver.cu:399-506),
    recursing down ``hierarchy``."""
    if not hierarchy:
        return prs.solve_pressure(topo, div, n_coarsest, dx, omega, p0=p)
    lvl = hierarchy[0]
    p = prs.solve_pressure(topo, div, n_pre, dx, omega, p0=p)
    r = prs.residual(topo, p, div, dx)
    rc = restrict(lvl, r)
    ec = v_cycle(
        lvl.topo,
        hierarchy[1:],
        rc,
        jnp.zeros_like(rc),
        dx * 2.0,
        omega,
        n_pre,
        n_post,
        n_coarsest,
    )
    p = p + prolong(lvl, ec, topo.capacity)
    return prs.solve_pressure(topo, div, n_post, dx, omega, p0=p)


def solve_pressure_mg(
    topo: Topology,
    hierarchy: List[MGLevel],
    div: jax.Array,
    cycles: int,
    dx: float,
    omega: float = 1.0,
    **kw,
) -> jax.Array:
    """``cycles`` V-cycles from a zero initial guess."""
    p = jnp.zeros_like(div)
    for _ in range(cycles):
        p = v_cycle(topo, hierarchy, div, p, dx, omega, **kw)
    return p
