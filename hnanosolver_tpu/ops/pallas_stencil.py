"""Fused divergence / pressure-gradient kernels (flat [T,512] layout).

Same construction as the fused BFECC tail (ops/pallas_tail.py, NOTES r4
fact 47): in-tile face views are register lane-rolls, cross-tile boundary
lanes come from byte-minimal packed-plane gathers (64 of 512 lanes per
neighbor row) landed on their lanes by exact one-hot MXU dots. Each kernel
reads its fields once and writes once, replacing the XLA form's six
materialized roll/select passes.

Bit-identical to ops/stencil.py's below-budget XLA forms (same add order,
same final scale) — asserted by tests.

References: divergence `Kernel.cu:511-518`; subtractPressureGradient
`Kernel.cu:804-806`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hnanosolver_tpu.core.layout import TILE
from hnanosolver_tpu.core.topology import Topology
from hnanosolver_tpu.ops import shifts as sh
from hnanosolver_tpu.ops.pallas_tail import (
    _bl_expr,
    _IN_ROLL,
    _on_tpu,
    _pick_g,
)

# Master switches (A/B probes flip them); integration gates live in
# ops/stencil.py and ops/pressure.py.
#
# STENCIL_KERNEL (divergence/subtract-gradient): compiles on-chip with
# parity <= 9.4e-38 vs the XLA forms (probe 115), but the same-window
# timing was inconclusive at bench size — default decided by the
# full-step A/B (probe 117).
# RESID_KERNEL (Poisson residual): validated on-chip (probe 114) —
# parity 0.0 at pow2 dx / <= 2 ulp otherwise (division lowering), and
# 0.33 ms vs 4.6 ms XLA min-of-rounds. Only multigrid and diagnostics
# consume it; ON.
STENCIL_KERNEL: bool = False
RESID_KERNEL: bool = True

_AXIS_DIRS = (  # (+a, -a) per axis a — the divergence/gradient order
    ((1, 0, 0), (-1, 0, 0)),
    ((0, 1, 0), (0, -1, 0)),
    ((0, 0, 1), (0, 0, -1)),
)


def _masks_and_expand(G: int):
    col = jax.lax.broadcasted_iota(jnp.int32, (G, TILE), 1)
    cx, cy, cz = col // 64, (col // 8) % 8, col % 8
    masks = {
        (1, 0, 0): cx == 7,
        (-1, 0, 0): cx == 0,
        (0, 1, 0): cy == 7,
        (0, -1, 0): cy == 0,
        (0, 0, 1): cz == 7,
        (0, 0, -1): cz == 0,
    }
    krow = jax.lax.broadcasted_iota(jnp.int32, (64, TILE), 0)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (64, TILE), 1)
    expand = {
        off: (kcol == _bl_expr(off, krow)).astype(jnp.float32)
        for off in sh.FACE_DIRS
    }
    return masks, expand


def _view(phi, q, off, masks, expand):
    """shifts.shifted_view(phi, off) for one [G,512] block: in-tile roll +
    the gathered 64-lane plane landed on the boundary lanes (exact one-hot
    MXU expansion — pallas_tail docstring)."""
    fix = jax.lax.dot_general(
        q, expand[off], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.where(masks[off], fix, pltpu.roll(phi, _IN_ROLL[off] % TILE, 1))


def _div_kernel(G: int, scale: float, vel_ref, planes_ref, out_ref):
    masks, expand = _masks_and_expand(G)
    acc = None
    for a, (op, om) in enumerate(_AXIS_DIRS):
        u = vel_ref[a]
        ip = sh.FACE_DIRS.index(op)
        im = sh.FACE_DIRS.index(om)
        term = (_view(u, planes_ref[ip], op, masks, expand)
                - _view(u, planes_ref[im], om, masks, expand))
        acc = term if acc is None else acc + term
    out_ref[:] = acc * scale


@functools.lru_cache(maxsize=None)
def _build_div(T: int, scale: float, interpret: bool):
    G = _pick_g(T)
    return pl.pallas_call(
        functools.partial(_div_kernel, G, scale),
        grid=(T // G,),
        in_specs=[
            pl.BlockSpec((3, G, TILE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, G, 64), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, TILE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, TILE), jnp.float32),
        interpret=interpret,
    )


def _component_planes(topo: Topology, vel: jax.Array):
    """[6, T, 64]: direction i's plane of the component along its axis —
    the only cross-tile lanes the divergence stencil reads."""
    T = vel.shape[1]
    maps = sh._plane_maps(1)
    packed = jnp.moveaxis(vel, 0, 1).reshape(T, 3 * TILE)
    # per direction: component axis(i)'s touching plane of the neighbor row
    cols = []
    for i, off in enumerate(sh.FACE_DIRS):
        ax = max(range(3), key=lambda a: abs(off[a]))
        cols.append(np.asarray(maps[i][2]) + ax * TILE)
    P = jnp.take(packed, jnp.asarray(np.concatenate(cols)), axis=1)
    gs = [
        jnp.take(P[:, i * 64:(i + 1) * 64], topo.nbr[:, sh.d_of(off)], axis=0)
        for i, off in enumerate(sh.FACE_DIRS)
    ]
    return jnp.stack(gs, 0)  # [6, T, 64]


def divergence_fused(topo: Topology, vel: jax.Array, inv_dx: float,
                     interpret=None) -> jax.Array:
    """Bit-identical to ops/stencil.divergence's below-budget XLA form."""
    if interpret is None:
        interpret = not _on_tpu()
    T = vel.shape[1]
    planes = _component_planes(topo, vel)
    fn = _build_div(T, float(0.5 * inv_dx), bool(interpret))
    return fn(vel, planes)


def _subgrad_kernel(G: int, scale: float, vel_ref, p_ref, planes_ref,
                    out_ref):
    masks, expand = _masks_and_expand(G)
    p = p_ref[:]
    for a, (op, om) in enumerate(_AXIS_DIRS):
        ip = sh.FACE_DIRS.index(op)
        im = sh.FACE_DIRS.index(om)
        g = (_view(p, planes_ref[ip], op, masks, expand)
             - _view(p, planes_ref[im], om, masks, expand)) * scale
        out_ref[a] = vel_ref[a] - g


@functools.lru_cache(maxsize=None)
def _build_subgrad(T: int, scale: float, interpret: bool):
    G = _pick_g(T)
    vspec = pl.BlockSpec((3, G, TILE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_subgrad_kernel, G, scale),
        grid=(T // G,),
        in_specs=[
            vspec,
            pl.BlockSpec((G, TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, G, 64), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((3, T, TILE), jnp.float32),
        interpret=interpret,
    )


def _residual_kernel(G: int, dx2: float, p_ref, div_ref, planes_ref,
                     out_ref):
    masks, expand = _masks_and_expand(G)
    p = p_ref[:]
    acc = None
    for di, off in enumerate(sh.FACE_DIRS):
        v = _view(p, planes_ref[di], off, masks, expand)
        acc = v if acc is None else acc + v
    out_ref[:] = div_ref[:] - (acc - 6.0 * p) / dx2


@functools.lru_cache(maxsize=None)
def _build_residual(T: int, dx2: float, interpret: bool):
    G = _pick_g(T)
    spec = pl.BlockSpec((G, TILE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_residual_kernel, G, dx2),
        grid=(T // G,),
        in_specs=[
            spec,
            spec,
            pl.BlockSpec((6, G, 64), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((T, TILE), jnp.float32),
        interpret=interpret,
    )


def residual_fused(topo: Topology, p: jax.Array, div: jax.Array, dx: float,
                   interpret=None) -> jax.Array:
    """div - (neighbor_sum(p) - 6 p)/dx^2 in one launch — bit-identical to
    ops/pressure.residual's XLA form (same left-associated add order). The
    only transient is the [6,T,64] packed-plane gather (field/8), smaller
    than even ONE full shifted view, so this form is safe at every domain
    size (the multigrid V-cycle computes a fine-level residual per cycle —
    at 1024^3 the XLA form's gathers move 8x more halo bytes)."""
    if interpret is None:
        interpret = not _on_tpu()
    planes = _field_planes(topo, p)
    fn = _build_residual(p.shape[0], float(dx) * float(dx), bool(interpret))
    return fn(p, div, planes)


def _field_planes(topo: Topology, p: jax.Array):
    """[6, T, 64]: each direction's touching plane of ``p``'s neighbor."""
    maps = sh._plane_maps(1)
    cols = jnp.concatenate([m[2] for m in maps])
    P = jnp.take(p, cols, axis=1)  # [T, 6*64]
    gs = [
        jnp.take(P[:, i * 64:(i + 1) * 64], topo.nbr[:, sh.d_of(off)], axis=0)
        for i, off in enumerate(sh.FACE_DIRS)
    ]
    return jnp.stack(gs, 0)


def subtract_gradient_fused(topo: Topology, vel: jax.Array, p: jax.Array,
                            inv_dx: float, interpret=None) -> jax.Array:
    """Bit-identical to ops/stencil.subtract_pressure_gradient's
    below-budget XLA form (vel - pressure_gradient)."""
    if interpret is None:
        interpret = not _on_tpu()
    T = vel.shape[1]
    planes = _field_planes(topo, p)
    fn = _build_subgrad(T, float(0.5 * inv_dx), bool(interpret))
    return fn(vel, p, planes)
