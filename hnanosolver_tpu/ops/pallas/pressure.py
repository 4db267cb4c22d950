"""Pallas TPU kernel for the red-black SOR pressure sweep.

The XLA formulation of one color sweep is 6 row-gathers + a fused stencil
loop; this kernel fuses the stencil, the parity select, and the SOR update
into ONE TPU kernel per sweep, with all in-tile neighbor access done as
register shifts in VMEM — the TPU analog of the reference's shared-memory
variant ``redBlackGaussSeidelUpdate_opt``
(`/root/reference/src/Cuda/Kernel.cu:521-588`). Cross-tile faces are gathered
outside the kernel (contiguous row gathers, the measured-fast path) and fed
in as six [T, 8, 8] face planes.

Math (identical to ops/pressure.py and the reference):
    pGS = (sum_6nbr p - div dx^2) / 6;  p += omega (pGS - p)  on one parity.

``interpret=True`` is used automatically off-TPU so the kernel is testable
on CPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hnanosolver_tpu.core.topology import Topology, voxel_positions
from hnanosolver_tpu.ops.halo import face_shift_views

GROUP = 64  # tiles per pallas program


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu",) or "TPU" in str(jax.devices()[0])
    except Exception:  # pragma: no cover
        return False


def _axis_iota(shape, axis):
    return jax.lax.broadcasted_iota(jnp.int32, shape, axis)


def _shift_with_face(p, axis: int, direction: int, face):
    """p [G,8,8,8] shifted by +-1 along axis (1..3); boundary entries come
    from ``face`` [G,8,8] (the neighbor tile's adjacent plane)."""
    rolled = jnp.roll(p, -direction, axis=axis)
    idx = _axis_iota(p.shape, axis)
    boundary = idx == (7 if direction > 0 else 0)
    facef = jnp.expand_dims(face, axis)  # broadcast along the shifted axis
    return jnp.where(boundary, facef, rolled)


def _sweep_kernel(color: int, omega: float, dx2: float,
                  p_ref, div_ref, par_ref,
                  fxp_ref, fxm_ref, fyp_ref, fym_ref, fzp_ref, fzm_ref,
                  out_ref):
    p = p_ref[:]
    nbr = (
        _shift_with_face(p, 1, 1, fxp_ref[:])
        + _shift_with_face(p, 1, -1, fxm_ref[:])
        + _shift_with_face(p, 2, 1, fyp_ref[:])
        + _shift_with_face(p, 2, -1, fym_ref[:])
        + _shift_with_face(p, 3, 1, fzp_ref[:])
        + _shift_with_face(p, 3, -1, fzm_ref[:])
    )
    pgs = (nbr - div_ref[:] * dx2) * (1.0 / 6.0)
    lx = _axis_iota(p.shape, 1)
    ly = _axis_iota(p.shape, 2)
    lz = _axis_iota(p.shape, 3)
    parity = (lx + ly + lz + par_ref[:][:, :, :, None]) & 1
    out_ref[:] = jnp.where(parity == color, p + omega * (pgs - p), p)


def _faces(topo: Topology, p: jax.Array):
    """Six neighbor face planes via row gathers: +x needs the +x neighbor's
    x=0 plane, etc. Shapes [T,8,8]."""
    nbr = topo.nbr

    def take(sub, d):
        return jnp.take(sub, nbr[:, d], axis=0)

    d = lambda ox, oy, oz: (ox + 1) * 9 + (oy + 1) * 3 + (oz + 1)
    return (
        take(p[:, 0], d(1, 0, 0)),     # fxp: plane for x-shift +1
        take(p[:, 7], d(-1, 0, 0)),    # fxm
        take(p[:, :, 0], d(0, 1, 0)),  # fyp
        take(p[:, :, 7], d(0, -1, 0)),  # fym
        take(p[:, :, :, 0], d(0, 0, 1)),  # fzp
        take(p[:, :, :, 7], d(0, 0, -1)),  # fzm
    )


@functools.lru_cache(maxsize=None)
def _build_sweep(color: int, omega: float, dx2: float, T: int, interpret: bool):
    G = min(GROUP, T)
    grid = (T // G,)
    tile_spec = pl.BlockSpec((G, 8, 8, 8), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    face_spec = pl.BlockSpec((G, 8, 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    par_spec = pl.BlockSpec((G, 1, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_sweep_kernel, color, omega, dx2)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_spec, tile_spec, par_spec] + [face_spec] * 6,
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((T, 8, 8, 8), jnp.float32),
        interpret=interpret,
    )


def solve_pressure_pallas(
    topo: Topology,
    div: jax.Array,
    iterations: int,
    dx: float,
    omega: float,
    p0=None,
    interpret=None,
) -> jax.Array:
    """Drop-in replacement for ops.pressure.solve_pressure using the fused
    Pallas sweep (2 kernel launches + 12 row-gathers per iteration)."""
    if interpret is None:
        interpret = not _on_tpu()
    T = topo.capacity
    pos = voxel_positions(topo)
    par = ((pos[..., 0] + pos[..., 1] + pos[..., 2])[:, 0, 0, 0] & 1).astype(
        jnp.int32
    )[:, None, None]  # [T,1,1] origin parity per tile
    dx2 = float(dx) * float(dx)
    red = _build_sweep(0, float(omega), dx2, T, bool(interpret))
    black = _build_sweep(1, float(omega), dx2, T, bool(interpret))
    p = jnp.zeros_like(div) if p0 is None else p0

    def body(_, p):
        p = red(p, div, par, *_faces(topo, p))
        p = black(p, div, par, *_faces(topo, p))
        return p

    return jax.lax.fori_loop(0, iterations, body, p)
