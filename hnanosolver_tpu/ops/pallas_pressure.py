"""Fused Pallas kernel for one red-black SOR color sweep (flat layout).

The XLA sweep is ~24 small kernels (6 neighbor-row gathers + rolls + selects
+ FMA); this fuses everything after the gathers into ONE kernel: in-tile
neighbor access as lane rolls, boundary fixes from the six pre-gathered
neighbor rows, parity select and the SOR update — the flat-layout successor
of the reference's shared-memory kernel ``redBlackGaussSeidelUpdate_opt``
(`/root/reference/src/Cuda/Kernel.cu:521-588`).

Math identical to ops/pressure.py:
    pGS = (sum_6 p_nbr - div dx^2)/6;  p += omega (pGS - p) on one parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hnanosolver_tpu.core.layout import TILE
from hnanosolver_tpu.core.topology import Topology
from hnanosolver_tpu.ops.shifts import d_of

G = 8  # tiles per program

# (in-tile roll, neighbor-row fix roll) per face direction — see ops/shifts.py
_ROLLS = {
    (1, 0, 0): (-64, 448),
    (-1, 0, 0): (64, -448),
    (0, 1, 0): (-8, 56),
    (0, -1, 0): (8, -56),
    (0, 0, 1): (-1, 7),
    (0, 0, -1): (1, -7),
}
_DIRS = tuple(_ROLLS)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu" or "TPU" in str(jax.devices()[0])
    except Exception:  # pragma: no cover
        return False


def _kernel(color: int, omega: float, dx2: float,
            p_ref, div_ref, porg_ref, *rest):
    nbr_refs = rest[:6]
    out_ref = rest[6]
    p = p_ref[:]  # [G,512]
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
    nbr_sum = jnp.zeros((G, TILE), jnp.float32)
    for off, ref in zip(_DIRS, nbr_refs):
        s_in, s_fix = _ROLLS[off]
        view = jnp.where(
            masks[off],
            pltpu.roll(ref[:], s_fix % TILE, 1),  # pltpu.roll needs shift >= 0
            pltpu.roll(p, s_in % TILE, 1),
        )
        nbr_sum = nbr_sum + view
    pgs = (nbr_sum - div_ref[:] * dx2) * (1.0 / 6.0)
    parity = (porg_ref[:] + cx + cy + cz) & 1
    out_ref[:] = jnp.where(parity == color, p + omega * (pgs - p), p)


@functools.lru_cache(maxsize=None)
def _build(color: int, omega: float, dx2: float, T: int, interpret: bool):
    spec = pl.BlockSpec((G, TILE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, color, omega, dx2),
        grid=(T // G,),
        in_specs=[spec] * 9,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((T, TILE), jnp.float32),
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
    """Drop-in replacement for ops.pressure.solve_pressure (flat [T,512])."""
    if interpret is None:
        interpret = not _on_tpu()
    T = div.shape[0]
    org = topo.origins * 8
    porg = jnp.broadcast_to(
        ((org[:, 0] + org[:, 1] + org[:, 2]) & 1)[:, None], (T, TILE)
    ).astype(jnp.int32)
    dx2 = float(dx) * float(dx)
    red = _build(0, float(omega), dx2, T, bool(interpret))
    black = _build(1, float(omega), dx2, T, bool(interpret))
    nbr_cols = [topo.nbr[:, d_of(off)] for off in _DIRS]
    p = jnp.zeros_like(div) if p0 is None else p0

    def faces(p):
        return [jnp.take(p, c, axis=0) for c in nbr_cols]

    def body(_, p):
        p = red(p, div, porg, *faces(p))
        p = black(p, div, porg, *faces(p))
        return p

    return jax.lax.fori_loop(0, iterations, body, p)
