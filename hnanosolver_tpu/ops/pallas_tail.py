"""Fused BFECC tail: limiter bounds + correction + clip in ONE kernel.

The BFECC limiter (reference ``Kernel.cu:249-261``) clamps the corrected
value to min/max over {self, 6 face neighbors, phiF}. The XLA formulation
costs, per advected field batch: a plane-pack pass, 6 row gathers, and six
roll+select+min/max passes over field-sized arrays — XLA materializes each
lane roll as a full copy (NOTES r3 fact 42), so the views dominate. This
kernel keeps the byte-minimal packed-plane gather (64 of 512 lanes per
neighbor row — probe r4/065) and runs everything else in VMEM:

- in-tile face views are register lane-rolls (the pressure-kernel pattern);
- each gathered 64-lane plane lands on its boundary lanes through a ONE-HOT
  MXU dot (M[k, bl_k] = 1, built from iotas) — exact: decompose-and-sum of
  x * 1.0 with 0.0 elsewhere reproduces x bitwise under HIGHEST precision;
- bounds, correction pf + 0.5 (phi0 - pb), and the clip fuse into the same
  pass, so phi0/pf/pb are read once and the output written once.

Bit-identical to the XLA path (min/max are order-free exact ops; the
correction uses the same f32 expression) — asserted by tests.
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


# Master switch (A/B probes flip it); the integration gate is
# advection._tail_kernel_ok. Probe r4/107 (on-chip): compiles, BITWISE
# parity 0.0 vs the XLA path (kernel alone and the full scalar pass), and
# the 5-field balanced scalar pass measured 8.0-12.8 ms vs 14.4-21.3 off
# (ratio 0.56, interleaved same-window, every round on wins).
TAIL_KERNEL: bool = True


def _pick_g(T: int) -> int:
    for g in (32, 16, 8, 4, 2):
        if g <= T and T % g == 0:
            return g
    return 1


def _on_tpu() -> bool:
    try:
        dev = jax.devices()[0]
        return dev.platform == "tpu" or "TPU" in str(dev)
    except Exception:  # pragma: no cover
        return False


# per FACE_DIRS entry: in-tile roll (see ops/shifts.py) and the boundary
# lane expression bl(k) for k in [0, 64) in ascending-lane order
_IN_ROLL = {
    (1, 0, 0): -64,
    (-1, 0, 0): 64,
    (0, 1, 0): -8,
    (0, -1, 0): 8,
    (0, 0, 1): -1,
    (0, 0, -1): 1,
}


def _bl_expr(off, k):
    """Boundary (dest) lane of plane slot k, ascending-lane order — matches
    shifts._plane_maps (bl = nonzero(mask) ascending)."""
    ax = max(range(3), key=lambda a: abs(off[a]))
    hi = off[ax] > 0
    if ax == 0:  # lanes cx == 7 (or 0): l = 448 + k  (or k)
        return (448 + k) if hi else k
    if ax == 1:  # lanes cy == 7: l = (k//8)*64 + 56 + k%8
        return (k // 8) * 64 + (56 if hi else 0) + k % 8
    # lanes cz == 7: l = (k//8)*64 + (k%8)*8 + 7
    return (k // 8) * 64 + (k % 8) * 8 + (7 if hi else 0)


def _kernel(F: int, G: int, phi_ref, pf_ref, pb_ref, planes_ref, out_ref):
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
    # one-hot expansion matrices, [64, 512] per direction, from iotas
    krow = jax.lax.broadcasted_iota(jnp.int32, (64, TILE), 0)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (64, TILE), 1)
    expand = {
        off: (kcol == _bl_expr(off, krow)).astype(jnp.float32)
        for off in sh.FACE_DIRS
    }
    for f in range(F):
        phi = phi_ref[f]
        pf = pf_ref[f]
        mins = maxs = None
        for di, off in enumerate(sh.FACE_DIRS):
            q = planes_ref[di * F + f]  # [G, 64] packed plane
            fix = jax.lax.dot_general(
                q, expand[off], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            view = jnp.where(
                masks[off], fix,
                pltpu.roll(phi, _IN_ROLL[off] % TILE, 1),
            )
            mins = view if mins is None else jnp.minimum(mins, view)
            maxs = view if maxs is None else jnp.maximum(maxs, view)
        corr = pf + 0.5 * (phi - pb_ref[f])
        lo = jnp.minimum(jnp.minimum(phi, mins), pf)
        hi = jnp.maximum(jnp.maximum(phi, maxs), pf)
        out_ref[f] = jnp.clip(corr, lo, hi)


@functools.lru_cache(maxsize=None)
def _build(F: int, T: int, interpret: bool):
    G = _pick_g(T)
    fspec = pl.BlockSpec((F, G, TILE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((6 * F, G, 64), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, F, G),
        grid=(T // G,),
        in_specs=[fspec, fspec, fspec, pspec],
        out_specs=fspec,
        out_shape=jax.ShapeDtypeStruct((F, T, TILE), jnp.float32),
        interpret=interpret,
    )


def bfecc_tail_fused(
    topo: Topology,
    phi0s: jax.Array,
    pfs: jax.Array,
    pbs: jax.Array,
    interpret=None,
) -> jax.Array:
    """clip(pf + 0.5 (phi0 - pb), min/max over {phi0, 6 faces, pf}) for F
    stacked fields [F,T,512] — the full BFECC tail, one kernel launch plus
    one packed-plane gather. Bit-identical to advection._minmax_clamp_multi
    with precomputed face bounds."""
    if interpret is None:
        interpret = not _on_tpu()
    F, T, _ = phi0s.shape
    # packed-plane gather (shifts._plane_maps order: per direction, the 64
    # source lanes of the neighbor's touching plane, ascending dest lane)
    maps = sh._plane_maps(F)
    packed = jnp.moveaxis(phi0s, 0, 1).reshape(T, F * TILE)
    allcols = jnp.concatenate([m[2] for m in maps])
    P = jnp.take(packed, allcols, axis=1)  # [T, 6*F*64]
    nbr6 = jnp.stack(
        [topo.nbr[:, sh.d_of(off)] for off in sh.FACE_DIRS], axis=0
    )  # [6, T]
    gs = [
        jnp.take(P[:, i * F * 64:(i + 1) * F * 64], nbr6[i], axis=0)
        for i in range(6)
    ]  # 6 x [T, F*64] — each direction gathers only its own plane block
    planes = jnp.stack(gs, 0).reshape(6, T, F, 64)
    planes = jnp.moveaxis(planes, 2, 1).reshape(6 * F, T, 64)
    fn = _build(F, T, bool(interpret))
    return fn(phi0s, pfs, pbs, planes)
