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

G = 32  # preferred tiles per program. G=8 left ~2x on the table at bench
# size: per-program vector work on [8, 512] under-fills the VPU pipeline
# across 576 grid steps; [32, 512] programs measured the full 50-iteration
# lagged solve at 0.55x (probe r4/083: 4.8-5.2 ms vs 8.1-9.7, bit-exact;
# G=64 equal to G=32 within noise). The grid needs G | T, so builds fall
# back through _pick_g.


def _pick_g(T: int) -> int:
    for g in (G, 16, 8, 4, 2):
        if g <= T and T % g == 0:
            return g
    return 1

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


def _kernel_lagged(K: int, omega: float, dx2: float, G: int,
                   p_ref, div_ref, porg_ref, faces_ref, out_ref):
    # porg_ref is [G, 1] (tile-granular parity/mask) or [G, TILE]
    # (voxel-granular, multigrid coarse levels) — [G, 1] saves re-reading a
    # broadcast [T, 512] int32 array on every launch of the hot RBGS loop
    """K red+black sweep pairs per launch with the cross-tile halo gathered
    ONCE (in-tile neighbor reads stay exact via lane rolls; cross-tile face
    values lag by up to 2K-1 half-sweeps). The reference's own cross-block
    ordering is chaotic (in-place global updates, no inter-block sync —
    `/root/reference/src/Cuda/Kernel.cu:591-623`), so this matches its
    semantics class; convergence is compared by residual (SURVEY §7.4).

    ``faces_ref`` [6, G, 512]: the six pre-gathered face-neighbor rows,
    _DIRS order — ONE XLA gather feeds all six (the six separate takes were
    ~5 extra dispatches per halo block, ~42 us each)."""
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
    fixes = [
        pltpu.roll(faces_ref[di], _ROLLS[off][1] % TILE, 1)
        for di, off in enumerate(_DIRS)
    ]
    porg = jnp.broadcast_to(porg_ref[:], (G, TILE))
    parity = (porg + cx + cy + cz) & 1
    in_dom = porg < 2

    def sweep(color, p):
        nbr_sum = jnp.zeros((G, TILE), jnp.float32)
        for off, fix in zip(_DIRS, fixes):
            s_in, _ = _ROLLS[off]
            nbr_sum = nbr_sum + jnp.where(
                masks[off], fix, pltpu.roll(p, s_in % TILE, 1)
            )
        pgs = (nbr_sum - div_ref[:] * dx2) * (1.0 / 6.0)
        upd = (parity == color) & in_dom
        return jnp.where(upd, p + omega * (pgs - p), p)

    def body(_, p):
        return sweep(1, sweep(0, p))

    out_ref[:] = jax.lax.fori_loop(0, K, body, p_ref[:])


@functools.lru_cache(maxsize=None)
def _build_lagged(K: int, omega: float, dx2: float, T: int, interpret: bool,
                  porg_cols: int = TILE):
    G = _pick_g(T)
    spec = pl.BlockSpec((G, TILE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((G, porg_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec(
        (6, G, TILE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel_lagged, K, omega, dx2, G),
        grid=(T // G,),
        in_specs=[spec, spec, pspec, fspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((T, TILE), jnp.float32),
        interpret=interpret,
    )


def solve_pressure_lagged(
    topo: Topology,
    div: jax.Array,
    iterations: int,
    dx: float,
    omega: float,
    halo_lag: int,
    p0=None,
    interpret=None,
    mask=None,
) -> jax.Array:
    """``iterations`` red+black pairs in blocks of ``halo_lag`` pairs per
    halo gather. halo_lag=1 is NOT identical to solve_pressure_pallas: the
    black half-sweep already sees a stale cross-tile halo. Residual-matched
    against the textbook path in tests; iterations must divide by halo_lag."""
    if interpret is None:
        interpret = not _on_tpu()
    assert iterations % halo_lag == 0, (iterations, halo_lag)
    T = div.shape[0]
    org = topo.origins * 8
    if mask is not None:  # voxel-granular in-domain mask (MG coarse levels)
        porg = jnp.broadcast_to(
            ((org[:, 0] + org[:, 1] + org[:, 2]) & 1)[:, None], (T, TILE)
        ).astype(jnp.int32)
        porg = jnp.where(mask > 0, porg, porg + 2)
    else:  # tile-granular: one int per tile
        porg = ((org[:, 0] + org[:, 1] + org[:, 2]) & 1).astype(
            jnp.int32)[:, None]
    p = jnp.zeros_like(div) if p0 is None else p0
    if mask is not None:
        p = p * mask
    if PLANES_HALO:
        fnp = _build_lagged_planes(
            int(halo_lag), float(omega), float(dx) * float(dx), T,
            bool(interpret), porg.shape[1]
        )

        def body_p(_, p):
            return fnp(p, div, porg, _planes_of(topo, p))

        return jax.lax.fori_loop(0, iterations // halo_lag, body_p, p)
    fn = _build_lagged(
        int(halo_lag), float(omega), float(dx) * float(dx), T,
        bool(interpret), porg.shape[1]
    )
    # one fused gather for all six face directions per halo block
    nbr6 = jnp.concatenate([topo.nbr[:, d_of(off)] for off in _DIRS])

    def body(_, p):
        faces = jnp.take(p, nbr6, axis=0).reshape(6, T, TILE)
        return fn(p, div, porg, faces)

    return jax.lax.fori_loop(0, iterations // halo_lag, body, p)


# Packed-plane halos for the lagged kernel (master switch; A/B probes flip
# it, integration keeps the full-face path as the oracle). The round-3
# packed-SHELL attempt lost on in-kernel roll-ladder expansion (NOTES r3
# fact 27: ~60 un-hideable VPU rolls/launch); this version lands the planes
# with exact one-hot MXU dots instead (NOTES r4 fact 47) and packs XLA-side:
# the halo gather moves [6,T,64] instead of [6,T,512] — 8x fewer gathered
# bytes on the solve's dominant term. Validated on-chip (probe 115):
# parity vs the full-face path is 1.2e-35 max (Mosaic's HIGHEST limb-split
# drops a ~2^-116 tail; interpret mode is bitwise — tested), and the
# 50-iteration lag-5 solve's min-of-rounds slope was 1.0 ms vs 2.1 ms
# full-face in the same (congested) window.
PLANES_HALO: bool = True


def _kernel_lagged_planes(K: int, omega: float, dx2: float, G: int,
                          p_ref, div_ref, porg_ref, planes_ref, out_ref):
    """_kernel_lagged with the cross-tile halo delivered as six packed
    64-lane planes ([6, G, 64]) instead of six full neighbor rows; each
    plane is landed on its boundary lanes by an exact one-hot MXU dot
    (same construction as ops/pallas_tail.py — bit-identical placement to
    the rolled full-row fix, asserted in tests and on-chip)."""
    from hnanosolver_tpu.ops.pallas_stencil import _masks_and_expand

    masks, expand = _masks_and_expand(G)
    fixes = [
        jax.lax.dot_general(
            planes_ref[di], expand[off], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        for di, off in enumerate(_DIRS)
    ]
    porg = jnp.broadcast_to(porg_ref[:], (G, TILE))
    col = jax.lax.broadcasted_iota(jnp.int32, (G, TILE), 1)
    cx, cy, cz = col // 64, (col // 8) % 8, col % 8
    parity = (porg + cx + cy + cz) & 1
    in_dom = porg < 2

    def sweep(color, p):
        nbr_sum = jnp.zeros((G, TILE), jnp.float32)
        for off, fix in zip(_DIRS, fixes):
            s_in, _ = _ROLLS[off]
            nbr_sum = nbr_sum + jnp.where(
                masks[off], fix, pltpu.roll(p, s_in % TILE, 1)
            )
        pgs = (nbr_sum - div_ref[:] * dx2) * (1.0 / 6.0)
        upd = (parity == color) & in_dom
        return jnp.where(upd, p + omega * (pgs - p), p)

    def body(_, p):
        return sweep(1, sweep(0, p))

    out_ref[:] = jax.lax.fori_loop(0, K, body, p_ref[:])


@functools.lru_cache(maxsize=None)
def _build_lagged_planes(K: int, omega: float, dx2: float, T: int,
                         interpret: bool, porg_cols: int = TILE):
    G = _pick_g(T)
    spec = pl.BlockSpec((G, TILE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((G, porg_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    fspec = pl.BlockSpec(
        (6, G, 64), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel_lagged_planes, K, omega, dx2, G),
        grid=(T // G,),
        in_specs=[spec, spec, pspec, fspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((T, TILE), jnp.float32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _plane_cols():
    """Pure-numpy twin of shifts._plane_maps(1)'s plane columns (numpy so
    it stays a constant when first touched inside a trace)."""
    import numpy as np

    from hnanosolver_tpu.ops import shifts as sh

    cols = []
    for off in _DIRS:
        mask, _, s_fix = sh._DIRS[off]
        bl = np.nonzero(np.asarray(mask).reshape(-1))[0]
        cols.append((bl - s_fix) % TILE)
    return np.concatenate(cols)


def _planes_of(topo: Topology, p: jax.Array) -> jax.Array:
    """[6, T, 64] packed halo planes of ``p``: per direction, each tile's
    face neighbor's touching 64-lane plane — ONE lane take + ONE transpose
    + ONE row gather (vs six [T,512] face rows: 8x fewer gathered bytes)."""
    from hnanosolver_tpu.ops import shifts as sh

    T = p.shape[0]
    P = jnp.take(p, _plane_cols(), axis=1)  # [T, 6*64], direction-major
    src = jnp.swapaxes(P.reshape(T, 6, 64), 0, 1).reshape(6 * T, 64)
    idx = jnp.concatenate(
        [topo.nbr[:, d_of(off)] + i * T for i, off in enumerate(_DIRS)]
    )
    return jnp.take(src, idx, axis=0).reshape(6, T, 64)


def _kernel(color: int, omega: float, dx2: float, G: int,
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
    # porg encodes origin parity in bit 0 and out-of-domain in bit 1 (+2 for
    # masked cells — see solve_pressure_pallas): masked cells never update,
    # and stay exactly 0 because p enters pre-masked.
    parity = (porg_ref[:] + cx + cy + cz) & 1
    update = (parity == color) & (porg_ref[:] < 2)
    out_ref[:] = jnp.where(update, p + omega * (pgs - p), p)


@functools.lru_cache(maxsize=None)
def _build(color: int, omega: float, dx2: float, T: int, interpret: bool):
    G = _pick_g(T)
    spec = pl.BlockSpec((G, TILE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, color, omega, dx2, G),
        grid=(T // G,),
        in_specs=[spec] * 9,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((T, TILE), jnp.float32),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Fused whole-domain solver: ALL sweeps in ONE kernel, p resident in VMEM.
#
# Measured on v5e: in-kernel neighbor-row assembly (fori of dynamic-slice
# copies from the p buffer) is below the timing noise floor even at 6144
# rows x 8 sweeps, while each sweep of the per-sweep path costs 6 full-array
# XLA gathers + a kernel launch (~42 us/op dispatch alone). Keeping p in
# VMEM for the whole solve removes ~all HBM traffic: 2 iterations/ms-class
# instead of 0.6 ms/iteration.
# ---------------------------------------------------------------------------

# Fused is a LAUNCH-OVERHEAD win, not a bandwidth win: in-kernel row
# assembly costs ~18 ns/row-copy (measured v5e), i.e. ~0.7 ms/sweep at 6144
# rows — slower than the per-sweep gather path there. Below ~2k rows the
# ~12 dispatches/sweep (~42 us each) of the per-sweep path dominate instead,
# so whole-solve-in-one-kernel wins. Used by multigrid coarse levels.
MAX_FUSED_ROWS = 2_048


def _fused_kernel(iterations: int, omega: float, dx2: float, T: int,
                  has_mask: bool,
                  nbr_ref,  # [6, T] int32 SMEM (face neighbor rows, _DIRS
                  # order; direction-major — SMEM pads the minor dim to 512B
                  # per row, so [T,6] would blow the ~1MB SMEM budget)
                  porg_ref,  # [T, 1] int32 VMEM (origin parity; +2 if masked out)
                  div_ref, p0_ref, mask_ref, out_ref, scratch):
    col = jax.lax.broadcasted_iota(jnp.int32, (T, TILE), 1)
    cx, cy, cz = col // 64, (col // 8) % 8, col % 8
    masks = {
        (1, 0, 0): cx == 7,
        (-1, 0, 0): cx == 0,
        (0, 1, 0): cy == 7,
        (0, -1, 0): cy == 0,
        (0, 0, 1): cz == 7,
        (0, 0, -1): cz == 0,
    }
    parity = (jnp.broadcast_to(porg_ref[:], (T, TILE)) + cx + cy + cz) & 1
    in_dom = jnp.broadcast_to(porg_ref[:], (T, TILE)) < 2
    if has_mask:
        in_dom = in_dom & (mask_ref[:] > 0)
        out_ref[:] = jnp.where(in_dom, p0_ref[:], 0.0)
    else:
        out_ref[:] = p0_ref[:]

    def sweep(s, carry):
        color = s & 1
        p = out_ref[:]
        nbr_sum = jnp.zeros((T, TILE), jnp.float32)
        for di, off in enumerate(_DIRS):
            s_in, s_fix = _ROLLS[off]

            def cp(t, c):
                scratch[t] = out_ref[nbr_ref[di, t]]
                return c

            jax.lax.fori_loop(0, T, cp, 0)
            view = jnp.where(
                masks[off],
                pltpu.roll(scratch[:], s_fix % TILE, 1),
                pltpu.roll(p, s_in % TILE, 1),
            )
            nbr_sum = nbr_sum + view
        pgs = (nbr_sum - div_ref[:] * dx2) * (1.0 / 6.0)
        upd = (parity == color) & in_dom
        out_ref[:] = jnp.where(upd, p + omega * (pgs - p), p)
        return carry

    jax.lax.fori_loop(0, 2 * iterations, sweep, 0)


@functools.lru_cache(maxsize=None)
def _build_fused(iterations: int, omega: float, dx2: float, T: int,
                 has_mask: bool, interpret: bool):
    return pl.pallas_call(
        functools.partial(_fused_kernel, iterations, omega, dx2, T, has_mask),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, TILE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T, TILE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )


def solve_pressure_fused(
    topo: Topology,
    div: jax.Array,
    iterations: int,
    dx: float,
    omega: float,
    p0=None,
    interpret=None,
    mask=None,
) -> jax.Array:
    """Whole-solve-in-one-kernel variant (T <= MAX_FUSED_ROWS, no refresh)."""
    if interpret is None:
        interpret = not _on_tpu()
    T = div.shape[0]
    org = topo.origins * 8
    porg = ((org[:, 0] + org[:, 1] + org[:, 2]) & 1).astype(jnp.int32)[:, None]
    nbr6 = jnp.stack([topo.nbr[:, d_of(off)] for off in _DIRS], axis=0)
    p = jnp.zeros_like(div) if p0 is None else p0
    has_mask = mask is not None
    m = mask if has_mask else jnp.zeros((T, 1), jnp.float32)
    fn = _build_fused(
        int(iterations), float(omega), float(dx) * float(dx), T,
        has_mask, bool(interpret),
    )
    return fn(nbr6, porg, div, p, m)


def solve_pressure_pallas(
    topo: Topology,
    div: jax.Array,
    iterations: int,
    dx: float,
    omega: float,
    p0=None,
    interpret=None,
    refresh=None,
    mask=None,
) -> jax.Array:
    """Drop-in replacement for ops.pressure.solve_pressure (flat [T,512]).
    ``refresh``: ghost-exchange hook applied to p before each color sweep.
    ``mask``: in-domain voxel mask (multigrid coarse levels); cells outside
    are Dirichlet-0."""
    if interpret is None:
        interpret = not _on_tpu()
    rf = refresh or (lambda f: f)
    T = div.shape[0]
    org = topo.origins * 8
    porg = jnp.broadcast_to(
        ((org[:, 0] + org[:, 1] + org[:, 2]) & 1)[:, None], (T, TILE)
    ).astype(jnp.int32)
    dx2 = float(dx) * float(dx)
    red = _build(0, float(omega), dx2, T, bool(interpret))
    black = _build(1, float(omega), dx2, T, bool(interpret))
    # ONE row gather feeds all six face directions (six separate takes were
    # ~5 extra dispatched gathers per color sweep — the lagged path's form)
    nbr6 = jnp.concatenate([topo.nbr[:, d_of(off)] for off in _DIRS])
    p = jnp.zeros_like(div) if p0 is None else p0
    if mask is not None:
        p = p * mask
        porg = jnp.where(mask > 0, porg, porg + 2)  # bit 1 => never update

    def faces(p):
        f6 = jnp.take(p, nbr6, axis=0).reshape(6, T, TILE)
        return [f6[i] for i in range(6)]

    def body(_, p):
        p = rf(p)
        p = red(p, div, porg, *faces(p))
        p = rf(p)
        p = black(p, div, porg, *faces(p))
        return p

    return jax.lax.fori_loop(0, iterations, body, p)
