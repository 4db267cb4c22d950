"""Fused BFECC sampling megakernel (trace_order=1 path), 16- or 24-wide.

The chunked VMEM sampler (ops/pallas_interp2.py) contracts every sample
against the full 3x3x3-tile window: K = 24x24 (y,z) pairs = 576 and a
24-row x window. In parity precision the dot runs 3 true-f32 MXU passes, so
that one-hot inflation IS the advection cost (measured: strict pass ~4x the
single-bf16-pass time, i.e. MXU-bound).

This kernel fuses the whole BFECC sampling sequence of one advection into a
single launch, in one of two window widths:

  WIN=24 (valid for ALL flows): the classic 3x3x3-tile window. Fusion alone
    saves one window assembly, one chunk-table DMA sweep, the [T,nf,512]
    HBM round-trips between passes, and 1-3 launches.
  WIN=16 (valid while the step CFL number sdt*max|u| < CFL_LIMIT): a
    2x2x2-tile window at f-space [-4,12)^3, assembled with +-4 sublane/lane
    rolls + half-selects — K drops 576->256 and the x window 24->16,
    ~3.4x fewer MXU MACs on top of the fusion.

Per group of 8 tiles (one grid step):
  1. copy the 27 neighbor rows from the chunk's unique-row table (VMEM)
  2. [WIN=16] combine them into the eight 16^3-window rows (wrap garbage
     from the rolls lands on unselected lanes)
  3. backtrace pass: hat weights at the back positions, ONE MXU dot
     (M = nx*nf*8, K = nyz*64, N = 512) for all fields [+ an SDF probe dot
     and position rejection first, when colliding]
  4. forward re-trace d2 = clamp(d + u(back)*sdt) computed in-register
     (same +-DISP_LIMIT clamp as the multi-pass path, which also bounds
     WIN=24 positions for arbitrarily fast flows)
  5. forward pass: weights at d2, dot for the advected fields [+ SDF probe]
  6. write phiF and phiB

The caller picks the width with a runtime `lax.cond` on the CFL number
(ops/advection.py), so the switch is purely a performance decision: both
widths produce identical samples to f32 rounding in the narrow regime.

Reference hot loop being replaced: the fused MacCormack kernel
`/root/reference/src/Cuda/Kernel.cu:118-266` (scalars) and
`advect_vector` (`Kernel.cu:354-453`).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hnanosolver_tpu.core.layout import TILE

# Tiles per program (per grid step), narrow-window scalar pass. 32
# measured 1.86x faster than 8 on the whole bench step (probe r3/043,
# interleaved same-window: 38.1 vs 70.8 ms; bit-identical outputs):
# fewer grid steps amortize the per-step fixed costs (pipeline fill,
# assembly loop, weight build issue latency) over 4x the tiles. 16 was
# NOT monotonic (slower than 8 in one window) — the win appears at 32.
# At G=32 the scalars pass runs in field batches (the VMEM governor
# splits it; bit-exact), which is part of the measured-fast config.
GROUP = 32
# The velocity pass (f_lo == 0, nf=3) starts at the same G as scalars:
# G=32 fits the bench-class VMEM budget, measured 1.1-1.9x faster than 16
# (bit-identical, probe r4/012); topologies whose chunk-unique row count
# pushes the request over SAFE_VMEM (e.g. 1024^3 at U=1920) fall down the
# group ladder in bfecc_sample_fused. Override for A/B probes only.
GROUP_VEL = 32
# The wide 24-window branch compiles into the SAME lax.cond as the
# narrow one (both branches must fit even when only narrow runs), and
# its W operand is (24/16)^4 = 5x the narrow stack per tile — G=32
# blew the scoped limit by 29 MB at bench size (server log r3/048).
# Keep the round-2 group here; the wide branch is the slow-flow escape
# hatch, not the hot path.
GROUP_WIDE = 8


def _group_cap(f_lo: int, win: int) -> int:
    """Tiles-per-program cap for a (pass, window) pair — the G knob is
    pure perf/VMEM (outputs are bit-identical across G)."""
    if win == 24:
        return GROUP_WIDE
    return GROUP_VEL if f_lo == 0 else GROUP
# narrow path is valid when sdt*max|u| stays under this (|d2| <= 2*CFL < 4);
# 1.9 leaves 0.1 voxel of slack under the hard 2.0 bound
CFL_LIMIT = 1.9
# the MIXED branch (back pass narrow, forward pass wide) is valid while the
# BACK positions alone fit the 16-window: |d| <= CFL < 4, with 0.1 slack.
# The bench plume ramps through this regime (CFL 1.9 -> ~3.1, probe r4/076)
# where the full-wide kernel costs 3.3x narrow (probe r4/077).
CFL_MID = 3.9
# max |displacement| per axis (same constant as ops/advection.DISP_LIMIT;
# also what makes WIN=24 valid for all flows: positions stay in [1, 23))
DISP_LIMIT = 7.0 - 1e-3


def _on_tpu() -> bool:
    try:
        d = jax.devices()[0]
        return d.platform == "tpu" or "TPU" in str(d)
    except Exception:  # pragma: no cover
        return False


def _hat_at(local, a):
    return jnp.maximum(0.0, 1.0 - jnp.abs(local - a))


def _split(x):
    """f32 -> (bf16 hi, bf16 lo), x ~= hi + lo (manual bf16x3 operands)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _assemble_stbl(G: int, nf: int, lnbr_ref, tbl_ref, stbl):
    """Copy this group's neighbor rows from the chunk table into scratch.
    27-table form: stbl [G, 27*nf, 8, 64], dx-major row d*nf+f with
    d = (dx+1)*9+(dy+1)*3+(dz+1). Dual form (lnbr_ref [G, 8]): stbl
    [G, 8*nf, 8, 64], window-major row W*nf+f, W = Xw*4+Yw*2+Zw — the
    half-shifted S rows ARE the 16^3-window rows (see chunk_dsrc in
    core/topology.py), so no in-kernel combine follows."""
    nn = lnbr_ref.shape[1]

    def asm(i, carry):
        g = i // nn
        d = i % nn
        row = tbl_ref[0, pl.ds(lnbr_ref[g, d] * nf, nf)]
        if row.shape[-1] == 128:  # HBM-DMA form: lanes padded for the copy
            row = row[..., :64]
        stbl[g, pl.ds(d * nf, nf)] = row
        return carry

    jax.lax.fori_loop(0, G * nn, asm, 0)


def _combine_window16(nf: int, stbl, wtbl):
    """Fill wtbl [G, 8*nf, 8, 64] with the 2x2x2-tile 16^3-window rows.

    Window row W = Xw*4 + Yw*2 + Zw covers f-space tiles (Xw-1..Xw, ...)
    combined at the fixed -4 shift per axis: per axis two +-4 rolls (mod the
    axis size, pltpu.roll wants shifts >= 0: -4 over 8 sublanes == +4, -32
    over 64 lanes == +32, -4 over 64 lanes == +60) and a half-select; the
    wrap garbage lands on unselected lanes."""
    xm = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8, 1), 2) < 4
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 64), 3)
    ym = lane < 32  # y_local = lane // 8 < 4
    zm = lane % 8 < 4

    for Xw in (0, 1):
        # stbl 27-dim is dx-major: rows with dx = Xw-1 at [Xw*9, Xw*9+9)
        lo = stbl[:, Xw * 9 * nf : (Xw * 9 + 9) * nf]
        hi = stbl[:, (Xw + 1) * 9 * nf : ((Xw + 1) * 9 + 9) * nf]
        xp = jnp.where(
            xm,
            pltpu.roll(lo, 4, axis=2),
            pltpu.roll(hi, 4, axis=2),
        )  # [G, 9*nf, 8, 64]
        for Yw in (0, 1):
            ylo = xp[:, Yw * 3 * nf : (Yw * 3 + 3) * nf]
            yhi = xp[:, (Yw + 1) * 3 * nf : ((Yw + 1) * 3 + 3) * nf]
            yp = jnp.where(
                ym,
                pltpu.roll(ylo, 32, axis=3),
                pltpu.roll(yhi, 32, axis=3),
            )  # [G, 3*nf, 8, 64]
            for Zw in (0, 1):
                zlo = yp[:, Zw * nf : (Zw + 1) * nf]
                zhi = yp[:, (Zw + 1) * nf : (Zw + 2) * nf]
                win = jnp.where(
                    zm,
                    pltpu.roll(zlo, 60, axis=3),
                    pltpu.roll(zhi, 4, axis=3),
                )  # [G, nf, 8, 64]
                W = Xw * 4 + Yw * 2 + Zw
                wtbl[:, W * nf : (W + 1) * nf] = win


def _weights(G: int, win: int, dx, dy, dz, dtype=jnp.float32):
    """Hat-weight operands at window positions (window width ``win``, f-space
    offset (win-8)/2). Returns (wxT [G,win,512] f32, W [G,(win//8)^2*64,512]
    in ``dtype``) with K order = (Yw,Zw) block major, (y_l*8+z_l) minor.
    ``dtype=bfloat16`` (fast tier) casts the 1-D hats BEFORE the
    repeat/tile expansion, halving the dominant W-construction traffic."""
    nb = win // 8
    off = float((win - 8) // 2)
    col = jax.lax.broadcasted_iota(jnp.int32, (G, TILE), 1)
    cx = (col // 64).astype(jnp.float32)
    cy = ((col // 8) % 8).astype(jnp.float32)
    cz = (col % 8).astype(jnp.float32)
    lx = (cx + off + dx)[:, None, :]  # window coords [0, win)
    ly = (cy + off + dy)[:, None, :]
    lz = (cz + off + dz)[:, None, :]
    aw = jax.lax.broadcasted_iota(jnp.int32, (1, win, 1), 1).astype(jnp.float32)
    wxT = _hat_at(lx, aw)  # [G, win, 512]
    hy = _hat_at(ly, aw).astype(dtype)
    hz = _hat_at(lz, aw).astype(dtype)
    hyrep = [jnp.repeat(hy[:, 8 * d : 8 * d + 8, :], 8, axis=1) for d in range(nb)]
    hztil = [pltpu.repeat(hz[:, 8 * d : 8 * d + 8, :], 8, axis=1) for d in range(nb)]
    W = jnp.concatenate(
        [hyrep[b // nb] * hztil[b % nb] for b in range(nb * nb)], axis=1
    )  # [G, nb*nb*64, 512]
    return wxT, W


def _build_operand(G, win, f_lo, f_hi, rows):
    """The dot's stationary operand for fields [f_lo, f_hi): depends only on
    the window rows, NOT on sample positions — both BFECC passes (and both
    SDF probes) with the same span share one build."""
    nb = win // 8
    nfo = f_hi - f_lo
    return jnp.concatenate(
        [
            jnp.concatenate(
                [rows(Xw, b).reshape(G, nfo * 8, 64) for Xw in range(nb)],
                axis=1,
            )  # [G, nb*nfo*8, 64]
            for b in range(nb * nb)
        ],
        axis=2,
    )  # [G, nb*nfo*8, nb*nb*64]


def _sample_span(G, nf, win, f_lo, f_hi, B, wxT, W, prec):
    """One MXU pass over fields [f_lo, f_hi): returns list of [G,512].
    ``B`` from _build_operand (same span)."""
    nb = win // 8
    nfo = f_hi - f_lo

    def dot(a, b, precision=None):
        return jax.lax.dot_general(
            a,
            b,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    if prec == "fast":
        t1 = dot(B.astype(jnp.bfloat16), W.astype(jnp.bfloat16))
    elif prec == "balanced":
        b_hi, b_lo = _split(B)
        w_hi, w_lo = _split(W)
        t1 = dot(b_hi, w_hi) + dot(b_hi, w_lo) + dot(b_lo, w_hi)
    else:
        t1 = dot(B, W, jax.lax.Precision.HIGHEST)
    outs = []
    for j in range(nfo):
        acc = None
        for Xw in range(nb):
            m0 = (Xw * nfo + j) * 8
            part = jnp.sum(
                wxT[:, Xw * 8 : Xw * 8 + 8, :] * t1[:, m0 : m0 + 8, :], axis=1
            )
            acc = part if acc is None else acc + part
        outs.append(acc)
    return outs


def _face_minmax(G, nf_all, f_lo, nf_out, stbl, out2_ref):
    """Per-voxel (min, max) over {self, 6 face neighbors} of each advected
    field's PRE-advection values — the BFECC limiter bounds
    (`/root/reference/src/Cuda/Kernel.cu:249-261`) — read straight from the
    27-row scratch table (already in VMEM: the face rows cost no extra HBM
    traffic, and the VPU work hides under the sampling dots). Packed into
    ``out2_ref [G, nf_out, 8, 128]``: lanes 0:64 = min, 64:128 = max, in
    the table's (x-sublane, y*8+z-lane) layout — 128 lanes keeps the HBM
    array padding-free (a [.., 8, 64] output would pad 2x).

    Face access in the [8, 64] layout mirrors the pressure kernel's
    512-lane rolls: in-tile values by a (sublane|lane) roll of the center
    row, boundary planes by a fixed roll of the face-neighbor row. Absent
    neighbors are the null row (zeros) — the background-0 clamp semantics
    of the XLA path (ops/shifts.py)."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (G, 1, 8, 1), 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (G, 1, 1, 64), 3)
    ly, lz = lane // 8, lane % 8
    # (face d in the dx-major 27-table, roll axis, in-tile shift,
    #  neighbor-row fix shift, boundary mask)
    specs = (
        (22, 2, 7, 7, sub == 7),   # +x
        (4, 2, 1, 1, sub == 0),    # -x
        (16, 3, 56, 56, ly == 7),  # +y
        (10, 3, 8, 8, ly == 0),    # -y
        (14, 3, 63, 7, lz == 7),   # +z
        (12, 3, 1, 57, lz == 0),   # -z
    )
    for j in range(nf_out):
        f = f_lo + j
        c = stbl[:, 13 * nf_all + f : 13 * nf_all + f + 1]  # center row
        vmin = c
        vmax = c
        for d, ax, s_in, s_fix, m in specs:
            nrow = stbl[:, d * nf_all + f : d * nf_all + f + 1]
            view = jnp.where(
                m, pltpu.roll(nrow, s_fix, axis=ax), pltpu.roll(c, s_in, axis=ax)
            )
            vmin = jnp.minimum(vmin, view)
            vmax = jnp.maximum(vmax, view)
        out2_ref[:, j] = jnp.concatenate([vmin, vmax], axis=3)[:, 0]


def _make_kernel(nf_all, nb, f_lo, has_sdf, G, sdt, prec, win, minmax=False,
                 hbm=False, dual=False, mode="both"):
    """``mode``: "both" = the fused BFECC pair (back sample, in-register
    re-trace, forward sample). "back" = back sample only (out =
    fields[f_lo:] at the given positions); "fwd" = the positions ARE the
    final (re-traced, caller-clipped) positions, one sampling pass. The
    split modes serve the MIXED window branch (1.9 <= CFL < 3.9): back
    positions still fit the 16-window (K=256, dual table) while only the
    re-trace needs the 24-window — see advection._advect_vmem."""
    nf_out = nb - f_lo
    narrow = win == 16
    assert not (dual and minmax), "dual table carries no face rows"
    assert not dual or narrow, "dual plan covers the 16-window only"
    assert mode == "both" or (not has_sdf and not minmax), mode
    # NOTE: a full-bf16 data path (table/scratch/weights) was tried for the
    # fast tier and REVERTED: Mosaic's tpu.dynamic_rotate only supports
    # 32-bit element types, so the 16-window combine's rolls reject bf16 on
    # real hardware (interpret mode accepts it — a Mosaic-vs-interpret trap).
    # The fast tier therefore keeps f32 data and casts the dot operands.
    wdt = jnp.float32
    pprec = "strict"

    def kernel(lnbr_ref, dx_ref, dy_ref, dz_ref, tbl_ref, out_ref, *rest):
        if minmax:
            out2_ref, *scratch = rest
        else:
            scratch = rest
        stbl = scratch[0]
        if hbm:
            # Chunk table lives in HBM (memory_space=ANY); one DMA per chunk
            # brings its U*nf rows into a SINGLE-buffered VMEM scratch that
            # persists across the chunk's gpc grid steps. Vs the block-spec
            # form (whole table block double-buffered by the pipeline) this
            # halves the dominant VMEM term — the bench-size kernel hit the
            # ~102 MB scoped-vmem ceiling once the in-kernel limiter buffers
            # landed, and at 1024^3 it lets all fields advect in one pass.
            ctbl, sem = scratch[-2], scratch[-1]
            c = pl.program_id(0)

            @pl.when(pl.program_id(1) == 0)
            def _load_chunk():
                cp = pltpu.make_async_copy(tbl_ref.at[c], ctbl.at[0], sem)
                cp.start()
                cp.wait()

            _assemble_stbl(G, nf_all, lnbr_ref, ctbl, stbl)
        else:
            _assemble_stbl(G, nf_all, lnbr_ref, tbl_ref, stbl)
        if dual:
            # stbl rows ARE the window rows (half-shifted S, window-major):
            # no combine ladder, no separate wtbl scratch.
            def rows_of(flo, fhi):
                def rows(Xw, b):
                    W = Xw * 4 + b
                    return stbl[:, W * nf_all + flo : W * nf_all + fhi]

                return rows
        elif narrow:
            wtbl = scratch[1]
            _combine_window16(nf_all, stbl, wtbl)

            def rows_of(flo, fhi):
                def rows(Xw, b):
                    W = Xw * 4 + b
                    return wtbl[:, W * nf_all + flo : W * nf_all + fhi]

                return rows
        else:

            def rows_of(flo, fhi):
                def rows(Xw, b):
                    d = Xw * 9 + b
                    return stbl[:, d * nf_all + flo : d * nf_all + fhi]

                return rows

        bcache = {}

        def sample(flo, fhi, wxT, W, p):
            if (flo, fhi) not in bcache:
                bcache[(flo, fhi)] = _build_operand(
                    G, win, flo, fhi, rows_of(flo, fhi)
                )
            return _sample_span(
                G, nf_all, win, flo, fhi, bcache[(flo, fhi)], wxT, W, p
            )

        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        if has_sdf:
            # probe the SDF (last table field) at the raw back position;
            # traces entering the solid stay home (Kernel.cu:141-155)
            wxT, W = _weights(G, win, dx, dy, dz, wdt)
            d = sample(nf_all - 1, nf_all, wxT, W, pprec)[0]
            hit = d < 0.0
            dx = jnp.where(hit, 0.0, dx)
            dy = jnp.where(hit, 0.0, dy)
            dz = jnp.where(hit, 0.0, dz)

        if mode == "fwd":
            wxT, W = _weights(G, win, dx, dy, dz, wdt)
            phib = sample(f_lo, nb, wxT, W, prec)
            for j in range(nf_out):
                out_ref[:, j, :] = phib[j]
            return

        wxT, W = _weights(G, win, dx, dy, dz, wdt)
        back = sample(0, nb, wxT, W, prec)
        if mode == "back":
            for j in range(nf_out):
                out_ref[:, j, :] = back[f_lo + j]
            return
        # forward re-trace from the back position (BFECC error estimate);
        # the clamp matches the multi-pass path and keeps WIN=24 positions
        # in-window for arbitrarily fast flows (narrow mode never hits it)
        d2x = jnp.clip(dx + back[0] * sdt, -DISP_LIMIT, DISP_LIMIT)
        d2y = jnp.clip(dy + back[1] * sdt, -DISP_LIMIT, DISP_LIMIT)
        d2z = jnp.clip(dz + back[2] * sdt, -DISP_LIMIT, DISP_LIMIT)
        if has_sdf:
            wxT2, W2 = _weights(G, win, d2x, d2y, d2z, wdt)
            d2 = sample(nf_all - 1, nf_all, wxT2, W2, pprec)[0]
            hit2 = d2 < 0.0
            d2x = jnp.where(hit2, dx, d2x)
            d2y = jnp.where(hit2, dy, d2y)
            d2z = jnp.where(hit2, dz, d2z)
        wxT2, W2 = _weights(G, win, d2x, d2y, d2z, wdt)
        phib = sample(f_lo, nb, wxT2, W2, prec)

        for j in range(nf_out):
            out_ref[:, j, :] = back[f_lo + j]
        for j in range(nf_out):
            out_ref[:, nf_out + j, :] = phib[j]
        if minmax:
            _face_minmax(G, nf_all, f_lo, nf_out, stbl, out2_ref)

    return kernel


def _vmem_need(U: int, nf_all: int, G: int, win: int,
               hbm: bool = False, dual: bool = False) -> int:
    """Accurate VMEM requirement for one megakernel invocation: the chunk
    table (double-buffered block form, or single-buffered DMA scratch when
    ``hbm``; lanes 64 -> padded 128), the stbl (+win16 wtbl) scratch,
    double-buffered dx/dy/dz/out G-blocks, and a small fixed slack. Asking
    for more than needed is harmful: at 1024^3 (U=1920, nf=6) the old
    +32 MB cushion pushed the request to the 120 MB clamp and the whole
    step program over the 128 MB chip budget. ``dual``: the table holds Ud
    half-shifted S rows and the scratch 8 window rows per tile (no 27-row
    stbl, no combine wtbl)."""
    tbl = (1 if hbm else 2) * U * nf_all * 8 * 128 * 4
    if dual:
        scratch = 8 * G * nf_all * 8 * 128 * 4
    else:
        scratch = 27 * G * nf_all * 8 * 128 * 4
        if win == 16:
            scratch += 8 * G * nf_all * 8 * 128 * 4
    io = 2 * (3 + 2 * nf_all) * G * TILE * 4
    io += 2 * nf_all * G * 8 * 128 * 4  # minmax output (upper bound)
    # 10 MB covers Mosaic's own stack/semaphore overhead: measured 1.0 MB
    # above the sum of declared buffers at U=1920 (1024^3 velocity pass)
    return tbl + scratch + io + 10 * 1024 * 1024


# VMEM budget one megakernel invocation may claim. The enforced scoped-vmem
# ceiling on v5e measured ~101.8 MB (the chip's 128 MB less the runtime's
# reserve), and XLA schedules its own ops alongside inside the same jitted
# step (observed ~12 MB at 1024^3). Above this, scalars are advected in
# field BATCHES (velocity repeated per batch for the in-kernel re-trace) —
# with the HBM-table DMA form this triggers only at extreme U*nf.
SAFE_VMEM = 96 * 1024 * 1024


def _stack_need(G: int, win: int, nf_out: int, prec: str) -> int:
    """Scoped-stack bytes Mosaic must schedule ABOVE the declared buffers:
    the weight operand W [G, (win//8)^2*64, 512] f32 (+ bf16 limb copies in
    the balanced/fast tiers), the per-span dot output t1, the bcache'd
    stationary operands (field span + SDF span), wxT for both passes, and
    ~half a W of hat/repeat intermediates. Validated against the compiler:
    the scalar pass at G=32/win=24/nf_out=5/balanced modeled 112.6M vs the
    112-116M Mosaic reported when it blew a flat need+16M request (server
    log r3/046-048); with the stack modeled, requests are right-sized —
    over-asking crowds the whole step out of the 128M chip budget, under-
    asking kills the kernel compile."""
    nb = win // 8
    k = nb * nb * 64
    Wb = G * k * TILE * 4
    t1 = G * nb * nf_out * 8 * TILE * 4
    B = 2 * G * nb * nf_out * 8 * k * 4
    wxT = 2 * G * win * TILE * 4
    limbs = Wb if prec == "balanced" else (Wb // 2 if prec == "fast" else 0)
    return Wb + limbs + t1 + B + wxT + Wb // 2


def _max_fields_for_vmem(U: int, G: int, win: int, nf_min: int,
                         hbm: bool, prec: str, dual: bool = False) -> int:
    nf = nf_min
    while (_vmem_need(U, nf + 1, G, win, hbm, dual)
           + _stack_need(G, win, nf + 1 - nf_min, prec)) <= SAFE_VMEM:
        nf += 1
    return nf


@functools.lru_cache(maxsize=None)
def _build(nc, U, C, T, nf_all, nb, f_lo, has_sdf, sdt, interpret, prec, win,
           minmax=False, hbm=False, group=None, dual=False, mode="both"):
    G = min(group or _group_cap(f_lo, win), C)
    gpc = C // G
    nf_out = nb - f_lo
    nout = 2 * nf_out if mode == "both" else nf_out
    nn = 8 if dual else 27
    # The compiler carves its scoped stack (kernel register temps: W/B
    # operands, t1, bcache spans — see _stack_need) out of
    # vmem_limit_bytes AFTER the declared buffers; request less and the
    # stack allocation trips the scoped limit, request more and the whole
    # step program can exceed the 128 MB chip budget.
    vmem = min(120 * 1024 * 1024,
               _vmem_need(U, nf_all, G, win, hbm, dual)
               + _stack_need(G, win, nf_out, prec) + 6 * 1024 * 1024)
    scratch = [pltpu.VMEM((G, nn * nf_all, 8, 64), jnp.float32)]
    if win == 16 and not dual:
        scratch.append(pltpu.VMEM((G, 8 * nf_all, 8, 64), jnp.float32))
    if hbm:
        # DMA slices must be 128-lane aligned: the HBM table (and its VMEM
        # scratch) carry a 64-lane pad the assembly reads slice back off.
        scratch += [pltpu.VMEM((1, U * nf_all, 8, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA]
        tbl_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    else:
        tbl_spec = pl.BlockSpec((1, U * nf_all, 8, 64),
                                lambda c, g: (c, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    out_specs = pl.BlockSpec(
        (G, nout, TILE), lambda c, g: (c * gpc + g, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((T, nout, TILE), jnp.float32)
    if minmax:
        out_specs = [out_specs, pl.BlockSpec(
            (G, nf_out, 8, 128), lambda c, g: (c * gpc + g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((T, nf_out, 8, 128), jnp.float32)]
    return pl.pallas_call(
        _make_kernel(nf_all, nb, f_lo, has_sdf, G, sdt, prec, win, minmax,
                     hbm, dual, mode),
        grid=(nc, gpc),
        in_specs=[
            pl.BlockSpec((G, nn), lambda c, g: (c * gpc + g, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((G, TILE), lambda c, g: (c * gpc + g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, TILE), lambda c, g: (c * gpc + g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, TILE), lambda c, g: (c * gpc + g, 0),
                         memory_space=pltpu.VMEM),
            tbl_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        interpret=interpret,
    )


def build_table(topo, fields: Sequence[jax.Array], dtype=jnp.float32) -> jax.Array:
    """Per-chunk unique neighborhood rows of ALL ``fields`` in the
    megakernel layout [nc, U*nf, 8, 64] (row u*nf+f = field f of unique
    row u). Unlike pallas_interp2.build_tables there is no MAX_NF split —
    the fused kernel needs every field in one table.

    Fields are packed [T, nf*512] BEFORE the gather so each unique row is
    ONE take row (gather cost on TPU is per-row-descriptor-bound: packing
    cuts the descriptor count nf-fold for the same bytes)."""
    nf = len(fields)
    packed = jnp.stack(list(fields), axis=1).reshape(
        topo.capacity, nf * 512
    ).astype(dtype)
    nc, U = topo.chunk_uniq.shape
    tbl = jnp.take(packed, topo.chunk_uniq.reshape(-1), axis=0)
    return tbl.reshape(nc, U * nf, 8, 64)


def _dual_lane_maps():
    """(octant masks [8][512] bool in SOURCE lane space, PERM [512]) for the
    half-shift combine: dest lane l of S takes source lane l ^ (4,4,4)
    (= col ^ 292 in the x*64+y*8+z packing) of source j(l); in source space
    octant j = (bx,by,bz) owns lanes with (x'<4)==bx per axis."""
    import numpy as _np

    lane = _np.arange(512)
    lx, ly, lz = lane // 64, (lane // 8) % 8, lane % 8
    masks = []
    for j in range(8):
        bx, by, bz = (j >> 2) & 1, (j >> 1) & 1, j & 1
        masks.append(((lx < 4) == bx) & ((ly < 4) == by) & ((lz < 4) == bz))
    return masks, lane ^ 292


@functools.lru_cache(maxsize=None)
def _oct_maps(nf: int):
    """Static lane maps for the OCTANT-PACKED dual build (row gathers are
    bytes-bound at ~190 GB/s effective — NOTES fact 29 — and octant j uses
    only 64 of a gathered row's 512 lanes, so gather 64-lane packed
    octants instead: 8x fewer bytes, measured 3.1 vs 6.4 ms at bench size,
    probe r4/065). Returns (oct_cols [8][nf*64] — packed-field columns of
    each octant, field-major; reasm [nf*512] — reassembly permutation over
    the gathered concat [rows_0 | ... | rows_7])."""
    import numpy as _np

    masks, perm = _dual_lane_maps()
    oct_lanes = [_np.nonzero(m)[0] for m in masks]
    pos_in_oct = _np.zeros(512, _np.int64)
    oct_of = _np.zeros(512, _np.int64)
    for j in range(8):
        pos_in_oct[oct_lanes[j]] = _np.arange(64)
        oct_of[oct_lanes[j]] = j
    f_idx = _np.arange(nf)
    # cache NUMPY int32 only: a cached jnp array created inside one trace
    # (int64 -> canonical int32 conversion is a traced op) leaks tracers
    # into later traces
    oct_cols = [
        ((f_idx[:, None] * 512 + oct_lanes[j][None])
         .reshape(-1).astype(_np.int32))
        for j in range(8)
    ]
    src = perm  # dest lane l reads source lane perm[l]
    reasm = (oct_of[src][None] * (nf * 64)
             + f_idx[:, None] * 64 + pos_in_oct[src][None]).reshape(-1)
    return oct_cols, reasm.astype(_np.int32)


def build_table_dual(topo, fields: Sequence[jax.Array],
                     dsrc: Optional[jax.Array] = None) -> jax.Array:
    """Per-chunk unique HALF-SHIFTED rows S[d][l] = f[d*8 + l - 4] of all
    ``fields`` in the megakernel layout [nc, Ud*nf, 8, 64] (row u*nf+f).
    Each S row takes one OCTANT from each of its 8 source rows, so the
    build gathers octant-PACKED 64-lane slices (8x fewer gathered bytes
    than full rows — probe r4/065: 3.1 vs 6.4 ms at bench size) and
    reassembles with one static lane permutation. This is the entire
    16^3-window combine (formerly ~5-6 ms of in-kernel roll ladders per
    scalar pass) as byte-minimal XLA. Gathers are barrier-chained above a
    transient budget so at-scale slices never hold all eight row
    transients at once (NOTES r3 fact 24)."""
    nf = len(fields)
    packed = jnp.stack(list(fields), axis=1).reshape(
        topo.capacity, nf * 512
    )
    if dsrc is None:
        dsrc = topo.chunk_dsrc
    nc, Ud, _ = dsrc.shape
    oct_cols, reasm = _oct_maps(nf)
    reasm = jnp.asarray(reasm)
    # the 8 octants are disjoint and cover all lanes: ONE permutation take
    # packs them all (vs 8 full passes over packed for per-octant takes)
    import numpy as _np

    P_all = jnp.take(packed, jnp.asarray(_np.concatenate(oct_cols)), axis=1)
    chain = nc * Ud * nf * 64 * 4 * 8 > 256 * 1024 * 1024
    parts = []
    for j in range(8):
        Pj = P_all[:, j * nf * 64:(j + 1) * nf * 64]  # [T, nf*64]
        rows = jnp.take(Pj, dsrc[:, :, j].reshape(-1), axis=0)
        if chain:
            # gather j+1 reads P_all, which now depends on gather j's
            # result (identity values, bit-exact) — bounds the transients
            P_all, rows = jax.lax.optimization_barrier((P_all, rows))
        parts.append(rows)
    cat = jnp.concatenate(parts, axis=1)  # [R, 8*nf*64]
    S = jnp.take(cat, reasm, axis=1)  # [R, nf*512]
    return S.reshape(nc, Ud * nf, 8, 64)


def _combine_dual_kernel(nf: int, GU: int):
    """27-table -> dual-table combine, GU dual rows per grid step.

    Each half-shifted S row S[l] = f[q*8 + l - 4] takes one octant from
    each of its 8 source tiles (all of which sit in the chunk's 27-table
    unique set — chunk_dloc). Assembly mirrors the megakernel's proven
    pattern (dynamic VMEM read -> scratch store); the octant placement is
    the same per-axis roll+select ladder as _combine_window16, but run
    ONCE per unique dual row instead of per tile-window (the in-kernel
    ladder's ~4x redundancy was what made the 27-mode megakernel slow —
    NOTES r3 fact 44 lineage). Shifts: dest coord = src coord ^ 4 per
    axis, so every stage rolls by +4 in that axis's own coordinate
    (sublane 4 for x, lane 32 for y, lane +-4 within the z-octet)."""

    def kernel(dloc_ref, tbl_ref, out_ref, tmp):
        def asm(i, c):
            g = i // 8
            j = i % 8
            tmp[g, pl.ds(j * nf, nf)] = tbl_ref[
                0, pl.ds(dloc_ref[g, j] * nf, nf)]
            return c

        jax.lax.fori_loop(0, GU * 8, asm, 0)

        xm = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8, 1), 2) < 4
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 64), 3)
        ym = lane < 32  # dest y_local < 4
        zm = lane % 8 < 4  # dest z_local < 4

        def J(j):
            return tmp[:, j * nf:(j + 1) * nf]

        # dest half b per axis selects the source with that axis bit
        # (j = bx*4 + by*2 + bz); source coord = dest ^ 4 in every axis.
        yp = []
        for bz in (0, 1):
            xp0 = jnp.where(xm, pltpu.roll(J(0 * 4 + 0 * 2 + bz), 4, axis=2),
                            pltpu.roll(J(1 * 4 + 0 * 2 + bz), 4, axis=2))
            xp1 = jnp.where(xm, pltpu.roll(J(0 * 4 + 1 * 2 + bz), 4, axis=2),
                            pltpu.roll(J(1 * 4 + 1 * 2 + bz), 4, axis=2))
            yp.append(jnp.where(ym, pltpu.roll(xp0, 32, axis=3),
                                pltpu.roll(xp1, 32, axis=3)))
        S = jnp.where(zm, pltpu.roll(yp[0], 60, axis=3),
                      pltpu.roll(yp[1], 4, axis=3))
        out_ref[0] = S.reshape(GU * nf, 8, 64)

    return kernel


def build_table_dual_combine(topo, tbl27: jax.Array, nf: int,
                             interpret=None, gu: int = 8) -> jax.Array:
    """Dual (half-shifted) table [nc, Ud*nf, 8, 64] derived ON-CHIP from
    the 27-table ``tbl27`` (build_table output) via chunk_dloc. Bit-exact
    vs build_table_dual — same source rows, same lane moves — but replaces
    the XLA octant-packed build's three HBM passes (packed permute, 8 row
    gathers, reassembly permute; ~3.1 ms at bench size, NOTES fact 33)
    with one VMEM roll ladder over rows the kernel already has."""
    if interpret is None:
        interpret = not _on_tpu()
    nc, Ud, _ = topo.chunk_dsrc.shape
    Unf = tbl27.shape[1]
    assert Ud % gu == 0, (Ud, gu)
    NU = Ud // gu
    dloc = topo.chunk_dloc.reshape(nc * Ud, 8)
    vmem = min(120 * 1024 * 1024, _combine_vmem_need(Unf // nf, nf, gu))
    return pl.pallas_call(
        _combine_dual_kernel(nf, gu),
        grid=(nc, NU),
        in_specs=[
            pl.BlockSpec((gu, 8), lambda c, u: (c * NU + u, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Unf, 8, 64), lambda c, u: (c, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, gu * nf, 8, 64),
                               lambda c, u: (c, u, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nc, Ud * nf, 8, 64), tbl27.dtype),
        scratch_shapes=[pltpu.VMEM((gu, 8 * nf, 8, 64), tbl27.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        interpret=interpret,
    )(dloc, tbl27)


# On-chip combine (27-table -> dual table in VMEM): True = whenever the
# topology carries chunk_dloc and the chunk table fits VMEM, False = never
# (XLA octant-packed build), None = auto (= False: the kernel is BITWISE
# exact on-chip but measured 6.4 ms vs the XLA build's 3.2 at bench size,
# probe r4/125 — its 75k per-row dynamic VMEM reads cost ~70 ns each,
# the same descriptor-overhead floor the HBM gather pays, and it adds a
# whole extra table pass on top. Kept for probes and as the documented
# negative result; NOTES r4 fact 50).
COMBINE_TBL: Optional[bool] = None


COMBINE_GU = 8  # dual rows per combine-kernel grid step (gu default)


def _combine_vmem_need(U27: int, nf: int, gu: int = COMBINE_GU) -> int:
    """Scoped-VMEM bytes the combine kernel requests: the whole-chunk
    27-table block accounted at ~4x (the compiler stacks the revisited
    block at ~2x its double-buffered size — 86.5 MB demanded for a 22 MB
    block, probe r4/122) + the [gu, 8*nf, 8, 64] scratch, + 8 MB headroom
    for the out block. ONE formula shared by build_table_dual_combine's
    compiler request and combine_ok's fit check (r4 ADVICE: two separate
    formulas had drifted — combine_ok assumed gu=32)."""
    return (4 * U27 * nf + 8 * gu * 8 * nf) * 8 * 64 * 4 + 8 * 1024 * 1024


def combine_ok(topo, nf: int) -> bool:
    """True when the on-chip dual-table combine is enabled and fits: the
    topology carries chunk_dloc and the kernel's scoped-VMEM request
    (same _combine_vmem_need formula it will actually submit) stays under
    the budget."""
    use = COMBINE_TBL
    if use is None:
        use = False
    if not use or getattr(topo, "chunk_dloc", None) is None:
        return False
    U27 = topo.chunk_uniq.shape[1]
    return _combine_vmem_need(U27, nf) <= min(SAFE_VMEM, 120 * 1024 * 1024)


# Chunk-table residency: True = HBM table + in-kernel per-chunk DMA,
# False = VMEM block specs (double-buffered), None = auto (HBM on real
# TPU; interpret mode keeps the block form — it doesn't model DMA
# semaphores). Override for A/B probes only.
HBM_TBL: Optional[bool] = None

# Dual (half-shifted) table for the narrow window: True = always (when the
# topology carries a dual plan and the caller doesn't need in-kernel minmax),
# False = never (27-table + in-kernel combine), None = auto (= True; the
# combine ladder measured 5-6 ms/scalar-pass at bench size, probe r4/044).
DUAL_TBL: Optional[bool] = None


# Table-memory governor: the gathered unique-row table is ~1.5-2x the
# packed field bytes; above this budget the kernel runs in chunk SLICES
# under lax.scan so only one slice's table is live at a time (the 1024^3
# single-chip configuration — BASELINE config 5).
TABLE_BYTES_BUDGET = 2 * 1024**3


def _pick_slices(nc: int, U: int, nf: int) -> int:
    # Budget the PEAK of the slice build, not just the resident table: the
    # gathered cols ([.., nf, 512], layout-exact) plus the [.., 8, 64]
    # reshape (T(8,128) layout pads it 2x) plus the explicit lane pad are
    # all live at once — 2.5x the padded table bytes. The 1024^3 OOM
    # (probe r4/002) showed two 1.93 GB buffers from one 0.99 GB table.
    per_chunk = U * nf * 4 * (512 + 2 * 8 * 128)  # cols + reshape + pad
    total = nc * per_chunk
    s = 1
    while total // s > TABLE_BYTES_BUDGET and s < nc:
        s += 1
    return s


def bfecc_sample_fused(
    topo,
    fields: Sequence[jax.Array],
    dx: jax.Array,
    dy: jax.Array,
    dz: jax.Array,
    sdt: float,
    f_lo: int,
    sdf: Optional[jax.Array] = None,
    prec: str = "strict",
    interpret=None,
    win: int = 16,
    slices: Optional[int] = None,
    minmax: bool = False,
    dual: Optional[bool] = None,
    mode: str = "both",
    tbl27: Optional[jax.Array] = None,
    tbl_dual: Optional[jax.Array] = None,
) -> Tuple[List[jax.Array], ...]:
    """Fused BFECC sampling: returns (phiF list over fields[f_lo:],
    phiB list over fields[f_lo:]). ``fields[0:3]`` MUST be the velocity
    components (used for the in-kernel forward re-trace); for velocity
    self-advection pass f_lo=0, for scalars f_lo=3.

    ``mode``: "both" (default) = the fused pair; "back" / "fwd" run a
    single sampling pass and return ONE list (the MIXED window branch:
    back on the narrow window, forward at caller-supplied re-traced
    positions on the wide one — see advection._advect_vmem). Split modes
    require sdf=None and minmax=False.

    ``minmax``: additionally return (lo list, hi list) — each field's
    per-voxel min/max over {self, 6 face neighbors} of the PRE-advection
    values (the BFECC limiter bounds), computed in-kernel from the rows
    already resident in VMEM. Replaces the separate XLA clamp gather
    stage (and its [6, F, T, 512] transient, which OOMs at 1024^3).

    ``win``: 24 = full 3x3x3-tile window, valid for any caller-clamped
    displacements; 16 = narrow window, requires sdt*max|u| < CFL_LIMIT.

    ``slices``: split the chunk axis into this many sequential kernel
    invocations (lax.scan) so only 1/slices of the gathered table is live
    at once; None = auto by TABLE_BYTES_BUDGET. Bit-identical to the
    unsliced call (chunks are independent).

    ``dual``: use the half-shifted (corner-lattice) table for the narrow
    window — the window combine runs as HBM-bound XLA in build_table_dual
    and the kernel assembles 8 rows/tile instead of 27 (+ the roll ladder).
    Requires ``minmax=False`` (bounds come from the XLA clamp instead) and
    a topology with a dual plan. None = module default DUAL_TBL. Outputs
    are bit-identical to the 27-table narrow kernel.

    ``tbl27``: a prebuilt build_table(topo, fields + [sdf]) result to reuse
    (the mixed-window dispatch builds ONE 27-table and feeds both the
    combine-kernel dual build of the back pass and the wide forward pass).
    Ignored by the sliced at-scale path and the field-batch governor.

    ``tbl_dual``: a prebuilt build_table_dual(topo, fields + [sdf]) result
    to reuse (the mixed dispatch's back pass and its narrow re-traced
    forward pass read the SAME dual table). Same caveats as ``tbl27``."""
    if interpret is None:
        interpret = not _on_tpu()
    if isinstance(prec, bool):
        prec = "fast" if prec else "strict"
    assert win in (16, 24), win
    assert mode in ("both", "back", "fwd"), mode
    assert mode == "both" or (sdf is None and not minmax), mode
    use_dual = DUAL_TBL if dual is None else dual
    if use_dual is None:
        use_dual = True
    use_dual = bool(use_dual and win == 16 and not minmax
                    and topo.chunk_dsrc is not None)
    nb = len(fields)
    all_fields = list(fields) + ([sdf] if sdf is not None else [])
    nf_all = len(all_fields)
    T = topo.capacity
    nc, U = topo.chunk_uniq.shape
    if use_dual:
        U = topo.chunk_dsrc.shape[1]
    C = T // nc
    nf_out = nb - f_lo

    # VMEM governor: when the chunk table for all fields at once would not
    # fit (large-U topologies, e.g. 1024^3 at U=1920), advect the scalars in
    # batches, repeating the velocity (and sdf) operands per batch. Only the
    # scalar pass (f_lo == 3) can split; the velocity pass is always small.
    hbm = (not interpret) if HBM_TBL is None else bool(HBM_TBL)
    nf_fixed = 3 + (1 if sdf is not None else 0)
    g = min(_group_cap(f_lo, int(win)), C)

    def _fits(gg: int) -> bool:
        return (_vmem_need(U, nf_all, gg, int(win), hbm, use_dual)
                + _stack_need(gg, int(win), nf_out, prec)) <= SAFE_VMEM

    group = None
    if not _fits(g):
        # Prefer a SMALLER GROUP over field batches: every batch re-samples
        # the three velocity operands (the in-kernel re-trace needs them),
        # which made advect_scalars cost 2.3x its field-proportional share
        # at bench size — 78% of the whole step (probe r4/008: scalars
        # 54.8 ms vs velocity 14.6 ms in one window). G is bit-neutral and
        # must divide the chunk size, so halve until the ONE-launch form
        # fits; the scalar pass falls back to batches only below G=8 (the
        # velocity pass has nothing to split — it takes the best G found).
        gg = g // 2
        while gg >= 8 and not _fits(gg):
            gg //= 2
        if gg >= 8:
            group = gg
        elif f_lo == 3 and nf_out > 1:
            per = max(1, _max_fields_for_vmem(U, g, int(win), nf_fixed,
                                              hbm, prec, use_dual) - nf_fixed)
            parts: Tuple[List[jax.Array], ...] = ([], [], [], [])
            for lo in range(3, nb, per):
                batch = list(fields[:3]) + list(fields[lo:lo + per])
                res = bfecc_sample_fused(
                    topo, batch, dx, dy, dz, sdt, 3, sdf=sdf, prec=prec,
                    interpret=interpret, win=win, slices=slices,
                    minmax=minmax, dual=dual, mode=mode)
                for acc, part in zip(parts, res):
                    acc += part
            return parts[:len(res)]

    if slices is None:
        slices = _pick_slices(nc, U, nf_all)
    def unpack(out, out2):
        if mode != "both":
            return ([out[:, j, :] for j in range(nf_out)],)
        res = (
            [out[:, j, :] for j in range(nf_out)],
            [out[:, nf_out + j, :] for j in range(nf_out)],
        )
        if not minmax:
            return res
        lo = out2[:, :, :, :64].reshape(out2.shape[0], nf_out, TILE)
        hi = out2[:, :, :, 64:].reshape(out2.shape[0], nf_out, TILE)
        return res + (
            [lo[:, j, :] for j in range(nf_out)],
            [hi[:, j, :] for j in range(nf_out)],
        )

    if slices <= 1:
        if use_dual:
            if tbl_dual is not None:
                tbl = tbl_dual
            elif combine_ok(topo, nf_all):
                if tbl27 is None:
                    tbl27 = build_table(topo, all_fields)
                tbl = build_table_dual_combine(topo, tbl27, nf_all,
                                               interpret=interpret)
            else:
                tbl = build_table_dual(topo, all_fields)
            lnbr = topo.chunk_ldual
        else:
            tbl = tbl27 if tbl27 is not None else build_table(
                topo, all_fields)
            lnbr = topo.chunk_lnbr
        if hbm:
            tbl = jnp.pad(tbl, ((0, 0), (0, 0), (0, 0), (0, 64)))
        fn = _build(nc, U, C, T, nf_all, nb, f_lo, sdf is not None,
                    float(sdt), bool(interpret), prec, int(win),
                    minmax, hbm, group, use_dual, mode)
        out = fn(lnbr, dx, dy, dz, tbl)  # [T, 2*nf_out or nf_out, 512]
        out, out2 = out if minmax else (out, None)
        return unpack(out, out2)

    # Chunks run in sequential slices (the table-memory governor) as a
    # lax.scan over FULL slices of ncs chunks plus one direct call on the
    # remainder — contiguous-prefix reshapes only, NO tail padding: the old
    # pad-to-multiple form concatenated full-size zero-padded copies of
    # dx/dy/dz/lnbr (~1.7 GB of HLO temps at 1024^3).
    ncs = -(-nc // slices)  # chunks per full slice
    full = nc // ncs
    rem = nc - full * ncs


    def run(ncall, uq, ln, dxs, dys, dzs):
        # per-field gathers (vs the unsliced path's packed pre-gather copy):
        # nf-fold more descriptors over 1/slices of the rows, but no
        # [T, nf*512] resident copy — at 1024^3 that copy alone is ~4.4 GB
        # held across every slice
        fn = _build(ncall, U, C, ncall * C, nf_all, nb, f_lo, sdf is not None,
                    float(sdt), bool(interpret), prec, int(win), minmax, hbm,
                    group, use_dual, mode)
        if use_dual:
            # uq is this slice's dsrc [ncall*U, 8]. At scale the octant-
            # packed splits are NOT worth it: they are a resident copy of
            # the full field bytes held across every slice, which put the
            # 1024^3 envelope 107 MB over HBM (probe r4/071). Gather full
            # rows per field instead (bytes-heavier, transient-light),
            # octant-select, then the shared lane permutation.
            import numpy as _np

            masks, perm = _dual_lane_maps()
            acc = jnp.zeros((ncall * U, nf_all, 512), jnp.float32)
            for j in range(8):
                rows = jnp.stack(
                    [jnp.take(f, uq[:, j], axis=0) for f in all_fields],
                    axis=1)  # [ncall*U, nf, 512]
                acc = jnp.where(jnp.asarray(masks[j]), rows, acc)
                acc, dxs = jax.lax.optimization_barrier((acc, dxs))
            tbl = jnp.take(acc, jnp.asarray(perm.astype(_np.int32)),
                           axis=2)
            tbl = tbl.reshape(ncall, U * nf_all, 8, 64)
        else:
            cols = jnp.stack([jnp.take(f, uq, axis=0) for f in all_fields],
                             axis=1)  # [ncall*U, nf, 512]
            tbl = cols.reshape(ncall, U * nf_all, 8, 64)
        if hbm:
            tbl = jnp.pad(tbl, ((0, 0), (0, 0), (0, 0), (0, 64)))
        return fn(ln, dxs, dys, dzs, tbl)

    rows = full * ncs * C
    # slice INSIDE the scan body (dynamic_slice per iteration) instead of
    # pre-reshaping whole-domain copies into scan xs: the xs form held
    # duplicate [rows, 512] copies of dx/dy/dz (+lnbr) alongside the
    # originals — ~3 GB of the 1024^3 OOM (probe r4/002).
    if use_dual:
        uq_flat = topo.chunk_dsrc.reshape(-1, 8)
        ln_full = topo.chunk_ldual
        nn = 8
    else:
        uq_flat = topo.chunk_uniq.reshape(-1)
        ln_full = topo.chunk_lnbr
        nn = 27

    def body(carry, i):
        r0 = i * (ncs * C)
        if use_dual:
            uq = jax.lax.dynamic_slice(
                uq_flat, (i * ncs * U, 0), (ncs * U, 8))
        else:
            uq = jax.lax.dynamic_slice(uq_flat, (i * ncs * U,), (ncs * U,))
        ln = jax.lax.dynamic_slice(ln_full, (r0, 0), (ncs * C, nn))
        sl = lambda a: jax.lax.dynamic_slice(a, (r0, 0), (ncs * C, TILE))  # noqa: E731
        return carry, run(ncs, uq, ln, sl(dx), sl(dy), sl(dz))

    _, outs = jax.lax.scan(body, 0, jnp.arange(full))
    tail = (
        run(rem,
            uq_flat[full * ncs * U :],
            ln_full[rows:], dx[rows:], dy[rows:], dz[rows:])
        if rem else None
    )
    if minmax:
        outs, outs2 = outs
        out2 = outs2.reshape(rows, nf_out, 8, 128)
        if rem:
            out2 = jnp.concatenate([out2, tail[1]], axis=0)
    else:
        out2 = None
    nout = 2 * nf_out if mode == "both" else nf_out
    out = outs.reshape(rows, nout, 512)
    if rem:
        out = jnp.concatenate([out, tail[0] if minmax else tail], axis=0)
    return unpack(out, out2)
