"""Fused Pallas TPU kernel for MXU trilinear sampling.

The XLA formulation (ops/interp.py) materializes the first-contraction
intermediate ``t1 [T,512,576]`` in HBM — ~9.7 GB of traffic per field pass.
This kernel fuses all three hat-weight contractions per tile in VMEM:

  per tile, per (dy,dz) neighbor block (fori_loop, buffers reused):
      B_sub [24, 64]  <- three row-slices of the 27-table
      t1    [512,64]  <- Wx @ B_sub                     (batched MXU dot)
      acc  += sum(t1 * hat(ly,dy*8+y)*hat(lz,dz*8+z))   (VPU, closed-form)

Weights use the closed-form trilinear hat ``relu(1 - |local - a|)`` — no
one-hot construction, no reshapes (Mosaic rejects lane-splitting shape
casts). All fields of a pass share the weights; fields iterate in a
fori_loop over a stacked table ref so VMEM temporaries are reused.

HBM traffic per tile per field: the 55 KB table row + 6 KB displacements +
2 KB out — two orders of magnitude below the XLA path.

Falls back to interpret mode off-TPU so the kernel is CPU-testable.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hnanosolver_tpu.core.layout import TILE

A = 24
GROUP = 8  # tiles per program (TPU block shapes need >= 8 sublanes)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu" or "TPU" in str(jax.devices()[0])
    except Exception:  # pragma: no cover
        return False


def _hat_at(local, a):
    """Closed-form trilinear hat weight: relu(1 - |local - a|)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(local - a))


def _kernel(nf: int, G: int, fast: bool, dx_ref, dy_ref, dz_ref, tbl_ref, out_ref):
    col = jax.lax.broadcasted_iota(jnp.int32, (G, TILE), 1)
    cx = (col // 64).astype(jnp.float32)
    cy = ((col // 8) % 8).astype(jnp.float32)
    cz = (col % 8).astype(jnp.float32)
    # sample positions in window coords [0,24), laid out voxel-on-lanes
    lx = (cx + 8.0 + dx_ref[:])[:, None, :]  # [G,1,512]
    ly = (cy + 8.0 + dy_ref[:])[:, None, :]
    lz = (cz + 8.0 + dz_ref[:])[:, None, :]

    # x hat weights, transposed layout [G, 24, 512] (a on sublanes)
    a24 = jax.lax.broadcasted_iota(jnp.int32, (1, A, 1), 1).astype(jnp.float32)
    wxT = _hat_at(lx, a24)
    if fast:
        wxT = wxT.astype(jnp.bfloat16)

    # per-sublane (q, y, z) indices of the 128-row (2 dz-blocks x 8y x 8z)
    # wyz operand
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 128, 1), 1)
    qs = (sub // 64).astype(jnp.float32)
    ys = ((sub % 64) // 8).astype(jnp.float32)
    zs = (sub % 8).astype(jnp.float32)

    def zero_body(f, carry):
        out_ref[:, f, :] = jnp.zeros((G, TILE), jnp.float32)
        return carry

    jax.lax.fori_loop(0, nf, zero_body, 0)

    # Static pair loop OUTSIDE the field loop: wyzT is position-dependent
    # but field-independent; (y,z) contraction runs on the MXU with K=128.
    # The 9 (dy,dz) blocks pair into 5 dots (the 10th slot is dead: its
    # hat weight is zeroed via the q mask), not 3x2 dy-major pairs — that
    # wasted a full zero-weight block, 1/6 of the MXU work.
    for i in range(5):
        b0, b1 = 2 * i, min(2 * i + 1, 8)  # (dy,dz) block ids: b = dy*3+dz
        dy_q = (1.0 - qs) * (b0 // 3) + qs * (b1 // 3)
        dz_q = (1.0 - qs) * (b0 % 3) + qs * (b1 % 3)
        wyzT = _hat_at(ly, dy_q * 8.0 + ys) * _hat_at(
            lz, dz_q * 8.0 + zs
        )  # [G, 128, 512]
        if 2 * i + 1 > 8:  # odd slot dead: zero its duplicated weights
            wyzT = wyzT * (1.0 - qs)
        if fast:
            wyzT = wyzT.astype(jnp.bfloat16)

        def field_body(f, carry):
            rows = []
            for b_h in (b0, b1):
                rows += [
                    tbl_ref[:, f, (dxb * 9 + b_h) * 8 : (dxb * 9 + b_h) * 8 + 8, :]
                    for dxb in range(3)
                ]
            b_sub = jnp.concatenate(
                [jnp.concatenate(rows[:3], axis=1),
                 jnp.concatenate(rows[3:], axis=1)], axis=2
            )  # [G, 24, 128]
            if fast:
                b_sub = b_sub.astype(jnp.bfloat16)
            # MXU: contract the 128 (y,z) rows -> [G, 24, 512]
            t1 = jax.lax.dot_general(
                b_sub, wyzT,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                # parity mode needs true-f32 passes (TPU DEFAULT = one bf16
                # pass, ~4e-3 rel err); fast mode keeps the bf16 operands
                precision=None if fast else jax.lax.Precision.HIGHEST,
            )
            # tiny VPU reduce over the 24 x-window sublanes
            out_ref[:, f, :] += jnp.sum(wxT.astype(jnp.float32) * t1, axis=1)
            return carry

        jax.lax.fori_loop(0, nf, field_body, 0)


@functools.lru_cache(maxsize=None)
def _build(nf: int, T: int, interpret: bool, fast: bool = False):
    G = min(GROUP, T)
    d_spec = pl.BlockSpec((G, TILE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec(
        (G, nf, 216, 64), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec(
        (G, nf, TILE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel, nf, G, fast),
        grid=(T // G,),
        in_specs=[d_spec, d_spec, d_spec, t_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((T, nf, TILE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )


def trilinear_pallas(
    tables: Sequence[jax.Array],
    dx: jax.Array,
    dy: jax.Array,
    dz: jax.Array,
    interpret=None,
    fast: bool = False,
) -> List[jax.Array]:
    """Drop-in replacement for ops.interp.trilinear_mxu (same contract).
    tables: list of [T, 27*512]; returns list of [T,512]. ``fast`` runs the
    MXU contraction in bfloat16 (~2-4x faster; ~4e-3 relative sampling
    error — NOT parity-grade; see SolverParams.precision)."""
    if interpret is None:
        interpret = not _on_tpu()
    T = dx.shape[0]
    nf = len(tables)
    fn = _build(nf, T, bool(interpret), bool(fast))
    stacked = jnp.stack([t.reshape(T, 216, 64) for t in tables], axis=1)
    out = fn(dx, dy, dz, stacked)  # [T, nf, 512]
    return [out[:, f, :] for f in range(nf)]


def sample_fields_pallas(
    nbr27: jax.Array,
    fields: Sequence[jax.Array],
    dx: jax.Array,
    dy: jax.Array,
    dz: jax.Array,
    interpret=None,
    fast: bool = False,
) -> List[jax.Array]:
    """Memory-lean entry: gathers ALL fields' 27-neighborhoods in ONE row
    gather directly into the kernel's stacked layout (no per-field table
    intermediates). ``nbr27 [C,27]`` neighbor rows, ``fields`` full [T,512]
    arrays, ``dx/dy/dz [C,512]`` displacements."""
    if interpret is None:
        interpret = not _on_tpu()
    C = dx.shape[0]
    nf = len(fields)
    T = fields[0].shape[0]
    flat = jnp.concatenate([f for f in fields], axis=0)  # [nf*T, 512]
    offs = (jnp.arange(nf, dtype=jnp.int32) * T)[None, :, None]
    idx = (nbr27[:, None, :] + offs).reshape(-1)  # [C*nf*27]
    tbl = jnp.take(flat, idx, axis=0).reshape(C, nf, 216, 64)
    fn = _build(nf, C, bool(interpret), bool(fast))
    out = fn(dx, dy, dz, tbl)
    return [out[:, f, :] for f in range(nf)]
