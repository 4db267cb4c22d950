"""Fused narrow-window BFECC megakernel (ops/pallas_bfecc) vs the wide
multi-pass sampler — interpret mode (CPU).

The megakernel must reproduce the wide path's samples to f32 rounding in
its validity regime (all |displacement| < 4), including on sparse
topologies with missing neighbors (background zeros) and with SDF trace
rejection. Reference being modeled: the fused MacCormack kernel
`/root/reference/src/Cuda/Kernel.cu:118-266`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from hnanosolver_tpu.core.topology import build_topology, build_topology_dense
from hnanosolver_tpu.ops import advection as adv
from hnanosolver_tpu.ops import pallas_bfecc as pb
from hnanosolver_tpu.ops import pallas_interp2 as pi2
from hnanosolver_tpu.ops import shifts as sh

ATOL = 2e-5


def _rand_fields(rng, T, n):
    return [jnp.asarray(rng.normal(size=(T, 512)).astype(np.float32)) for _ in range(n)]


def _wide_bfecc(topo, fields, dx, dy, dz, sdt, f_lo, sdf):
    """The multi-pass reference: probe/reject, back pass, re-trace, fwd pass."""
    tabs = pi2.build_tables(topo, fields)
    st = pi2.build_tables(topo, [sdf]) if sdf is not None else None
    nb = len(fields)
    if sdf is not None:
        d = pi2.sample_tables(topo, st, 0, 1, dx, dy, dz, "strict", interpret=True)[0]
        hit = d < 0.0
        dx = jnp.where(hit, 0.0, dx)
        dy = jnp.where(hit, 0.0, dy)
        dz = jnp.where(hit, 0.0, dz)
    back = pi2.sample_tables(topo, tabs, 0, nb, dx, dy, dz, "strict", interpret=True)
    lim = 7.0 - 1e-3  # advection.DISP_LIMIT, applied by both paths
    d2x = jnp.clip(dx + back[0] * sdt, -lim, lim)
    d2y = jnp.clip(dy + back[1] * sdt, -lim, lim)
    d2z = jnp.clip(dz + back[2] * sdt, -lim, lim)
    if sdf is not None:
        d2 = pi2.sample_tables(topo, st, 0, 1, d2x, d2y, d2z, "strict", interpret=True)[0]
        hit2 = d2 < 0.0
        d2x = jnp.where(hit2, dx, d2x)
        d2y = jnp.where(hit2, dy, d2y)
        d2z = jnp.where(hit2, dz, d2z)
    phib = pi2.sample_tables(topo, tabs, f_lo, nb, d2x, d2y, d2z, "strict", interpret=True)
    return back[f_lo:], phib


def _sparse_topo(rng):
    # 5^3 tile box (was 6^3): same chunk/coverage class (one 512-row chunk,
    # missing neighbors on every face, >= 3 tiles per axis so the 24-window
    # spans full tile triples) at ~60% of the interpret-mode wall time —
    # the fast tier is compile/interpret-bound (VERDICT r4 next-8)
    box = np.array([(x, y, z) for x in range(5) for y in range(5) for z in range(5)])
    return build_topology(box[rng.random(len(box)) < 0.5])


@pytest.mark.slow
@pytest.mark.parametrize("sparse", [False, True])
def test_scalars_mode_matches_wide(sparse):
    rng = np.random.default_rng(3)
    topo = _sparse_topo(rng) if sparse else build_topology_dense((24, 24, 24))
    T = topo.capacity
    vel = _rand_fields(rng, T, 3)
    fields = vel + _rand_fields(rng, T, 2)
    sdt = 0.35
    dx = jnp.clip(-vel[0] * sdt, -1.8, 1.8)
    dy = jnp.clip(-vel[1] * sdt, -1.8, 1.8)
    dz = jnp.clip(-vel[2] * sdt, -1.8, 1.8)
    back, phib = _wide_bfecc(topo, fields, dx, dy, dz, sdt, 3, None)
    pf, pbk = pb.bfecc_sample_fused(
        topo, fields, dx, dy, dz, sdt, 3, None, "strict", interpret=True
    )
    for i in range(2):
        assert float(jnp.max(jnp.abs(pf[i] - back[i]))) < ATOL
        assert float(jnp.max(jnp.abs(pbk[i] - phib[i]))) < ATOL


def test_win24_fast_flow_matches_wide():
    """The 24-window fused kernel matches the multi-pass path for fast
    flows (displacements at the +-7 clamp), where the narrow window is
    invalid."""
    rng = np.random.default_rng(9)
    topo = _sparse_topo(rng)
    T = topo.capacity
    vel = [f * 8.0 for f in _rand_fields(rng, T, 3)]
    fields = vel + _rand_fields(rng, T, 2)
    sdt = 0.5
    lim = 7.0 - 1e-3
    dx = jnp.clip(-vel[0] * sdt, -lim, lim)
    dy = jnp.clip(-vel[1] * sdt, -lim, lim)
    dz = jnp.clip(-vel[2] * sdt, -lim, lim)
    back, phib = _wide_bfecc(topo, fields, dx, dy, dz, sdt, 3, None)
    pf, pbk = pb.bfecc_sample_fused(
        topo, fields, dx, dy, dz, sdt, 3, None, "strict", interpret=True,
        win=24,
    )
    for i in range(2):
        assert float(jnp.max(jnp.abs(pf[i] - back[i]))) < ATOL
        assert float(jnp.max(jnp.abs(pbk[i] - phib[i]))) < ATOL


def test_velocity_mode_matches_wide():
    rng = np.random.default_rng(4)
    topo = _sparse_topo(rng)
    T = topo.capacity
    vel = _rand_fields(rng, T, 3)
    sdt = 0.3
    dx = jnp.clip(-vel[0] * sdt, -1.8, 1.8)
    dy = jnp.clip(-vel[1] * sdt, -1.8, 1.8)
    dz = jnp.clip(-vel[2] * sdt, -1.8, 1.8)
    back, phib = _wide_bfecc(topo, vel, dx, dy, dz, sdt, 0, None)
    pf, pbk = pb.bfecc_sample_fused(
        topo, vel, dx, dy, dz, sdt, 0, None, "strict", interpret=True
    )
    for i in range(3):
        assert float(jnp.max(jnp.abs(pf[i] - back[i]))) < ATOL
        assert float(jnp.max(jnp.abs(pbk[i] - phib[i]))) < ATOL


def test_sdf_rejection_matches_wide():
    rng = np.random.default_rng(5)
    topo = _sparse_topo(rng)
    T = topo.capacity
    vel = _rand_fields(rng, T, 3)
    fields = vel + _rand_fields(rng, T, 1)
    # SDF well away from 0 at trace positions so ulp-level position
    # differences cannot flip a rejection (both paths then agree exactly)
    sdf = jnp.asarray(
        np.where(rng.random((T, 512)) < 0.3, -1.0, 1.0).astype(np.float32)
    )
    sdt = 0.4
    dx = jnp.clip(-vel[0] * sdt, -1.8, 1.8)
    dy = jnp.clip(-vel[1] * sdt, -1.8, 1.8)
    dz = jnp.clip(-vel[2] * sdt, -1.8, 1.8)
    back, phib = _wide_bfecc(topo, fields, dx, dy, dz, sdt, 3, sdf)
    pf, pbk = pb.bfecc_sample_fused(
        topo, fields, dx, dy, dz, sdt, 3, sdf, "strict", interpret=True
    )
    assert float(jnp.max(jnp.abs(pf[0] - back[0]))) < ATOL
    assert float(jnp.max(jnp.abs(pbk[0] - phib[0]))) < ATOL


@pytest.mark.slow
def test_advect_vmem_cond_dispatch():
    """_advect_vmem: the narrow/wide lax.cond picks narrow for small CFL and
    wide for fast flows, both returning wide-equivalent samples."""
    rng = np.random.default_rng(6)
    topo = build_topology_dense((16, 16, 16))
    T = topo.capacity
    vel_arr = jnp.stack(_rand_fields(rng, T, 3))
    fields = _rand_fields(rng, T, 2)
    for scale in (0.4, 9.0):  # CFL ~0.4 (narrow) and ~9 (wide fallback)
        v = vel_arr * scale
        pf_n, pb_n, _ = adv._advect_vmem(topo, v, fields, 1.0, None)
        pf_w, pb_w, _ = adv._advect_vmem_wide(topo, v, fields, 1.0, None)
        assert float(jnp.max(jnp.abs(pf_n - pf_w))) < ATOL
        assert float(jnp.max(jnp.abs(pb_n - pb_w))) < ATOL


def test_sliced_call_is_bit_identical():
    """slices > 1 runs the chunk axis in sequential lax.scan slices (the
    1024^3 table-memory governor) and must be bit-identical, including the
    null-chunk tail padding when slices doesn't divide the chunk count."""
    import numpy as np
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.ops import pallas_bfecc as pb

    tiles = [(x, y, z) for x in range(6) for y in range(4) for z in range(3)
             if (x + y + z) % 5 != 4]
    topo = build_topology(np.array(tiles, np.int32))
    T = topo.capacity
    rng = np.random.default_rng(0)
    flds = [jnp.asarray(rng.normal(size=(T, 512)).astype(np.float32))
            for _ in range(5)]
    d = [jnp.asarray(rng.uniform(-1.5, 1.5, (T, 512)).astype(np.float32))
         for _ in range(3)]
    a1 = pb.bfecc_sample_fused(topo, flds, *d, 0.5, 3, None, "strict",
                               win=16, slices=1)
    a3 = pb.bfecc_sample_fused(topo, flds, *d, 0.5, 3, None, "strict",
                               win=16, slices=3)
    for x, y in zip(a1[0] + a1[1], a3[0] + a3[1]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("f_lo,sparse", [(3, True), (0, True), (3, False)])
def test_minmax_limiter_bounds(f_lo, sparse):
    """minmax=True returns each field's per-voxel (min, max) over
    {self, 6 face neighbors} of the pre-advection values — must equal the
    XLA clamp stage's bounds (shifts.face_minmax_multi + self), including
    background-0 contributions at topology boundaries (sparse case)."""
    from hnanosolver_tpu.ops import shifts as sh

    rng = np.random.default_rng(11)
    topo = _sparse_topo(rng) if sparse else build_topology_dense((16, 16, 16))
    T = topo.capacity
    vel = _rand_fields(rng, T, 3)
    fields = vel + (_rand_fields(rng, T, 2) if f_lo == 3 else [])
    sdt = 0.3
    dx = jnp.clip(-vel[0] * sdt, -1.8, 1.8)
    dy = jnp.clip(-vel[1] * sdt, -1.8, 1.8)
    dz = jnp.clip(-vel[2] * sdt, -1.8, 1.8)
    pf, pbk, lo, hi = pb.bfecc_sample_fused(
        topo, fields, dx, dy, dz, sdt, f_lo, None, "strict", interpret=True,
        minmax=True,
    )
    phi0s = jnp.stack(fields[f_lo:])
    mins, maxs = sh.face_minmax_multi(topo, phi0s)
    want_lo = jnp.minimum(phi0s, mins)
    want_hi = jnp.maximum(phi0s, maxs)
    mask = jnp.asarray(np.arange(T) < int(topo.n_active))[:, None]
    for i in range(len(lo)):
        np.testing.assert_array_equal(
            np.asarray(jnp.where(mask, lo[i], 0.0)),
            np.asarray(jnp.where(mask, want_lo[i], 0.0)))
        np.testing.assert_array_equal(
            np.asarray(jnp.where(mask, hi[i], 0.0)),
            np.asarray(jnp.where(mask, want_hi[i], 0.0)))


def test_minmax_sliced_matches_unsliced():
    rng = np.random.default_rng(12)
    topo = _sparse_topo(rng)
    T = topo.capacity
    vel = _rand_fields(rng, T, 3)
    fields = vel + _rand_fields(rng, T, 2)
    d = [jnp.clip(-v * 0.3, -1.8, 1.8) for v in vel]
    a1 = pb.bfecc_sample_fused(topo, fields, *d, 0.3, 3, None, "strict",
                               interpret=True, win=16, slices=1, minmax=True)
    a3 = pb.bfecc_sample_fused(topo, fields, *d, 0.3, 3, None, "strict",
                               interpret=True, win=16, slices=3, minmax=True)
    assert len(a1) == 4 and len(a3) == 4
    for part1, part3 in zip(a1, a3):
        for x, y in zip(part1, part3):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_scalar_batch_governor_matches_unbatched(monkeypatch):
    """advect_scalars_fused at-scale governor: forcing the transient budget
    to one field's worth advects+clamps in per-field batches — same results
    to f32 rounding (bit-exactness across batch sizes is a Pallas-path
    property, covered by test_field_batched_matches_unbatched; the XLA
    fallback path fuses FMAs differently for different field counts)."""
    rng = np.random.default_rng(13)
    topo = build_topology_dense((16, 16, 16))
    T = topo.capacity
    vel = jnp.stack(_rand_fields(rng, T, 3))
    scalars = {n: f for n, f in zip("abc", _rand_fields(rng, T, 3))}
    out0 = adv.advect_scalars_fused(topo, vel, scalars, 0.04, 1.0)
    monkeypatch.setattr(adv, "ADVECT_TRANSIENT_BUDGET", 4 * T * 512 * 4)
    out1 = adv.advect_scalars_fused(topo, vel, scalars, 0.04, 1.0)
    for n in scalars:
        assert float(jnp.max(jnp.abs(out0[n] - out1[n]))) < ATOL


def test_velocity_per_component_matches(monkeypatch):
    """advect_velocity at-scale governor: per-component passes (each
    component advected as a scalars-mode field) match the one-call
    self-advection path to f32 rounding."""
    rng = np.random.default_rng(14)
    topo = build_topology_dense((16, 16, 16))
    T = topo.capacity
    vel = jnp.stack(_rand_fields(rng, T, 3))
    out0 = adv.advect_velocity(topo, vel, 0.04, 1.0)
    monkeypatch.setattr(adv, "ADVECT_TRANSIENT_BUDGET", 4 * T * 512 * 4)
    out1 = adv.advect_velocity(topo, vel, 0.04, 1.0)
    assert float(jnp.max(jnp.abs(out0 - out1))) < ATOL


def test_field_batched_matches_unbatched(monkeypatch):
    """VMEM governor: forcing SAFE_VMEM low makes the scalar pass split into
    field batches (velocity repeated per batch) — bit-identical outputs."""
    rng = np.random.default_rng(7)
    topo = build_topology_dense((16, 16, 16))
    T = topo.capacity
    vel = _rand_fields(rng, T, 3)
    fields = vel + _rand_fields(rng, T, 3)
    sdt = 0.3
    dx = jnp.clip(-vel[0] * sdt, -1.8, 1.8)
    dy = jnp.clip(-vel[1] * sdt, -1.8, 1.8)
    dz = jnp.clip(-vel[2] * sdt, -1.8, 1.8)
    f0, b0 = pb.bfecc_sample_fused(
        topo, fields, dx, dy, dz, sdt, 3, None, "strict", interpret=True)
    nc, U = topo.chunk_uniq.shape
    # budget that fits vel+1 scalar but not vel+3
    monkeypatch.setattr(pb, "SAFE_VMEM", pb._vmem_need(U, 4, 8, 16))
    f1, b1 = pb.bfecc_sample_fused(
        topo, fields, dx, dy, dz, sdt, 3, None, "strict", interpret=True)
    assert len(f1) == 3 and len(b1) == 3
    for a, b in zip(f0 + b0, f1 + b1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dual_table_bit_identical():
    """The half-shifted dual-table narrow kernel is pure data re-routing:
    outputs must equal the 27-table + in-kernel-combine kernel BIT-FOR-BIT
    (scalars and velocity modes, with and without SDF rejection)."""
    rng = np.random.default_rng(11)
    topo = _sparse_topo(rng)
    T = topo.capacity
    assert topo.chunk_dsrc is not None
    vel = _rand_fields(rng, T, 3)
    fields = vel + _rand_fields(rng, T, 2)
    sdf = jnp.asarray(rng.normal(size=(T, 512)).astype(np.float32))
    sdt = 0.35
    dx = jnp.clip(-vel[0] * sdt, -1.8, 1.8)
    dy = jnp.clip(-vel[1] * sdt, -1.8, 1.8)
    dz = jnp.clip(-vel[2] * sdt, -1.8, 1.8)
    for f_lo, s in ((3, None), (3, sdf), (0, None), (0, sdf)):
        fl = fields if f_lo == 3 else vel
        want = pb.bfecc_sample_fused(
            topo, fl, dx, dy, dz, sdt, f_lo, s, "strict", interpret=True,
            dual=False)
        got = pb.bfecc_sample_fused(
            topo, fl, dx, dy, dz, sdt, f_lo, s, "strict", interpret=True,
            dual=True)
        for a, b in zip(want[0] + want[1], got[0] + got[1]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dual_sliced_bit_identical():
    """The sliced (table-memory-governor) dual path builds its per-slice
    tables from per-field octant gathers — bit-identical to unsliced."""
    rng = np.random.default_rng(12)
    topo = _sparse_topo(rng)
    T = topo.capacity
    vel = _rand_fields(rng, T, 3)
    fields = vel + _rand_fields(rng, T, 2)
    sdt = 0.3
    dx = jnp.clip(-vel[0] * sdt, -1.8, 1.8)
    dy = jnp.clip(-vel[1] * sdt, -1.8, 1.8)
    dz = jnp.clip(-vel[2] * sdt, -1.8, 1.8)
    want = pb.bfecc_sample_fused(
        topo, fields, dx, dy, dz, sdt, 3, None, "strict", interpret=True,
        dual=True, slices=1)
    got = pb.bfecc_sample_fused(
        topo, fields, dx, dy, dz, sdt, 3, None, "strict", interpret=True,
        dual=True, slices=2)
    for a, b in zip(want[0] + want[1], got[0] + got[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_advect_scalars_dual_matches_27table(monkeypatch):
    """advect_scalars_fused end-to-end: dual mode (XLA limiter bounds) vs
    the in-kernel-minmax 27-table mode — bit-identical clamped results."""
    rng = np.random.default_rng(13)
    topo = _sparse_topo(rng)
    T = topo.capacity
    vel = jnp.stack(_rand_fields(rng, T, 3))
    scal = {"d": _rand_fields(rng, T, 1)[0], "t": _rand_fields(rng, T, 1)[0]}
    out_dual = adv.advect_scalars_fused(topo, vel, dict(scal), 0.04, 2.0)
    monkeypatch.setattr(pb, "DUAL_TBL", False)
    out_old = adv.advect_scalars_fused(topo, vel, dict(scal), 0.04, 2.0)
    for k in scal:
        np.testing.assert_array_equal(
            np.asarray(out_dual[k]), np.asarray(out_old[k]))


def test_face_minmax_blocked_matches(monkeypatch):
    """face_minmax_multi's row-block form (the 1024^3 transient governor)
    is bit-identical to the whole-domain form."""
    import hnanosolver_tpu.ops.shifts as sh

    rng = np.random.default_rng(17)
    topo = _sparse_topo(rng)
    T = topo.capacity
    fields = jnp.stack(_rand_fields(rng, T, 2))
    want = sh.face_minmax_multi(topo, fields)
    monkeypatch.setattr(sh, "MINMAX_VIEWS_BUDGET", T * 512)  # forces blocks
    got = sh.face_minmax_multi(topo, fields)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mixed_window_matches_wide():
    """The MIXED branch (back pass narrow/dual, XLA re-trace, forward pass
    wide) must match the fused wide kernel to f32 rounding for flows in
    its validity band 1.9 <= CFL < 3.9 (same math, different windows)."""
    rng = np.random.default_rng(21)
    topo = _sparse_topo(rng)
    T = topo.capacity
    vel = [f * 3.0 for f in _rand_fields(rng, T, 3)]
    fields = vel + _rand_fields(rng, T, 2)
    sdt = 0.9
    lim = 7.0 - 1e-3
    dx = jnp.clip(-vel[0] * sdt, -3.8, 3.8)
    dy = jnp.clip(-vel[1] * sdt, -3.8, 3.8)
    dz = jnp.clip(-vel[2] * sdt, -3.8, 3.8)
    pf_w, pb_w = pb.bfecc_sample_fused(
        topo, fields, dx, dy, dz, sdt, 3, None, "strict", interpret=True,
        win=24)
    backs = pb.bfecc_sample_fused(
        topo, fields, dx, dy, dz, sdt, 0, None, "strict", interpret=True,
        win=16, mode="back")[0]
    d2x = jnp.clip(dx + backs[0] * sdt, -lim, lim)
    d2y = jnp.clip(dy + backs[1] * sdt, -lim, lim)
    d2z = jnp.clip(dz + backs[2] * sdt, -lim, lim)
    phib = pb.bfecc_sample_fused(
        topo, fields, d2x, d2y, d2z, sdt, 3, None, "strict",
        interpret=True, win=24, mode="fwd")[0]
    for i in range(2):
        assert float(jnp.max(jnp.abs(backs[3 + i] - pf_w[i]))) < ATOL
        # the forward sample composes the back sample's last-ulp window
        # difference through the re-traced POSITION (sensitivity ~ field
        # gradient x position delta), so its tolerance is looser
        assert float(jnp.max(jnp.abs(phib[i] - pb_w[i]))) < 1e-4


def test_advect_vmem_mixed_dispatch():
    """_advect_vmem's 3-way cond: the mixed branch (1.9 <= CFL < 3.9)
    produces wide-equivalent samples end to end."""
    rng = np.random.default_rng(22)
    topo = build_topology_dense((16, 16, 16))
    T = topo.capacity
    vel_arr = jnp.stack(_rand_fields(rng, T, 3))
    fields = _rand_fields(rng, T, 2)
    v = vel_arr * 2.6  # CFL lands in the mixed band
    pf_m, pb_m, _ = adv._advect_vmem(topo, v, fields, 1.0, None)
    pf_w, pb_w, _ = adv._advect_vmem_wide(topo, v, fields, 1.0, None)
    assert float(jnp.max(jnp.abs(pf_m - pf_w))) < ATOL
    assert float(jnp.max(jnp.abs(pb_m - pb_w))) < ATOL


def test_bfecc_limit_blocks_bitexact(monkeypatch):
    """The at-scale fused block limiter (_bfecc_limit_blocks: bounds +
    correction + clip per row block, no field-sized transients — the
    radius-256 fit, NOTES r3 fact 26) is BIT-identical to the precomputed-
    bounds path on the same pf/pb."""
    rng = np.random.default_rng(21)
    topo = build_topology_dense((16, 16, 16))
    T = topo.capacity
    phi0s = jnp.stack(_rand_fields(rng, T, 3))
    pf = jnp.stack(_rand_fields(rng, T, 3))
    pb_ = jnp.stack(_rand_fields(rng, T, 3))
    mins, maxs = sh.face_minmax_multi(topo, phi0s)
    lohi = (jnp.minimum(phi0s, mins), jnp.maximum(phi0s, maxs))
    ref = adv._bfecc_limit(topo, phi0s, pf, pb_, lohi)
    monkeypatch.setattr(sh, "MINMAX_VIEWS_BUDGET", T * 512)  # force blocks
    blocked = adv._bfecc_limit(topo, phi0s, pf, pb_, None)
    assert jnp.array_equal(ref, blocked)


@pytest.mark.slow  # COMBINE_TBL is default-off (measured negative, NOTES r4 fact 50)
def test_combine_kernel_table_bitexact():
    """The on-chip 27-table -> dual-table combine (build_table_dual_combine,
    chunk_dloc indirection + VMEM roll ladder) is BIT-identical to the XLA
    octant-packed build on a sparse topology, for several field counts."""
    from hnanosolver_tpu.core.topology import ensure_dual_local

    rng = np.random.default_rng(23)
    topo = ensure_dual_local(_sparse_topo(rng))  # dloc is opt-in (r4 ADVICE)
    T = topo.capacity
    assert topo.chunk_dloc is not None
    for nf in (1, 3, 5):
        fields = _rand_fields(rng, T, nf)
        ref = pb.build_table_dual(topo, fields)
        tbl27 = pb.build_table(topo, fields)
        got = pb.build_table_dual_combine(topo, tbl27, nf, interpret=True)
        assert got.shape == ref.shape
        assert jnp.array_equal(got, ref), float(jnp.max(jnp.abs(got - ref)))


@pytest.mark.slow  # COMBINE_TBL is default-off (measured negative, NOTES r4 fact 50)
def test_combine_kernel_sample_path_bitexact(monkeypatch):
    """bfecc_sample_fused with COMBINE_TBL forced on produces bit-identical
    samples to the default dual build (the table is bit-equal, so the
    kernel's outputs must be too)."""
    from hnanosolver_tpu.core.topology import ensure_dual_local

    rng = np.random.default_rng(24)
    topo = ensure_dual_local(_sparse_topo(rng))
    T = topo.capacity
    fields = _rand_fields(rng, T, 3) + _rand_fields(rng, T, 2)
    sdt = 0.3
    dx = jnp.clip(-fields[0] * sdt, -1.8, 1.8)
    dy = jnp.clip(-fields[1] * sdt, -1.8, 1.8)
    dz = jnp.clip(-fields[2] * sdt, -1.8, 1.8)
    ref = pb.bfecc_sample_fused(
        topo, fields, dx, dy, dz, sdt, 3, None, "strict", interpret=True)
    monkeypatch.setattr(pb, "COMBINE_TBL", True)
    got = pb.bfecc_sample_fused(
        topo, fields, dx, dy, dz, sdt, 3, None, "strict", interpret=True)
    for a, b in zip(ref, got):
        for x, y in zip(a, b):
            assert jnp.array_equal(x, y)


@pytest.mark.slow  # COMBINE_TBL is default-off (measured negative, NOTES r4 fact 50)
def test_combine_kernel_mixed_share_bitexact(monkeypatch):
    """Mixed-window dispatch with the combine kernel on (one shared
    27-table feeding both the back-pass dual combine and the wide forward
    pass) matches the unshared dispatch bit-for-bit."""
    from hnanosolver_tpu.core.topology import ensure_dual_local

    rng = np.random.default_rng(25)
    topo = ensure_dual_local(build_topology_dense((16, 16, 16)))
    T = topo.capacity
    vel_arr = jnp.stack(_rand_fields(rng, T, 3)) * 2.6  # mixed CFL band
    fields = _rand_fields(rng, T, 2)
    ref_f, ref_b, _ = adv._advect_vmem(topo, vel_arr, fields, 1.0, None)
    monkeypatch.setattr(pb, "COMBINE_TBL", True)
    got_f, got_b, _ = adv._advect_vmem(topo, vel_arr, fields, 1.0, None)
    assert jnp.array_equal(ref_f, got_f)
    assert jnp.array_equal(ref_b, got_b)


@pytest.mark.slow  # COMBINE_TBL is default-off (measured negative, NOTES r4 fact 50)
def test_combine_kernel_velocity_share_bitexact(monkeypatch):
    """Velocity self-advection in the mixed band with the combine kernel
    on (shared 27-table feeds the dual combine AND the wide forward pass,
    f_lo == 0) matches the default path bit-for-bit."""
    from hnanosolver_tpu.core.topology import ensure_dual_local

    rng = np.random.default_rng(26)
    topo = ensure_dual_local(build_topology_dense((16, 16, 16)))
    T = topo.capacity
    vel_arr = jnp.stack(_rand_fields(rng, T, 3)) * 2.6
    ref = adv.advect_velocity(topo, vel_arr, 1.0, 1.0)
    monkeypatch.setattr(pb, "COMBINE_TBL", True)
    got = adv.advect_velocity(topo, vel_arr, 1.0, 1.0)
    assert jnp.array_equal(ref, got)


def test_mixed_fwd_narrow_matches_wide():
    """Uniform mixed-band flow: CFL 2.6 puts the dispatch in the mixed
    branch, and the re-traced displacements stay narrow (|d2| <= CFL),
    so the forward pass runs the win16 dual kernel off the back pass's
    table. Must match the multi-pass wide reference."""
    rng = np.random.default_rng(27)
    topo = build_topology_dense((24, 24, 24))
    T = topo.capacity
    vel_arr = jnp.stack([
        jnp.full((T, 512), 2.6, jnp.float32),
        jnp.full((T, 512), -2.2, jnp.float32),
        jnp.full((T, 512), 2.4, jnp.float32),
    ])
    fields = _rand_fields(rng, T, 2)
    pf_m, pb_m, _ = adv._advect_vmem(topo, vel_arr, fields, 1.0, None)
    pf_w, pb_w, _ = adv._advect_vmem_wide(topo, vel_arr, fields, 1.0, None)
    assert float(jnp.max(jnp.abs(pf_m - pf_w))) < ATOL
    assert float(jnp.max(jnp.abs(pb_m - pb_w))) < ATOL


def test_mixed_fwd_narrow_velocity_matches_wide():
    """Same dispatch check for velocity self-advection (f_lo=0): uniform
    mixed-band flow -> back win16 + narrow re-traced forward win16.
    advect_velocity (the mixed dispatch) vs the multi-pass wide sampler
    through the same limiter."""
    topo = build_topology_dense((24, 24, 24))
    T = topo.capacity
    vel_arr = jnp.stack([
        jnp.full((T, 512), -2.5, jnp.float32),
        jnp.full((T, 512), 2.1, jnp.float32),
        jnp.full((T, 512), -2.3, jnp.float32),
    ])
    comps = [vel_arr[0], vel_arr[1], vel_arr[2]]
    pf_m, pb_m, _ = adv._advect_vmem(
        topo, vel_arr, comps, 1.0, None, fields_are_velocity=True)
    pf_w, pb_w, _ = adv._advect_vmem_wide(
        topo, vel_arr, comps, 1.0, None, fields_are_velocity=True)
    assert float(jnp.max(jnp.abs(pf_m - pf_w))) < ATOL
    assert float(jnp.max(jnp.abs(pb_m - pb_w))) < ATOL


def test_mixed_sliced_guard_matches_wide(monkeypatch):
    """When the table-memory governor slices the call (at-scale config),
    the mixed dispatch must skip table prebuilds/narrow-forward and still
    match the wide reference."""
    monkeypatch.setattr(pb, "TABLE_BYTES_BUDGET", 64 * 1024)  # force slices
    rng = np.random.default_rng(28)
    topo = build_topology_dense((24, 24, 24))
    T = topo.capacity
    vel_arr = jnp.stack([
        jnp.full((T, 512), 2.6, jnp.float32),
        jnp.full((T, 512), -2.2, jnp.float32),
        jnp.full((T, 512), 2.4, jnp.float32),
    ])
    fields = _rand_fields(rng, T, 2)
    pf_m, pb_m, _ = adv._advect_vmem(topo, vel_arr, fields, 1.0, None)
    monkeypatch.setattr(pb, "TABLE_BYTES_BUDGET", 2 * 1024**3)
    pf_w, pb_w, _ = adv._advect_vmem_wide(topo, vel_arr, fields, 1.0, None)
    assert float(jnp.max(jnp.abs(pf_m - pf_w))) < ATOL
    assert float(jnp.max(jnp.abs(pb_m - pb_w))) < ATOL
