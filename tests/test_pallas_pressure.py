"""Fused Pallas color sweep vs the XLA red-black solver (interpret on CPU)."""

import jax.numpy as jnp
import numpy as np

from hnanosolver_tpu.core.topology import (
    active_mask,
    build_topology,
    build_topology_dense,
)
from hnanosolver_tpu.ops import pressure as prs
from hnanosolver_tpu.ops.pallas_pressure import solve_pressure_pallas


def _check(topo, rng, iters=6):
    div = jnp.asarray(
        rng.standard_normal((topo.capacity, 512)).astype(np.float32)
    ) * active_mask(topo)[:, None]
    dx, omega = 0.25, 1.17
    want = prs.solve_pressure(topo, div, iters, dx, omega)
    got = solve_pressure_pallas(topo, div, iters, dx, omega, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_pallas_pressure_dense(rng):
    _check(build_topology_dense((16, 16, 16)), rng)


def test_pallas_pressure_sparse(rng):
    tiles = [(x, y, z) for x in range(4) for y in range(3) for z in range(2)
             if (x * 7 + y * 3 + z) % 5 != 4]
    _check(build_topology(np.array(tiles, np.int32)), rng)


def test_fused_whole_solve_matches_xla(rng):
    from hnanosolver_tpu.ops.pallas_pressure import solve_pressure_fused

    topo = build_topology_dense((16, 16, 16))
    div = jnp.asarray(
        rng.standard_normal((topo.capacity, 512)).astype(np.float32)
    ) * active_mask(topo)[:, None]
    dx, omega = 0.25, 1.17
    want = prs.solve_pressure(topo, div, 5, dx, omega)
    got = solve_pressure_fused(topo, div, 5, dx, omega, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # masked (multigrid coarse-level) variant
    mask = (jnp.asarray(rng.random((topo.capacity, 512))) > 0.3).astype(
        jnp.float32
    )
    want_m = prs.solve_pressure(topo, div, 4, dx, omega, mask=mask)
    got_m = solve_pressure_fused(
        topo, div, 4, dx, omega, interpret=True, mask=mask
    )
    np.testing.assert_allclose(
        np.asarray(got_m), np.asarray(want_m), atol=1e-6
    )


def test_lagged_sweeps_residual_matches_textbook(rng):
    """halo_lag sweeps are a different (chaotic-class) relaxation ORDER, so
    compare by residual: lagged with a few extra iterations must reach the
    textbook 12-iteration residual."""
    from hnanosolver_tpu.ops.pallas_pressure import solve_pressure_lagged

    topo = build_topology_dense((24, 24, 24))
    div = jnp.asarray(
        rng.standard_normal((topo.capacity, 512)).astype(np.float32)
    ) * active_mask(topo)[:, None]
    dx, omega = 0.25, 1.0

    def rl2(p):
        return float(
            jnp.sqrt(jnp.sum(prs.residual(topo, p, div, dx) ** 2))
        )

    r_ref = rl2(prs.solve_pressure(topo, div, 12, dx, omega))
    r_lag = rl2(
        solve_pressure_lagged(topo, div, 14, dx, omega, 2, interpret=True)
    )
    assert r_lag <= r_ref * 1.02, (r_lag, r_ref)


def test_pair_blocks_residual_close_to_textbook(rng):
    """pair_blocks (lagged kernel, halo per red+black pair) must converge
    like the textbook per-color path — only the black half-sweep's halo is
    stale by one half-sweep (the MG smoothing mode)."""
    import jax.numpy as jnp

    from hnanosolver_tpu.core.topology import build_topology_dense
    from hnanosolver_tpu.ops.pallas_pressure import solve_pressure_lagged
    from hnanosolver_tpu.ops.pressure import residual, solve_pressure

    topo = build_topology_dense((16, 16, 16))
    div = jnp.asarray(
        rng.standard_normal((topo.capacity, 512)).astype("float32")
    )
    # omega ~1 (the production value: 2/(1+sin(pi*0.5)) = 1.0) — SOR
    # over-relaxation amplifies the stale cross-tile coupling (omega 1.6
    # measured 26x worse residual on this tiny all-boundary box)
    dx, omega, iters = 0.5, 1.0, 10
    ref = solve_pressure(topo, div, iters, dx, omega, backend="xla")
    got = solve_pressure_lagged(topo, div, iters, dx, omega, 1,
                                interpret=True)
    r_ref = float(jnp.max(jnp.abs(residual(topo, ref, div, dx))))
    r_got = float(jnp.max(jnp.abs(residual(topo, got, div, dx))))
    assert r_got <= 1.3 * r_ref + 1e-4, (r_got, r_ref)


def test_planes_halo_bitwise(rng):
    """Packed-plane lagged halo (PLANES_HALO) is bit-identical to the
    full-face lagged path: same fix values on the boundary lanes (one-hot
    MXU placement is exact), same sweep order."""
    from hnanosolver_tpu.ops import pallas_pressure as pp

    tiles = [(x, y, z) for x in range(4) for y in range(3) for z in range(3)
             if (x + 2 * y + z) % 7 != 5]
    topo = build_topology(np.array(tiles, np.int32), capacity=64)
    div = jnp.asarray(
        rng.standard_normal((topo.capacity, 512)).astype(np.float32)
    ) * active_mask(topo)[:, None]
    mask = (jnp.asarray(rng.random((topo.capacity, 512))) > 0.3).astype(
        jnp.float32
    )
    old = pp.PLANES_HALO
    try:
        for kw in ({"halo_lag": 5, "iterations": 10},
                   {"halo_lag": 1, "iterations": 4},
                   {"halo_lag": 2, "iterations": 4, "mask": mask}):
            it = kw.pop("iterations")
            lag = kw.pop("halo_lag")
            pp.PLANES_HALO = False
            a = pp.solve_pressure_lagged(
                topo, div, it, 0.25, 1.17, lag, interpret=True, **kw)
            pp.PLANES_HALO = True
            b = pp.solve_pressure_lagged(
                topo, div, it, 0.25, 1.17, lag, interpret=True, **kw)
            assert bool(jnp.all(a == b)), (lag, it, kw)
    finally:
        pp.PLANES_HALO = old
