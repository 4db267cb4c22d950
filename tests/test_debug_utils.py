"""Determinism / NaN-guard / invariant checks (SURVEY §5.2 equivalents)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hnanosolver_tpu.config import SolverParams
from hnanosolver_tpu.core.topology import active_mask, build_topology_dense, voxel_positions
from hnanosolver_tpu.fields import zeros_state
from hnanosolver_tpu.solver import step
from hnanosolver_tpu.utils.debug import (
    assert_finite_state,
    check_background_invariant,
    check_determinism,
    finite_fraction,
    nan_guard,
)


def _state(topo):
    from hnanosolver_tpu.core.layout import positions_flat

    state = zeros_state(topo)
    px, py, _ = (p.astype(jnp.float32) for p in positions_flat(topo))
    m = active_mask(topo)[:, None]
    blob = jnp.exp(-((px - 8) ** 2 + (py - 8) ** 2) / 20.0) * m
    return state.with_scalar("density", blob).with_scalar(
        "temperature", (23.0 + 30 * blob) * m
    )


def test_step_is_deterministic_and_finite():
    topo = build_topology_dense((16, 16, 16))
    state = _state(topo)
    params = SolverParams(dt=0.25, iterations=4)
    check_determinism(lambda s: step(topo, s, params), state)
    out = step(topo, state, params)
    assert_finite_state(out, "after step")
    check_background_invariant(topo, out)
    assert all(v == 1.0 for v in finite_fraction(out).values())


def test_nan_guard_raises():
    topo = build_topology_dense((8, 8, 8))
    state = _state(topo)
    bad = state.with_scalar(
        "density", state.scalars["density"].at[1, 0].set(jnp.nan)
    )
    with pytest.raises(FloatingPointError):
        nan_guard(bad)


def test_background_invariant_catches_violation():
    topo = build_topology_dense((8, 8, 8))
    state = _state(topo)
    bad = state.with_scalar(
        "density", state.scalars["density"].at[0, 0].set(1.0)
    )
    with pytest.raises(AssertionError):
        check_background_invariant(topo, bad)


def test_cfl_clamp_detection(rng):
    """Fast flows (|u| dt/dx >= 7) silently deviate from the reference's
    unbounded backtrace (Kernel.cu:139) — the debug check must count and
    (on request) raise on them; slow flows must report zero."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.core.topology import active_mask, build_topology_dense
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.utils.debug import check_cfl

    topo = build_topology_dense((16, 16, 16))
    state = zeros_state(topo)
    params = SolverParams(dt=1.0, voxel_size=0.5)  # dt/dx = 2
    m = active_mask(topo)[:, None]
    slow = state.replace(
        velocity=jnp.ones((3, topo.capacity, 512)) * 0.5 * m[None]
    )
    assert check_cfl(topo, slow, params) == 0

    vel = jnp.zeros((3, topo.capacity, 512)).at[1, 5, :8].set(10.0)
    fast = state.replace(velocity=vel * m[None])
    n = check_cfl(topo, fast, params)
    assert n == 8, n
    with pytest.raises(RuntimeError, match="CFL clamp"):
        check_cfl(topo, fast, params, raise_on_clamp=True)
