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
