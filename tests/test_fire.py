"""Fire scenario: combustion actually burns, flame appears, fireball rises."""

import jax.numpy as jnp
import numpy as np
import pytest

from hnanosolver_tpu.models.fire import FireConfig, default_params, run_fire


@pytest.mark.slow
def test_fireball_ignites_and_rises():
    cfg = FireConfig(center=(24.0, 8.0, 24.0), radius=8.0)
    params = default_params().replace(iterations=8, dt=0.1)
    topo, state = run_fire(5, params=params, cfg=cfg)
    flame = state.scalars["flame"]
    waste = state.scalars["waste"]
    temp = state.scalars["temperature"]
    assert float(jnp.max(flame)) > 0.3        # combustion produced flame
    assert float(jnp.sum(waste)) > 0.0        # fuel+oxygen consumed
    assert float(jnp.max(temp)) > 85.0        # heat released above burner floor
    # hot gas above the burner
    from hnanosolver_tpu.core.layout import positions_flat

    py = positions_flat(topo)[1].astype(jnp.float32)
    hot_y = jnp.where(temp > 50.0, py, -1e9)
    assert float(jnp.max(hot_y)) > 10.0
    assert np.isfinite(np.asarray(state.velocity)).all()
