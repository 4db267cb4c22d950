"""Combustion and buoyancy — elementwise field updates.

- combustion_oxygen: `/root/reference/src/Cuda/Kernel.cu:923-966`.
  Oxygen-limited burn; adds volume expansion into the divergence field
  *before* the pressure solve (that is how the reference creates the
  fireball "push").
- temperature_buoyancy: `/root/reference/src/Cuda/Kernel.cu:831-847`.
  u.y += max(0, T - T_ambient) * buoyancy * dt.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

FUEL_THRESHOLD = 0.001  # Kernel.cu:936


def combustion_oxygen(
    fuel: jax.Array,
    waste: jax.Array,
    temperature: jax.Array,
    flame: jax.Array,
    div: jax.Array,
    temp_gain: float,
    expansion: float,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (fuel, waste, temperature, flame, divergence) after burning."""
    fuel = jnp.where(fuel < FUEL_THRESHOLD, 0.0, fuel)
    oxygen = 1.0 - fuel - waste
    valid = oxygen >= 0.0  # negative oxygen = invalid state, copy through
    burn = jnp.where(valid, jnp.minimum(oxygen, fuel), 0.0)

    new_fuel = fuel - burn
    new_waste = waste + burn * 2.0  # fuel + oxygen consumed
    new_flame = jnp.where(
        valid, jnp.maximum(flame, jnp.minimum(1.0, burn * 10.0)), flame
    )
    new_temp = temperature + burn * temp_gain
    new_div = div + burn * expansion
    return new_fuel, new_waste, new_temp, new_flame, new_div


def temperature_buoyancy(
    vel: jax.Array,
    temperature: jax.Array,
    dt: float,
    ambient_temp: float,
    buoyancy_strength: float,
) -> jax.Array:
    """Add upward buoyancy where T exceeds ambient (y-up, like the reference).
    vel is channel-major [3,T,512]."""
    lift = jnp.maximum(0.0, temperature - ambient_temp) * buoyancy_strength * dt
    return vel.at[1].add(lift)
