"""Dense full-step oracle: same pipeline order as hnanosolver_tpu.solver.step
(`/root/reference/src/Cuda/HNanoSolver.cu:150-356`), on plain dense arrays.
No collision support (collision parity is tested on the sparse path against
analytic invariants)."""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

from hnanosolver_tpu.config import SolverParams
from hnanosolver_tpu.dense import ops as D


@partial(jax.jit, static_argnames=("params",))
def step_dense(
    vel: jax.Array, scalars: Dict[str, jax.Array], params: SolverParams
):
    """One step; returns (vel, scalars). Scalars must include the combustion
    fields fuel/waste/temperature/flame (reference contract)."""
    c = params.combustion
    inv_dx = params.inv_voxel_size
    dt = params.dt

    u_star = D.advect_bfecc(vel, vel, dt, inv_dx)
    u_star = D.vorticity_confinement(
        u_star, dt, inv_dx, c.vorticity_scale, c.factor_scale
    )
    div = D.divergence(u_star, inv_dx)

    fuel = jnp.where(scalars["fuel"] < 0.001, 0.0, scalars["fuel"])
    waste, temp, flame = scalars["waste"], scalars["temperature"], scalars["flame"]
    oxygen = 1.0 - fuel - waste
    valid = oxygen >= 0.0
    burn = jnp.where(valid, jnp.minimum(oxygen, fuel), 0.0)
    fuel = fuel - burn
    waste = waste + burn * 2.0
    flame = jnp.where(valid, jnp.maximum(flame, jnp.minimum(1.0, burn * 10.0)), flame)
    temp = temp + burn * c.temperature_release
    div = div + burn * c.expansion_rate

    lift = jnp.maximum(0.0, temp - c.ambient_temp) * c.buoyancy_strength * dt
    u_star = u_star.at[..., 1].add(lift)

    p = D.solve_pressure(div, params.iterations, params.voxel_size, params.omega)
    vel_out = D.subtract_pressure_gradient(u_star, p, inv_dx)

    out = dict(scalars)
    out.update(fuel=fuel, waste=waste, temperature=temp, flame=flame)
    out = {k: D.advect_bfecc(vel_out, v, dt, inv_dx) for k, v in out.items()}
    return vel_out, out
