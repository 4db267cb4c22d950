"""Fire / combustion scenario (BASELINE config 3 class): a fuel-rich burner
emits fuel + heat; oxygen-limited combustion releases temperature, expansion
pushes divergence, buoyancy and vorticity confinement shape the fireball.
Exercises the full reference pipeline including the combustion fields the
smoke plume barely uses (`/root/reference/src/Cuda/Kernel.cu:923-966`)."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hnanosolver_tpu.config import CombustionParams, SolverParams
from hnanosolver_tpu.core import coords as C
from hnanosolver_tpu.core.activation import expand_for_state
from hnanosolver_tpu.core.layout import positions_flat
from hnanosolver_tpu.core.topology import (
    Topology,
    active_mask,
    build_topology,
)
from hnanosolver_tpu.fields import FieldState, zeros_state
from hnanosolver_tpu.solver import step


@dataclasses.dataclass(frozen=True)
class FireConfig:
    """Burner disk on the ground plane, default params tuned for a fireball."""

    center: Tuple[float, float, float] = (64.0, 8.0, 64.0)
    radius: float = 14.0
    height: float = 4.0  # burner slab thickness in voxels
    fuel_rate: float = 4.0  # fuel injected per second
    ignition_temp: float = 80.0  # burner floor temperature
    swirl: float = 2.0  # tangential velocity seed for interesting motion
    dilate_radius: int = 1
    occupancy_threshold: float = 1e-3
    # voxel-granularity dilation (the reference SOP's "padding" param,
    # SOP_HNanoSolver.cpp:188-199); None = tile-granularity dilate_radius
    padding: "int | None" = None


def default_params() -> SolverParams:
    return SolverParams(
        dt=1.0 / 24.0,
        voxel_size=0.5,
        iterations=24,
        combustion=CombustionParams(
            expansion_rate=0.6,
            temperature_release=25.0,
            buoyancy_strength=2.0,
            ambient_temp=23.0,
            vorticity_scale=2.0,
            factor_scale=1.0,  # integer offset -> confinement actually acts
        ),
    )


def burner_tiles(cfg: FireConfig, pad: int = 1) -> np.ndarray:
    c = np.asarray(cfg.center)
    r = cfg.radius + pad * C.LEAF
    lo = np.floor((c - [r, cfg.height + 8, r]) / C.LEAF).astype(np.int32)
    hi = np.ceil((c + [r, cfg.height + 8, r]) / C.LEAF).astype(np.int32)
    gx, gy, gz = np.meshgrid(*(np.arange(l, h + 1) for l, h in zip(lo, hi)), indexing="ij")
    return np.stack([gx, gy, gz], -1).reshape(-1, 3)


def initial(cfg: FireConfig, capacity: Optional[int] = None):
    topo = build_topology(burner_tiles(cfg), capacity=capacity)
    return topo, zeros_state(topo)


def emit(topo: Topology, state: FieldState, cfg: FireConfig, dt: float) -> FieldState:
    px, py, pz = (p.astype(jnp.float32) for p in positions_flat(topo))
    dx = px - cfg.center[0]
    dz = pz - cfg.center[2]
    r2 = dx * dx + dz * dz
    in_disk = (r2 < cfg.radius**2) & (jnp.abs(py - cfg.center[1]) < cfg.height)
    inside = in_disk.astype(jnp.float32) * active_mask(topo)[:, None]

    s = dict(state.scalars)
    s["fuel"] = jnp.minimum(s["fuel"] + inside * (cfg.fuel_rate * dt), 1.0)
    s["temperature"] = jnp.maximum(s["temperature"], inside * cfg.ignition_temp)
    s["density"] = s["density"] + inside * dt  # soot proxy
    # swirl seed: tangential velocity around the burner axis
    rinv = jax.lax.rsqrt(r2 + 1.0)
    vel = state.velocity
    vel = vel.at[0].add(inside * cfg.swirl * (-dz) * rinv * dt)
    vel = vel.at[2].add(inside * cfg.swirl * dx * rinv * dt)
    return FieldState(velocity=vel, scalars=s)


def _fire_step(
    topo: Topology,
    state: FieldState,
    params: SolverParams,
    cfg: FireConfig,
    hierarchy: tuple = (),
) -> FieldState:
    return step(topo, emit(topo, state, cfg, params.dt), params, hierarchy)


fire_step = partial(jax.jit, static_argnames=("params", "cfg"))(_fire_step)
# frame-loop variant: donates the input state (see models.plume)
fire_step_donated = partial(
    jax.jit, static_argnames=("params", "cfg"), donate_argnums=(1,)
)(_fire_step)


def run_fire(frames: int, params=None, cfg=None, topo=None, state=None,
             grow_every: int = 1, on_frame=None):
    params = params or default_params()
    cfg = cfg or FireConfig()
    if topo is None:
        topo, state = initial(cfg)
    keep = burner_tiles(cfg)
    from hnanosolver_tpu.ops.multigrid import hierarchy_for

    hier = hierarchy_for(topo, params)
    for f in range(frames):
        state = fire_step_donated(topo, state, params, cfg, hier)
        if grow_every and (f + 1) % grow_every == 0:
            prev = topo
            topo, state = expand_for_state(
                topo, state, threshold=cfg.occupancy_threshold,
                radius=cfg.dilate_radius, keep_tiles=keep,
                padding=cfg.padding,
            )
            if topo is not prev:
                hier = hierarchy_for(topo, params)
        if on_frame is not None:
            on_frame(f, topo, state)
    return topo, state
