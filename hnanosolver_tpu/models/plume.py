"""Rising smoke/fire plume — the flagship scenario (BASELINE configs 1-3).

Mirrors the reference's canonical use: a sphere emitter sources density,
temperature and fuel each frame (the Houdini sourcing input, composited via
compSum — `/root/reference/src/SOP/HNanoSolver/SOP_HNanoSolver.cpp:161-181`),
the solver advects/projects, and the topology grows with the plume
(per-frame leaf activation, the reference's per-cook domain rebuild).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hnanosolver_tpu.config import SolverParams
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
class PlumeConfig:
    """Emitter + domain description; defaults give a 256^3-class plume."""

    center: Tuple[float, float, float] = (128.0, 24.0, 128.0)
    radius: float = 20.0
    density_rate: float = 2.0  # density added per second inside the emitter
    fuel_rate: float = 1.0
    temperature_target: float = 150.0  # emitter relaxes T toward this
    velocity_jet: float = 8.0  # upward velocity set inside the emitter
    dilate_radius: int = 1
    occupancy_threshold: float = 1e-3
    # voxel-granularity dilation (the reference SOP's "padding" param,
    # SOP_HNanoSolver.cpp:188-199); None = tile-granularity dilate_radius
    padding: "int | None" = None


def emitter_tiles(cfg: PlumeConfig, pad: int = 1) -> np.ndarray:
    """Tile coords covering the emitter sphere (+pad tiles)."""
    c = np.asarray(cfg.center)
    r = cfg.radius + pad * C.LEAF
    lo = np.floor((c - r) / C.LEAF).astype(np.int32)
    hi = np.ceil((c + r) / C.LEAF).astype(np.int32)
    gx, gy, gz = np.meshgrid(*(np.arange(l, h + 1) for l, h in zip(lo, hi)), indexing="ij")
    tiles = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    # keep only tiles whose center is within r + one tile diagonal
    tc = (tiles + 0.5) * C.LEAF
    keep = np.linalg.norm(tc - c, axis=-1) <= r + C.LEAF
    return tiles[keep]


def initial_topology(cfg: PlumeConfig, capacity: Optional[int] = None) -> Topology:
    return build_topology(emitter_tiles(cfg, pad=1), capacity=capacity)


def initial_state(topo: Topology) -> FieldState:
    return zeros_state(topo)


def emit(topo: Topology, state: FieldState, cfg: PlumeConfig, dt: float) -> FieldState:
    """Additive sourcing inside the emitter sphere (device-side, jit-safe).
    Flat layout: positions as three [T,512] arrays."""
    px, py, pz = (p.astype(jnp.float32) for p in positions_flat(topo))
    d2 = (
        (px - cfg.center[0]) ** 2
        + (py - cfg.center[1]) ** 2
        + (pz - cfg.center[2]) ** 2
    )
    inside = (d2 < cfg.radius**2).astype(jnp.float32) * active_mask(topo)[:, None]

    s = dict(state.scalars)
    s["density"] = s["density"] + inside * (cfg.density_rate * dt)
    s["fuel"] = jnp.minimum(s["fuel"] + inside * (cfg.fuel_rate * dt), 1.0)
    # emitter relaxes temperature toward its target (hot core)
    s["temperature"] = jnp.where(
        inside > 0,
        jnp.maximum(s["temperature"], cfg.temperature_target),
        s["temperature"],
    )
    vel = state.velocity.at[1].set(
        jnp.where(inside > 0, cfg.velocity_jet, state.velocity[1])
    )
    return FieldState(velocity=vel, scalars=s)


def _plume_step(
    topo: Topology,
    state: FieldState,
    params: SolverParams,
    cfg: PlumeConfig,
    hierarchy: tuple = (),
) -> FieldState:
    """Emit + one full solver step: the flagship jittable forward function.
    ``hierarchy``: from ``ops.multigrid.hierarchy_for`` when params selects
    the multigrid pressure solver."""
    state = emit(topo, state, cfg, params.dt)
    return step(topo, state, params, hierarchy)


plume_step = partial(jax.jit, static_argnames=("params", "cfg"))(_plume_step)
# frame-loop variant: the input state's buffers are DONATED (the old state
# is dead the moment the new one exists), halving resident field HBM —
# at 1024^3 that is the difference between fitting and OOM. Callers must
# not touch the passed state afterwards.
plume_step_donated = partial(
    jax.jit, static_argnames=("params", "cfg"), donate_argnums=(1,)
)(_plume_step)


def run_plume(
    frames: int,
    params: Optional[SolverParams] = None,
    cfg: Optional[PlumeConfig] = None,
    topo: Optional[Topology] = None,
    state: Optional[FieldState] = None,
    grow_every: int = 1,
    on_frame=None,
    interrupter=None,
):
    """Host driver loop: step, then (periodically) re-activate topology to
    follow the plume. Returns (topo, state).

    ``interrupter``: optional utils.interrupt.Interrupter, polled between
    frames (cooperative cancellation — the HoudiniInterrupter analog,
    SURVEY §5.3); on interruption the loop stops cleanly and returns the
    last completed state."""
    params = params or SolverParams()
    cfg = cfg or PlumeConfig()
    if topo is None:
        topo = initial_topology(cfg)
    if state is None:
        state = initial_state(topo)
    keep = emitter_tiles(cfg, pad=1)
    from hnanosolver_tpu.ops.multigrid import hierarchy_for

    hier = hierarchy_for(topo, params)
    for f in range(frames):
        if interrupter is not None and interrupter.was_interrupted():
            break
        state = plume_step_donated(topo, state, params, cfg, hier)
        if grow_every and (f + 1) % grow_every == 0:
            prev = topo
            topo, state = expand_for_state(
                topo,
                state,
                threshold=cfg.occupancy_threshold,
                radius=cfg.dilate_radius,
                keep_tiles=keep,
                padding=cfg.padding,
            )
            if topo is not prev:
                hier = hierarchy_for(topo, params)
        if on_frame is not None:
            on_frame(f, topo, state)
    return topo, state
