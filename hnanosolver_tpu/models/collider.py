"""Moving-collider scenario: a plume with an ANIMATED solid (BASELINE
config 4).

The reference has no collider animation of its own — Houdini feeds a fresh
collision SDF into SOP input 2 every cook and `enforceCollisionBoundaries`
is re-applied with whatever Houdini animated in
(`/root/reference/src/Cuda/Kernel.cu:77-116`,
`SOP_HNanoSolver.cpp:105-181`). Here the same contract is native: the
``collision_sdf`` field is re-evaluated ON DEVICE each frame from an
analytic translating sphere, so the per-frame step stays jitted (the
collider position is a traced argument — no recompiles as it moves).
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
from hnanosolver_tpu.core.topology import Topology
from hnanosolver_tpu.fields import FieldState
from hnanosolver_tpu.models import plume as P


@dataclasses.dataclass(frozen=True)
class ColliderConfig:
    """A sphere translating at constant velocity (index-space units, like
    PlumeConfig): center(frame) = center0 + velocity * frame * dt."""

    center0: Tuple[float, float, float] = (100.0, 64.0, 128.0)
    velocity: Tuple[float, float, float] = (48.0, 0.0, 0.0)  # voxels/sec
    radius: float = 12.0


def sphere_sdf(topo: Topology, center: jax.Array, radius: float) -> jax.Array:
    """Index-space signed distance to a sphere at ``center`` (traced
    [3] array), [T,512]. The device-side per-frame SDF evaluation that
    replaces Houdini's animated input-2 grid."""
    px, py, pz = (p.astype(jnp.float32) for p in positions_flat(topo))
    d = jnp.sqrt(
        (px - center[0]) ** 2 + (py - center[1]) ** 2 + (pz - center[2]) ** 2
    )
    return d - radius


def collider_center(col: ColliderConfig, frame, dt: float) -> jax.Array:
    c0 = jnp.asarray(col.center0, jnp.float32)
    v = jnp.asarray(col.velocity, jnp.float32)
    return c0 + v * (jnp.asarray(frame, jnp.float32) * dt)


def _collider_step(
    topo: Topology,
    state: FieldState,
    params: SolverParams,
    cfg: P.PlumeConfig,
    col: ColliderConfig,
    frame: jax.Array,
    hierarchy: tuple = (),
) -> FieldState:
    """Emit + refresh the animated SDF + one solver step. ``frame`` is a
    traced scalar: the moving collider never retriggers compilation."""
    center = collider_center(col, frame, params.dt)
    state = state.with_scalar("collision_sdf",
                              sphere_sdf(topo, center, col.radius))
    state = P.emit(topo, state, cfg, params.dt)
    from hnanosolver_tpu.solver import step

    return step(topo, state, params, hierarchy)


collider_step = partial(
    jax.jit, static_argnames=("params", "cfg", "col"))(_collider_step)
# frame-loop variant: donates the input state (see models.plume)
collider_step_donated = partial(
    jax.jit, static_argnames=("params", "cfg", "col"), donate_argnums=(1,)
)(_collider_step)


def collider_tiles(col: ColliderConfig, frame: int, dt: float,
                   shell: float = 2.0) -> np.ndarray:
    """Host-side tile coords overlapping the collider's boundary shell at
    ``frame`` — kept active so the no-slip boundary stays resolved even
    where the plume hasn't reached yet."""
    c = np.asarray(col.center0) + np.asarray(col.velocity) * (frame * dt)
    r = col.radius + shell * C.LEAF
    lo = np.floor((c - r) / C.LEAF).astype(np.int32)
    hi = np.ceil((c + r) / C.LEAF).astype(np.int32)
    gx, gy, gz = np.meshgrid(
        *(np.arange(l, h + 1) for l, h in zip(lo, hi)), indexing="ij")
    tiles = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    tc = (tiles + 0.5) * C.LEAF
    keep = np.linalg.norm(tc - c, axis=-1) <= r + C.LEAF
    return tiles[keep]


def run_collider(
    frames: int,
    params: Optional[SolverParams] = None,
    cfg: Optional[P.PlumeConfig] = None,
    col: Optional[ColliderConfig] = None,
    topo: Optional[Topology] = None,
    state: Optional[FieldState] = None,
    grow_every: int = 1,
    on_frame=None,
    interrupter=None,
):
    """Host driver: per-frame jitted step with the animated SDF; topology
    growth keeps both the emitter and the (moving) collider shell active.
    Mirrors models.plume.run_plume."""
    params = (params or SolverParams())
    params = dataclasses.replace(params, has_collision=True)
    cfg = cfg or P.PlumeConfig()
    col = col or ColliderConfig()
    if topo is None:
        topo = P.build_topology(np.concatenate(
            [P.emitter_tiles(cfg, pad=1), collider_tiles(col, 0, params.dt)]))
    if state is None:
        state = P.initial_state(topo)
    if "collision_sdf" not in state.scalars:
        state = state.with_scalar(
            "collision_sdf",
            sphere_sdf(topo, collider_center(col, 0, params.dt), col.radius))
    from hnanosolver_tpu.ops.multigrid import hierarchy_for

    hier = hierarchy_for(topo, params)
    for f in range(frames):
        if interrupter is not None and interrupter.was_interrupted():
            break
        state = collider_step_donated(topo, state, params, cfg, col,
                                      jnp.asarray(f, jnp.float32), hier)
        if grow_every and (f + 1) % grow_every == 0:
            keep = np.concatenate([
                P.emitter_tiles(cfg, pad=1),
                collider_tiles(col, f + 1, params.dt),
            ])
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
