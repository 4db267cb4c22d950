"""On-TPU numeric parity artifact: Pallas kernels vs their XLA formulations
on REAL hardware (the CPU test suite runs Pallas with interpret=True, which
cannot catch Mosaic-vs-interpret divergences — round-1 VERDICT weakness 5;
this caught the silent bf16 MXU default in round 2).

Run standalone (claims the TPU) or exec via tools/tpu_submit.py. Writes the
markdown table to stdout; the committed artifact is PARITY_TPU_r{N}.md.
"""

from __future__ import annotations

import sys


def run(write=print):
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from bench import build_plume_envelope
    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.models.plume import PlumeConfig, plume_step
    from hnanosolver_tpu.ops import advection as adv
    from hnanosolver_tpu.ops import pressure as prs
    from hnanosolver_tpu.ops import stencil as stn
    from hnanosolver_tpu.ops.pallas_pressure import (
        solve_pressure_fused,
        solve_pressure_lagged,
        solve_pressure_pallas,
    )

    dev = jax.devices()[0]
    params = SolverParams(dt=1.0 / 24.0, iterations=50, voxel_size=0.5)
    cfg = PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
    topo = build_topology(build_plume_envelope())
    state = zeros_state(topo)
    for _ in range(3):
        state = plume_step(topo, state, params, cfg)
    vel = state.velocity
    scal = {k: v for k, v in state.scalars.items() if k != "collision_sdf"}
    div = stn.divergence(topo, vel, params.inv_voxel_size)
    dxv, om = params.voxel_size, params.omega

    rows = []

    def rel(err, scale):
        return err / max(scale, 1e-30)

    # --- interp kernel (vmem) vs the 8-corner gather oracle, per tier -----
    adv.INTERP = "gather"
    oracle = adv.advect_scalars_fused(
        topo, vel, scal, params.dt, params.inv_voxel_size, None
    )
    adv.INTERP = None
    scale = max(float(jnp.max(jnp.abs(oracle[k]))) for k in oracle)
    for tier in ("strict", "balanced", "fast"):
        got = adv.advect_scalars_fused(
            topo, vel, scal, params.dt, params.inv_voxel_size, None, fast=tier
        )
        err = max(float(jnp.max(jnp.abs(got[k] - oracle[k]))) for k in oracle)
        rows.append((f"advect_scalars fused megakernel ({tier})",
                     err, rel(err, scale)))
    # force each megakernel tier through the runtime cond (the developed
    # plume at 3 steps is narrow-eligible; flip the limit to cover both)
    from hnanosolver_tpu.ops import pallas_bfecc as pb

    for lim, label in ((1e9, "16-window"), (-1.0, "24-window")):
        old_lim = pb.CFL_LIMIT
        pb.CFL_LIMIT = lim
        try:
            got = adv.advect_scalars_fused(
                topo, vel, scal, params.dt, params.inv_voxel_size, None,
                fast="strict",
            )
        finally:
            pb.CFL_LIMIT = old_lim
        err = max(float(jnp.max(jnp.abs(got[k] - oracle[k]))) for k in oracle)
        rows.append((f"megakernel {label} forced (strict)",
                     err, rel(err, scale)))

    # --- pressure kernels vs the XLA roll+select formulation --------------
    p_ref = prs.solve_pressure(topo, div, 20, dxv, om, backend="xla")
    p_scale = float(jnp.max(jnp.abs(p_ref)))
    p_pal = solve_pressure_pallas(topo, div, 20, dxv, om, interpret=False)
    err = float(jnp.max(jnp.abs(p_pal - p_ref)))
    rows.append(("pressure per-sweep kernel (20 it)", err, rel(err, p_scale)))

    sub = topo  # fused kernel needs <= MAX_FUSED_ROWS; plume cap may exceed
    if topo.capacity <= 6500:
        p_f = solve_pressure_fused(topo, div, 20, dxv, om, interpret=False)
        err = float(jnp.max(jnp.abs(p_f - p_ref)))
        rows.append(("pressure fused whole-solve (20 it)",
                     err, rel(err, p_scale)))

    # lagged: residual-matched, not state-matched — report residual ratio
    r_ref = float(jnp.max(jnp.abs(prs.residual(topo, p_ref, div, dxv))))
    p_l = solve_pressure_lagged(topo, div, 20, dxv, om, 2, interpret=False)
    r_l = float(jnp.max(jnp.abs(prs.residual(topo, p_l, div, dxv))))
    rows.append(("pressure halo-lag2 (20 it, residual ratio vs textbook)",
                 r_l, r_l / max(r_ref, 1e-30)))

    write(f"device: {dev}, domain: {int(topo.n_active)} tiles "
          f"({topo.num_voxels / 1e6:.2f} M voxels), developed plume state")
    write("")
    write("| kernel | max abs err | rel (vs max |field|) |")
    write("|---|---|---|")
    for name, err, r in rows:
        write(f"| {name} | {err:.3e} | {r:.3e} |")
    return rows


if __name__ == "__main__":
    run()
