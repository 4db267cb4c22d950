"""Per-phase step profiling on real TPU — the chain-slope method.

The reference times every kernel per cook with cudaEvents and a bytes/voxel
bandwidth model (`/root/reference/src/Cuda/Utils.cuh:246-277`, call sites
`/root/reference/src/Cuda/HNanoSolver.cu:163-343`). Under the axon tunnel,
single-call timing is useless (±0.5-1 s D2H jitter), so each phase is timed
as the SLOPE between a short and a long on-device `lax.fori_loop` chain of
that phase alone, min-of-N each — the same estimator bench.py uses for the
full step.

Each phase body is closed so its output feeds its input (a real data
dependence, so XLA cannot dead-code or overlap the iterations).

Produces the table committed as PROFILE_r{N}.md (VERDICT round-1 item 3).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp


def time_chained(fn: Callable, x0, lo: int = 2, hi: int = 10, repeats: int = 4):
    """Seconds per iteration of ``fn`` via the chain-slope estimator.

    ``fn`` must map a pytree to a like pytree (dtype/shape stable).
    """

    @jax.jit
    def chain(x, k):
        return jax.lax.fori_loop(0, k, lambda _, v: fn(v), x)

    def pull(tree):
        jax.block_until_ready(tree)
        import numpy as np

        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    k_lo, k_hi = jnp.asarray(lo), jnp.asarray(hi)
    pull(chain(x0, k_lo))  # compile + warm
    pull(chain(x0, k_hi))

    def best(k):
        b = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            pull(chain(x0, k))
            b = min(b, time.perf_counter() - t0)
        return b

    return max(best(k_hi) - best(k_lo), 1e-9) / (hi - lo)


def phase_functions(topo, state, params) -> List[Tuple[str, Callable, object]]:
    """(name, body, x0) per pipeline phase, each self-chaining.

    Bodies perturb their input from their output so chained iterations carry
    a true data dependence without changing the phase's work shape.
    """
    from hnanosolver_tpu.ops import advection as adv
    from hnanosolver_tpu.ops import collision as col  # noqa: F401
    from hnanosolver_tpu.ops import combustion as comb
    from hnanosolver_tpu.ops import pressure as prs
    from hnanosolver_tpu.ops import stencil as stn

    inv_dx = params.inv_voxel_size
    dt = params.dt
    c = params.combustion
    # same tier mapping as solver.step_impl
    fast = {"parity": "strict", "balanced": "balanced", "fast": "fast"}.get(
        params.precision, "strict"
    )
    vel = state.velocity
    scal = {k: v for k, v in state.scalars.items() if k != "collision_sdf"}
    div0 = stn.divergence(topo, vel, inv_dx)

    phases: List[Tuple[str, Callable, object]] = []

    phases.append((
        "advect_velocity (BFECC)",
        lambda v: adv.advect_velocity(topo, v, dt, inv_dx, None, fast=fast),
        vel,
    ))
    phases.append((
        "vorticity_confinement",
        lambda v: stn.vorticity_confinement(
            topo, v, dt, inv_dx, max(c.vorticity_scale, 0.1), c.factor_scale
        ),
        vel,
    ))
    phases.append((
        "divergence",
        lambda v: v + 1e-9 * stn.divergence(topo, v, inv_dx)[None],
        vel,
    ))
    phases.append((
        "combustion+buoyancy",
        lambda args: (lambda f, w, t, fl, d: (
            f, w,
            comb.temperature_buoyancy(
                jnp.stack([t, t, t]), t, dt, c.ambient_temp, c.buoyancy_strength
            )[1],
            fl, d,
        ))(*comb.combustion_oxygen(
            args[0], args[1], args[2], args[3], args[4],
            c.temperature_release, c.expansion_rate,
        )),
        (scal["fuel"], scal["waste"], scal["temperature"], scal["flame"], div0),
    ))
    phases.append((
        f"pressure ({params.iterations} RBGS iters)",
        lambda d: 1e-9 * d + prs.solve_pressure(
            topo, d, params.iterations, params.voxel_size, params.omega
        ),
        div0,
    ))
    phases.append((
        "subtract_pressure_gradient",
        lambda v: stn.subtract_pressure_gradient(topo, v, div0, inv_dx),
        vel,
    ))

    names = sorted(scal)
    stacked = jnp.stack([scal[k] for k in names])

    def adv_scal(s):
        outs = adv.advect_scalars_fused(
            topo, vel, {k: s[i] for i, k in enumerate(names)}, dt, inv_dx,
            None, fast=fast
        )
        return jnp.stack([outs[k] for k in names])

    phases.append((f"advect_scalars ({len(names)} fields, fused)", adv_scal, stacked))
    return phases


def profile(topo, state, params, lo=2, hi=10, repeats=4) -> Dict[str, float]:
    """{phase name: seconds} for each pipeline phase, plus 'full step'."""
    from hnanosolver_tpu.solver import step

    out: Dict[str, float] = {}
    for name, fn, x0 in phase_functions(topo, state, params):
        out[name] = time_chained(fn, x0, lo, hi, repeats)
    out["FULL STEP"] = time_chained(
        lambda s: step(topo, s, params), state, lo, hi, repeats
    )
    return out


def markdown_table(times: Dict[str, float], voxels: int) -> str:
    total = times.get("FULL STEP", sum(times.values()))
    lines = [
        "| phase | ms | % of step | Mvox/s |",
        "|---|---|---|---|",
    ]
    for name, t in times.items():
        lines.append(
            f"| {name} | {t * 1e3:.2f} | {100 * t / total:.1f}% "
            f"| {voxels / t / 1e6:.1f} |"
        )
    return "\n".join(lines)
