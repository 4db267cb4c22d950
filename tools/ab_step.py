"""Interleaved A/B step benchmark — the only estimator that survives the
tunneled chip's congestion windows.

Measures the full solver step with the fused BFECC megakernel path (the
default) against the multi-pass wide sampler (the pre-megakernel path) on
the bench plume, fully interleaved (A,B,A,B,... min-of-rounds): whole
multi-minute windows can run 2-3x slow, so only same-window RATIOS are
trustworthy. Chain-slope timing per bench.py.

Run via the persistent worker: python tools/tpu_submit.py ab tools/ab_step.py
(directly executing this file would fight the worker for the TPU claim).
"""

from __future__ import annotations

import time


def run(scale: int = 256, rounds: int = 4, write=print):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import ITERATIONS, build_plume_envelope
    from hnanosolver_tpu.config import SolverParams
    from hnanosolver_tpu.core.topology import build_topology
    from hnanosolver_tpu.fields import zeros_state
    from hnanosolver_tpu.models import plume as P
    from hnanosolver_tpu.ops import advection as adv
    from hnanosolver_tpu.solver import step_impl

    params = SolverParams(dt=1.0 / 24.0, iterations=ITERATIONS, voxel_size=0.5)
    if scale == 256:
        topo = build_topology(build_plume_envelope())
        cfg = P.PlumeConfig(center=(128.0, 24.0, 128.0), radius=20.0)
        klo, khi = 2, 10
    else:
        topo = build_topology(build_plume_envelope(
            radius_vox=128, height_vox=512, center_x=256, center_z=256))
        cfg = P.PlumeConfig(center=(256.0, 48.0, 256.0), radius=40.0)
        klo, khi = 1, 4
    state = zeros_state(topo)
    for _ in range(2):
        state = P.plume_step(topo, state, params, cfg)

    def pull(tree):
        np.asarray(jax.tree_util.tree_leaves(tree)[0]).ravel()[:1]

    def make_chain():
        @jax.jit
        def chain(s, k):
            return jax.lax.fori_loop(
                0, k, lambda _, x: step_impl(topo, x, params), s
            )
        return chain

    orig = adv._advect_vmem
    adv._advect_vmem = adv._advect_vmem_wide
    chain_multipass = make_chain()
    pull(chain_multipass(state, jnp.asarray(klo)))
    pull(chain_multipass(state, jnp.asarray(khi)))
    adv._advect_vmem = orig
    chain_fused = make_chain()
    pull(chain_fused(state, jnp.asarray(klo)))
    pull(chain_fused(state, jnp.asarray(khi)))

    def best(f, k, n=3):
        b = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            pull(f(state, jnp.asarray(k)))
            b = min(b, time.perf_counter() - t0)
        return b

    res = {"multipass": float("inf"), "fused": float("inf")}
    for _ in range(rounds):
        for name, f in (("multipass", chain_multipass), ("fused", chain_fused)):
            slope = max((best(f, khi) - best(f, klo)) / (khi - klo), 1e-9)
            res[name] = min(res[name], slope)
    vox = topo.num_voxels
    for name, t in res.items():
        write(f"{scale}^3-class {name}: {t * 1e3:.2f} ms/step "
              f"({vox / t / 1e6:.1f} M voxel-updates/s)")
    write(f"fused/multipass ratio: {res['fused'] / res['multipass']:.3f}")
    return res


if __name__ == "__main__":
    run()
