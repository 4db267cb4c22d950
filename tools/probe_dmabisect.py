"""Bisect which construct in the DMA-cost probe breaks the TPU compile.

Variants build up from a trivially-compiling kernel to the probe_dmacost
structure one feature at a time; each is compiled AND run on a tiny input.

Run: python tools/tpu_submit.py 091_dmabisect tools/probe_dmabisect.py 600
"""
from __future__ import annotations

_KEEP = {"jax", "time", "json", "np", "__builtins__", "__name__", "out"}
for _k in [k for k in list(globals()) if k not in _KEEP and not k.startswith("__")]:
    del globals()[_k]
try:
    import jax as _jax

    _jax.clear_caches()
except Exception:
    pass

import sys  # noqa: E402

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = 512
    x = jax.random.normal(jax.random.PRNGKey(0), (T, 512), jnp.float32)
    rows = jnp.arange(64, dtype=jnp.int32) * 3 % T

    def run(name, kernel, out_smem=False, n_in=2):
        try:
            fn = pl.pallas_call(
                kernel,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ][:n_in],
                out_specs=pl.BlockSpec(
                    memory_space=pltpu.SMEM if out_smem else pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (1, 1) if out_smem else (8, 512), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((64, 512), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ],
            )
            v = fn(rows, x) if n_in == 2 else fn(x)
            np.asarray(v).ravel()[:1]
            print(f"{name}: OK", flush=True)
            return True
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:160]
            print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
            return False

    # v0: static single-row DMA, VMEM out from stage
    def v0(rows_ref, x_ref, o_ref, stage, sem):
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(0, 8)], stage.at[pl.ds(0, 8)], sem)
        cp.start()
        cp.wait()
        o_ref[:] = stage[0:8]

    run("v0_static8", v0)

    # v1: dynamic src row from SMEM, single row
    def v1(rows_ref, x_ref, o_ref, stage, sem):
        r = rows_ref[0]
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(r, 8)], stage.at[pl.ds(0, 8)], sem)
        cp.start()
        cp.wait()
        o_ref[:] = stage[0:8]

    run("v1_dynsrc8", v1)

    # v1b: dynamic src, span length 1
    def v1b(rows_ref, x_ref, o_ref, stage, sem):
        r = rows_ref[0]
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(r, 1)], stage.at[pl.ds(0, 1)], sem)
        cp.start()
        cp.wait()
        o_ref[:] = stage[0:8]

    run("v1b_dynsrc1", v1b)

    # v2: fori_loop issuing 64 single-row DMAs, then draining 64
    def v2(rows_ref, x_ref, o_ref, stage, sem):
        def issue(i, c):
            pltpu.make_async_copy(
                x_ref.at[pl.ds(rows_ref[i], 1)], stage.at[pl.ds(i, 1)], sem
            ).start()
            return c

        jax.lax.fori_loop(0, 64, issue, 0)

        def drain(i, c):
            pltpu.make_async_copy(
                x_ref.at[pl.ds(rows_ref[i], 1)], stage.at[pl.ds(i, 1)], sem
            ).wait()
            return c

        jax.lax.fori_loop(0, 64, drain, 0)
        o_ref[:] = stage[0:8]

    run("v2_fori64", v2)

    # v3: dynamic dst too (i*1 % 64 form)
    def v3(rows_ref, x_ref, o_ref, stage, sem):
        def issue(i, c):
            pltpu.make_async_copy(
                x_ref.at[pl.ds(rows_ref[i], 1)],
                stage.at[pl.ds((i * 3) % 64, 1)], sem
            ).start()
            return c

        jax.lax.fori_loop(0, 64, issue, 0)

        def drain(i, c):
            pltpu.make_async_copy(
                x_ref.at[pl.ds(rows_ref[i], 1)],
                stage.at[pl.ds((i * 3) % 64, 1)], sem
            ).wait()
            return c

        jax.lax.fori_loop(0, 64, drain, 0)
        o_ref[:] = stage[0:8]

    run("v3_moddst", v3)

    # v4: SMEM scalar output
    def v4(rows_ref, x_ref, o_ref, stage, sem):
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(0, 8)], stage.at[pl.ds(0, 8)], sem)
        cp.start()
        cp.wait()
        o_ref[0, 0] = 1.0

    run("v4_smem_out", v4, out_smem=True)

    # v5: dynamic scalar read from VMEM stage (suspected killer)
    def v5(rows_ref, x_ref, o_ref, stage, sem):
        r = rows_ref[0]
        o_ref[0, 0] = stage[r, r]

    run("v5_dynread_vmem", v5, out_smem=True)

    # v6: whole-ref HBM->VMEM preload (xv scratch) like probe's vmem case
    def v6(rows_ref, x_ref, o_ref, stage, sem, xv):
        cp = pltpu.make_async_copy(x_ref, xv, sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(xv.at[pl.ds(rows_ref[0], 8)],
                                    stage.at[pl.ds(0, 8)], sem)
        cp2.start()
        cp2.wait()
        o_ref[:] = stage[0:8]

    try:
        fn = pl.pallas_call(
            v6,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((64, 512), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.VMEM((T, 512), jnp.float32),
            ],
        )
        np.asarray(fn(rows, x)).ravel()[:1]
        print("v6_preload: OK", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"v6_preload: FAIL {type(e).__name__}: {str(e).splitlines()[0][:160]}",
              flush=True)


main()
