"""Part 2: dynamic-index DMA via .at[i] (leading-dim indexing, the pattern
the BFECC megakernel ships) instead of pl.ds(start, len).

Run: python tools/tpu_submit.py 092_dmabisect2 tools/probe_dmabisect2.py 600
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
import time  # noqa: E402

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = 512
    x = jax.random.normal(jax.random.PRNGKey(0), (T, 512), jnp.float32)
    x3 = x.reshape(T // 8, 8, 512)
    rows = (jnp.arange(64, dtype=jnp.int32) * 37) % T
    blocks = (jnp.arange(64, dtype=jnp.int32) * 11) % (T // 8)

    def trial(name, build):
        try:
            fn, args, check = build()
            v = fn(*args)
            err = check(np.asarray(v))
            print(f"{name}: OK err={err:.1e}", flush=True)
            return True
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)
            return False

    # v7: single-row copy via .at[r] on 2-D ANY ref
    def b7():
        def k(rows_ref, x_ref, o_ref, stage, sem):
            cp = pltpu.make_async_copy(
                x_ref.at[rows_ref[0]], stage.at[0], sem)
            cp.start()
            cp.wait()
            o_ref[:] = stage[:]

        fn = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 512), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )
        want = np.asarray(x[int(rows[0])])
        return fn, (rows, x), lambda v: float(np.abs(v[0] - want).max())

    trial("v7_at_row", b7)

    # v8: 8-row block copy via .at[q] on 3-D ANY ref
    def b8():
        def k(blk_ref, x_ref, o_ref, stage, sem):
            cp = pltpu.make_async_copy(x_ref.at[blk_ref[0]], stage.at[0], sem)
            cp.start()
            cp.wait()
            o_ref[:] = stage[0]

        fn = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, 8, 512), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )
        want = np.asarray(x3[int(blocks[0])])
        return fn, (blocks, x3), lambda v: float(np.abs(v - want).max())

    trial("v8_at_block8", b8)

    # v9: fori_loop of 64 .at[] row copies, drain loop, correctness on all
    def b9():
        def k(rows_ref, x_ref, o_ref, stage, sem):
            def issue(i, c):
                pltpu.make_async_copy(
                    x_ref.at[rows_ref[i]], stage.at[i], sem).start()
                return c

            jax.lax.fori_loop(0, 64, issue, 0)

            def drain(i, c):
                pltpu.make_async_copy(
                    x_ref.at[rows_ref[i]], stage.at[i], sem).wait()
                return c

            jax.lax.fori_loop(0, 64, drain, 0)
            o_ref[:] = stage[:]

        fn = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((64, 512), jnp.float32),
            scratch_shapes=[pltpu.VMEM((64, 512), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )
        want = np.asarray(x)[np.asarray(rows)]
        return fn, (rows, x), lambda v: float(np.abs(v - want).max())

    trial("v9_fori_at", b9)

    # v10: VMEM->VMEM .at[] dynamic copy (resident-source case)
    def b10():
        def k(rows_ref, x_ref, o_ref, xv, stage, sem):
            cp0 = pltpu.make_async_copy(x_ref, xv, sem)
            cp0.start()
            cp0.wait()

            def issue(i, c):
                pltpu.make_async_copy(
                    xv.at[rows_ref[i]], stage.at[i], sem).start()
                return c

            jax.lax.fori_loop(0, 64, issue, 0)

            def drain(i, c):
                pltpu.make_async_copy(
                    xv.at[rows_ref[i]], stage.at[i], sem).wait()
                return c

            jax.lax.fori_loop(0, 64, drain, 0)
            o_ref[:] = stage[:]

        fn = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((64, 512), jnp.float32),
            scratch_shapes=[pltpu.VMEM((T, 512), jnp.float32),
                            pltpu.VMEM((64, 512), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )
        want = np.asarray(x)[np.asarray(rows)]
        return fn, (rows, x), lambda v: float(np.abs(v - want).max())

    trial("v10_vmem_src", b10)

    # v11: dynamic trip count with .at[] copies
    def b11():
        def k(cnt_ref, rows_ref, x_ref, o_ref, stage, sem):
            n = cnt_ref[0]

            def issue(i, c):
                pltpu.make_async_copy(
                    x_ref.at[rows_ref[i]], stage.at[i], sem).start()
                return c

            jax.lax.fori_loop(0, n, issue, 0, unroll=False)

            def drain(i, c):
                pltpu.make_async_copy(
                    x_ref.at[rows_ref[i]], stage.at[i], sem).wait()
                return c

            jax.lax.fori_loop(0, n, drain, 0, unroll=False)
            o_ref[:] = stage[:]

        fn = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((64, 512), jnp.float32),
            scratch_shapes=[pltpu.VMEM((64, 512), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )
        want = np.asarray(x)[np.asarray(rows)[:32]]
        return fn, (jnp.asarray([32], jnp.int32), rows, x), (
            lambda v: float(np.abs(v[:32] - want).max()))

    trial("v11_dyntrip", b11)

    # v12: timing — ns/copy for .at[] row copies, HBM src, n=512 x reps=8
    def b12(nn, reps):
        def k(rows_ref, x_ref, o_ref, stage, sem):
            def outer(r, acc):
                def issue(i, c):
                    pltpu.make_async_copy(
                        x_ref.at[rows_ref[i]], stage.at[i % 64], sem).start()
                    return c

                jax.lax.fori_loop(0, nn, issue, 0)

                def drain(i, c):
                    pltpu.make_async_copy(
                        x_ref.at[rows_ref[i]], stage.at[i % 64], sem).wait()
                    return c

                jax.lax.fori_loop(0, nn, drain, 0)
                return acc

            jax.lax.fori_loop(0, reps, outer, 0)
            o_ref[:] = stage[0:8]

        return pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
            scratch_shapes=[pltpu.VMEM((64, 512), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        )

    big_rows = (jnp.arange(512, dtype=jnp.int32) * 37) % T
    try:
        lo = b12(512, 2)
        hi = b12(512, 18)
        np.asarray(lo(big_rows, x)).ravel()[:1]
        np.asarray(hi(big_rows, x)).ravel()[:1]

        def best(fn, rep=5):
            b = float("inf")
            for _ in range(rep):
                t0 = time.perf_counter()
                np.asarray(fn(big_rows, x)).ravel()[:1]
                b = min(b, time.perf_counter() - t0)
            return b

        for r in range(3):
            if r:
                time.sleep(5)
            tl, th = best(lo), best(hi)
            per = (th - tl) / (16 * 512)
            print(f"round {r}: issue+drain={per*1e9:.0f} ns/row-copy",
                  flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"v12_timing FAIL: {str(e).splitlines()[0][:160]}", flush=True)


main()
