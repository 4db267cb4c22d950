"""Per-descriptor cost of in-kernel async copies (the go/no-go number for
a DMA-assembled pressure halo).

Kernel: p resident in VMEM; a fori_loop issues N row-copies (src row index
from an SMEM table, dynamic) into a staging buffer, waits for all, then does
one vector op so the result is live. Variants: span lengths 1 and 8 rows,
VMEM->VMEM and HBM->VMEM sources. Slope over N gives ns/copy; an XLA
take of the same row set is the reference.

Also checks: does a fori_loop with a DYNAMIC trip count (from SMEM) carrying
DMA issues compile?

Run: python tools/tpu_submit.py 090_dmacost tools/probe_dmacost.py 900
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
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = 4608
    x = jax.random.normal(jax.random.PRNGKey(0), (T, 512), jnp.float32)
    rows = jax.random.randint(jax.random.PRNGKey(1), (4096,), 0, T - 8,
                              jnp.int32)

    # reps outer iterations; each issues n copies of span L, waits, consumes.
    def make(n, L, reps, src_hbm):
        def kernel(rows_ref, x_ref, o_ref, stage, sem, xv=None):
            src = x_ref if xv is None else xv
            if xv is not None:
                # preload HBM x into a VMEM scratch once for the V->V case
                cp = pltpu.make_async_copy(x_ref, xv, sem)
                cp.start()
                cp.wait()

            def outer(r, acc):
                def issue(i, c):
                    row = rows_ref[i]
                    pltpu.make_async_copy(
                        src.at[pl.ds(row, L)],
                        stage.at[pl.ds((i * L) % 2048, L)],
                        sem,
                    ).start()
                    return c

                jax.lax.fori_loop(0, n, issue, 0)

                def drain(i, c):
                    pltpu.make_async_copy(
                        src.at[pl.ds(rows_ref[i], L)],
                        stage.at[pl.ds((i * L) % 2048, L)],
                        sem,
                    ).wait()
                    return c

                jax.lax.fori_loop(0, n, drain, 0)
                return acc + stage[r % 2048, r % 512]

            o_ref[0, 0] = jax.lax.fori_loop(0, reps, outer, 0.0)

        scratch = [
            pltpu.VMEM((2048 + 8, 512), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ]
        if not src_hbm:
            scratch.append(pltpu.VMEM((T, 512), jnp.float32))
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

    variants = {}
    for src_hbm, tag in ((True, "hbm"), (False, "vmem")):
        for L in (1, 8):
            for n in (64, 512):
                try:
                    variants[f"{tag}_L{L}_n{n}"] = (
                        make(n, L, 8, src_hbm), n * 8, L)
                except Exception as e:  # noqa: BLE001
                    print(f"{tag} L{L} n{n} BUILD FAIL: {str(e)[:200]}",
                          flush=True)

    # dynamic trip count from an SMEM value
    def dyn_kernel(cnt_ref, rows_ref, x_ref, o_ref, stage, sem):
        def issue(i, c):
            pltpu.make_async_copy(
                x_ref.at[pl.ds(rows_ref[i], 1)],
                stage.at[pl.ds(i % 2048, 1)], sem).start()
            return c

        n = cnt_ref[0]
        jax.lax.fori_loop(0, n, issue, 0, unroll=False)

        def drain(i, c):
            pltpu.make_async_copy(
                x_ref.at[pl.ds(rows_ref[i], 1)],
                stage.at[pl.ds(i % 2048, 1)], sem).wait()
            return c

        jax.lax.fori_loop(0, n, drain, 0, unroll=False)
        o_ref[0, 0] = stage[0, 0]

    try:
        dyn = pl.pallas_call(
            dyn_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2048, 512), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        got = dyn(jnp.asarray([64], jnp.int32), rows, x)
        want = x[int(rows[0]), 0]
        print(f"dynamic-trip DMA loop: ok diff={float(got[0,0]-want):.1e}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"dynamic-trip DMA loop FAILED: {type(e).__name__}:"
              f" {str(e)[:300]}", flush=True)

    def pull(v):
        np.asarray(v).ravel()[:1]

    for name, (fn, ncop, L) in list(variants.items()):
        try:
            pull(fn(rows, x))
        except Exception as e:  # noqa: BLE001
            print(f"{name} RUN FAIL: {str(e)[:200]}", flush=True)
            del variants[name]

    def best(fn, rep=4):
        b = float("inf")
        for _ in range(rep):
            t0 = time.perf_counter()
            pull(fn(rows, x))
            b = min(b, time.perf_counter() - t0)
        return b

    for r in range(3):
        if r:
            time.sleep(6)
        parts = []
        for name, (fn, ncop, L) in variants.items():
            t = best(fn)
            parts.append(f"{name}={1e9 * t / ncop:.0f}ns/cp")
        print(f"round {r}: " + " ".join(parts), flush=True)


main()
