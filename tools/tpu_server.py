"""Persistent TPU worker: executes python command files against ONE live
TPU client process.

The axon-tunneled TPU wedges its claim for many minutes if a client process
is killed mid-flight, so all TPU experiments run through this single
long-lived process. Protocol:

  - watch /tmp/tpu_cmds/ for NNN_name.py files (write atomically: tmp+rename)
  - exec each file in a shared namespace (so state persists across commands);
    the namespace starts with jax imported and `out(obj)` for results
  - write /tmp/tpu_out/NNN_name.out (repr of out() calls + stdout + traceback)
    then /tmp/tpu_out/NNN_name.done as the completion marker

Usage:  python tools/tpu_server.py   (leave running; submit via tpu_submit)
"""
from __future__ import annotations

import io
import json
import os
import sys
import time
import traceback

CMD_DIR = "/tmp/tpu_cmds"
OUT_DIR = "/tmp/tpu_out"


def main():
    os.makedirs(CMD_DIR, exist_ok=True)
    os.makedirs(OUT_DIR, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax  # noqa: F401  (claims the TPU once, up front)

    ns: dict = {"jax": jax, "time": time, "json": json}
    print(f"tpu_server ready: devices={jax.devices()}", flush=True)
    done = set(f[:-5] for f in os.listdir(OUT_DIR) if f.endswith(".done"))

    while True:
        try:
            names = sorted(
                f for f in os.listdir(CMD_DIR)
                if f.endswith(".py") and f[:-3] not in done
            )
        except FileNotFoundError:
            names = []
        if not names:
            time.sleep(0.3)
            continue
        name = names[0][:-3]
        path = os.path.join(CMD_DIR, names[0])
        with open(path) as f:
            src = f.read()
        # pick up repo edits: purge project modules so each job re-imports
        if "KEEP_MODULES" not in src:
            for m in list(sys.modules):
                if m.startswith("hnanosolver_tpu") or m == "bench":
                    del sys.modules[m]
        results: list = []
        ns["out"] = results.append
        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        t0 = time.perf_counter()
        status = "ok"
        try:
            exec(compile(src, path, "exec"), ns)
        except Exception:
            status = "error"
            traceback.print_exc(file=buf)
            # An OOM'd job can strand device buffers (its locals are pinned
            # by the live exception/frames until collected, and jax keeps
            # failed dispatches queued) — job 138 left the chip full and
            # every later job died instantly. Drop everything reachable,
            # then collect + clear so the next job starts on a clean HBM.
            import gc

            for k in [k for k in list(ns)
                      if k not in ("jax", "time", "json", "out")
                      and not k.startswith("__")]:
                del ns[k]
            gc.collect()
            try:
                jax.clear_caches()
            except Exception:
                pass
            gc.collect()
        finally:
            sys.stdout = old
        dt = time.perf_counter() - t0
        body = (
            f"# status={status} wall={dt:.2f}s\n"
            + "".join(repr(r) + "\n" for r in results)
            + buf.getvalue()
        )
        tmp = os.path.join(OUT_DIR, name + ".tmp")
        with open(tmp, "w") as f:
            f.write(body)
        os.replace(tmp, os.path.join(OUT_DIR, name + ".out"))
        with open(os.path.join(OUT_DIR, name + ".done"), "w") as f:
            f.write(status)
        done.add(name)
        print(f"{name}: {status} ({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
