"""Submit a command file to the running tpu_server and wait for the result.

Usage: python tools/tpu_submit.py <name> <file.py> [timeout_s]
       python tools/tpu_submit.py <name> - [timeout_s]   (read from stdin)
Prints the .out content; exit code 1 on error status or timeout.
"""
from __future__ import annotations

import os
import sys
import time

CMD_DIR = "/tmp/tpu_cmds"
OUT_DIR = "/tmp/tpu_out"


def main():
    name, src_path = sys.argv[1], sys.argv[2]
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 600.0
    src = sys.stdin.read() if src_path == "-" else open(src_path).read()
    os.makedirs(CMD_DIR, exist_ok=True)
    tmp = os.path.join(CMD_DIR, f".{name}.tmp")
    with open(tmp, "w") as f:
        f.write(src)
    os.replace(tmp, os.path.join(CMD_DIR, name + ".py"))
    done = os.path.join(OUT_DIR, name + ".done")
    t0 = time.time()
    while not os.path.exists(done):
        if time.time() - t0 > timeout:
            print(f"TIMEOUT waiting for {name}", file=sys.stderr)
            sys.exit(1)
        time.sleep(0.5)
    out = open(os.path.join(OUT_DIR, name + ".out")).read()
    print(out)
    sys.exit(0 if open(done).read() == "ok" else 1)


if __name__ == "__main__":
    main()
