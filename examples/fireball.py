"""End-to-end example: oxygen-limited combustion fireball with vorticity
confinement, checkpointed and rendered.

    python examples/fireball.py --frames 36 --out out_fire
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hnanosolver_tpu.io.state import save_npz
from hnanosolver_tpu.models.fire import FireConfig, default_params, run_fire
from hnanosolver_tpu.viewer.render import render_state, write_png


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--out", default="out_fire")
    args = ap.parse_args()

    params = default_params()
    cfg = FireConfig(center=(64.0, 8.0, 64.0), radius=14.0)
    os.makedirs(args.out, exist_ok=True)

    def on_frame(f, topo, state):
        if (f + 1) % 12 == 0:
            save_npz(os.path.join(args.out, f"fire_{f + 1:04d}.npz"),
                     topo, state, params, frame=f + 1)
            img = render_state(topo, state, (128, 128, 128))
            write_png(os.path.join(args.out, f"fire_{f + 1:04d}.png"),
                      img.transpose(1, 0, 2)[::-1])
            print(f"frame {f + 1}: {int(topo.n_active)} tiles")

    run_fire(args.frames, params=params, cfg=cfg, on_frame=on_frame)


if __name__ == "__main__":
    main()
