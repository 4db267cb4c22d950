"""End-to-end example: simulate a rising smoke plume, export NanoVDB grids
(readable by Houdini 19.5+/Blender via nanovdb, convertible to .vdb with
nanovdb_convert), and render a preview PNG.

    python examples/smoke_to_nvdb.py --frames 24 --out out_demo
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hnanosolver_tpu.config import SolverParams
from hnanosolver_tpu.io.nvdb import write_state_nvdb
from hnanosolver_tpu.models.plume import PlumeConfig, run_plume
from hnanosolver_tpu.viewer.render import render_state, write_png


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--out", default="out_demo")
    ap.add_argument("--export-every", type=int, default=8)
    args = ap.parse_args()

    params = SolverParams(dt=1 / 24, voxel_size=0.5, iterations=24)
    cfg = PlumeConfig(center=(64.0, 16.0, 64.0), radius=12.0, velocity_jet=6.0)
    os.makedirs(args.out, exist_ok=True)

    def on_frame(f, topo, state):
        if (f + 1) % args.export_every == 0:
            paths = write_state_nvdb(
                args.out, topo, state,
                voxel_size=params.voxel_size, frame=f + 1,
                fields=("density", "temperature"),
            )
            img = render_state(topo, state, (128, 128, 128))
            write_png(os.path.join(args.out, f"preview_{f + 1:04d}.png"),
                      img.transpose(1, 0, 2)[::-1])
            print(f"frame {f + 1}: exported {len(paths)} grids, "
                  f"{int(topo.n_active)} tiles")

    run_plume(args.frames, params=params, cfg=cfg, on_frame=on_frame)


if __name__ == "__main__":
    main()
