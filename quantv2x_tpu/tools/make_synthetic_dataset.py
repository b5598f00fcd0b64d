"""Materialize synthetic V2X scenes as an on-disk OPV2V-layout tree.

    python -m quantv2x_tpu.tools.make_synthetic_dataset --out data/syn_train \
        --scenarios 50 --timestamps 20 --cavs 2 [--objects 12] [--points 30000]

Produces <out>/<scenario>/<cav_id>/<ts>.{yaml,bin} exactly as
data/dataset.scan_scenarios expects (the same layout the real V2X-Real /
OPV2V releases use: opv2v_basedataset.py:89), so the streaming train path
(tools/train.py --synthetic 0) and every dataset-driven tool exercise the
full disk -> host-thread -> device-voxelizer pipeline on synthetic data.

Per frame the generator reuses data/synthetic.make_frame (world-frame
objects, per-agent surface+ground point clouds) and writes:
  - <ts>.bin: the cav's valid points (N, 4) float32, cav-local frame;
  - <ts>.yaml: lidar_pose (world, degrees) + vehicles {id: {location,
    center, extent (half-dims), angle, obj_type}} in world coordinates —
    the same object schema _objects_to_ego parses back.
"""

import argparse
import os

import numpy as np
import yaml

from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame

_CLASS_NAMES = {1: "vehicle", 2: "pedestrian", 3: "truck"}


def write_frame(frame, world, out_scen: str, ts: str, cav_ids):
    boxes_world, classes = world
    vehicles = {}
    for i, (bx, c) in enumerate(zip(boxes_world, classes)):
        h, w, l = float(bx[3]), float(bx[4]), float(bx[5])
        vehicles[str(i)] = {
            "location": [float(bx[0]), float(bx[1]), float(bx[2] - h / 2)],
            "center": [0.0, 0.0, h / 2],
            "extent": [l / 2, w / 2, h / 2],
            "angle": [0.0, float(np.degrees(bx[6])), 0.0],
            "obj_type": _CLASS_NAMES[int(c)],
        }
    A = frame["agent_points"].shape[0]
    for a in range(A):
        cdir = os.path.join(out_scen, cav_ids[a])
        os.makedirs(cdir, exist_ok=True)
        pts = frame["agent_points"][a][frame["agent_points_mask"][a]]
        pts.astype(np.float32).tofile(os.path.join(cdir, f"{ts}.bin"))
        params = {
            "lidar_pose": [float(v) for v in frame["agent_poses"][a]],
            "vehicles": vehicles,
        }
        with open(os.path.join(cdir, f"{ts}.yaml"), "w") as f:
            yaml.safe_dump(params, f)


def generate(out: str, scenarios: int, timestamps: int, cavs: int,
             objects: int = 12, points: int = 30000, seed: int = 0,
             lidar_range=(-140.8, -40.0, -3.0, 140.8, 40.0, 1.0)):
    cav_ids = [str(641 + 9 * a) for a in range(cavs)]
    n = 0
    for s in range(scenarios):
        scen = os.path.join(out, f"scene{s:04d}")
        for t in range(timestamps):
            frame, world = make_frame(
                SyntheticCfg(lidar_range=tuple(lidar_range),
                             num_agents=cavs, num_objects=objects,
                             points_per_agent=points,
                             seed=seed + s * 100003 + t),
                return_world=True)
            write_frame(frame, world, scen, f"{t:06d}", cav_ids)
            n += 1
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--scenarios", type=int, default=10)
    ap.add_argument("--timestamps", type=int, default=10)
    ap.add_argument("--cavs", type=int, default=2)
    ap.add_argument("--objects", type=int, default=12)
    ap.add_argument("--points", type=int, default=30000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--range", type=float, nargs=6,
                    default=[-140.8, -40.0, -3.0, 140.8, 40.0, 1.0])
    args = ap.parse_args()
    n = generate(args.out, args.scenarios, args.timestamps, args.cavs,
                 args.objects, args.points, args.seed, args.range)
    print(f"[make_synthetic_dataset] wrote {n} frames to {args.out}")


if __name__ == "__main__":
    main()
