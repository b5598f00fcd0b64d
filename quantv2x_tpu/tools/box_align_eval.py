"""Box-align pose-graph drivers: pre-calc stage-1 detections + pose-error
evaluation sweep.

Parity: tools/pose_graph_pre_calc.py (generate per-agent stage-1 box
detections and cache them for the box-align stage) and
tools/pose_graph_evaluate.py (measure localization error before/after
pose-graph correction). The reference needs a trained stage-1 model and
disk caches; this driver can also run self-contained on synthetic frames
using ground-truth boxes corrupted by per-agent pose noise — the pose
recovery math (ops/pose_graph.box_align) is what is being evaluated.

  python -m quantv2x_tpu.tools.box_align_eval --frames 16 \
      [--pos-std 0.4 --yaw-std 2.0] [--json out.json]
"""

import argparse
import json
from typing import Optional, Sequence

import numpy as np


def _deg_wrap(d):
    return (d + 180.0) % 360.0 - 180.0


def precalc_detections(frame, noise_rng, pos_std, yaw_std_deg, max_cav):
    """Simulate stage-1 output: each agent reports the GT boxes visible to
    it, expressed in its own (noisy) frame. Returns noisy poses (A, 3)
    x/y/yaw-rad, per-agent boxes (A, K, 2) BEV centers + mask."""
    gt = frame["gt_boxes"]
    mask = frame["gt_mask"]
    A = int(frame["agent_mask"].sum())
    # synthetic pose convention: (x, y, z, roll, yaw, pitch) degrees, ego at
    # the origin so ego frame == world frame (data/synthetic.py:51-65)
    true_poses = frame["agent_poses"][:, [0, 1, 4]].astype(np.float64)
    true_poses[:, 2] = np.radians(true_poses[:, 2])

    noisy = true_poses.copy()
    noisy[1:A, :2] += noise_rng.normal(0, pos_std, (A - 1, 2))
    noisy[1:A, 2] += np.radians(noise_rng.normal(0, yaw_std_deg, A - 1))

    K = gt.shape[0]
    boxes = np.zeros((max_cav, K, 2))
    bmask = np.zeros((max_cav, K), bool)
    for a in range(A):
        # world -> true agent frame (what the sensor actually sees)
        c, s = np.cos(true_poses[a, 2]), np.sin(true_poses[a, 2])
        R = np.array([[c, s], [-s, c]])
        local = (gt[:, :2] - true_poses[a, :2]) @ R.T
        boxes[a] = local
        bmask[a] = mask
    return noisy, true_poses, boxes, bmask


def evaluate_alignment(frames: Sequence[dict], pos_std: float,
                       yaw_std_deg: float, max_cav: int, seed: int = 0):
    """Pose error (m / deg) before and after box_align over frames."""
    import jax.numpy as jnp

    from quantv2x_tpu.ops.pose_graph import box_align

    rng = np.random.default_rng(seed)
    before_p, after_p, before_y, after_y = [], [], [], []
    for frame in frames:
        noisy, true, boxes, bmask = precalc_detections(
            frame, rng, pos_std, yaw_std_deg, max_cav)
        A = int(frame["agent_mask"].sum())
        corrected = np.asarray(box_align(
            jnp.asarray(noisy), jnp.asarray(boxes), jnp.asarray(bmask),
            jnp.asarray(frame["agent_mask"]),
        ))
        # errors relative to ego-anchored truth
        for a in range(1, A):
            before_p.append(np.linalg.norm(noisy[a, :2] - true[a, :2]))
            after_p.append(np.linalg.norm(corrected[a, :2] - true[a, :2]))
            before_y.append(abs(_deg_wrap(np.degrees(
                noisy[a, 2] - true[a, 2]))))
            after_y.append(abs(_deg_wrap(np.degrees(
                corrected[a, 2] - true[a, 2]))))
    return {
        "frames": len(frames),
        "pos_err_before_m": float(np.mean(before_p)) if before_p else 0.0,
        "pos_err_after_m": float(np.mean(after_p)) if after_p else 0.0,
        "yaw_err_before_deg": float(np.mean(before_y)) if before_y else 0.0,
        "yaw_err_after_deg": float(np.mean(after_y)) if after_y else 0.0,
    }


def precalc_dataset_cache(root: str, stage1_dir: str, max_cav: int,
                          max_boxes: int = 32, dataset_mode: str = "vc"):
    """Write the stage-1 box cache V2XDataset.box_align consumes.

    Parity: tools/pose_graph_pre_calc.py — the reference runs a trained
    stage-1 single-agent model over the dataset and caches per-cav box
    detections. Without a real sensor model here, the per-agent boxes come
    from the yaml GT expressed in each cav's own frame (what a perfect
    stage-1 detector would output in its sensor frame); plug in a trained
    single-agent model by replacing `simulate_stage1_from_gt`."""
    from quantv2x_tpu.data.box_align import (
        gt_world_centers, save_stage1_cache, simulate_stage1_from_gt,
    )
    from quantv2x_tpu.data.dataset import V2XDataset

    ds = V2XDataset(root, dataset_mode=dataset_mode, max_cav=max_cav)
    n = 0
    for idx, (si, ti) in enumerate(ds.index):
        scen = ds.scenarios[si]
        ts = scen["timestamps"][ti]
        frame = ds[idx]
        world = gt_world_centers(frame["gt_boxes"],
                                 frame["agent_poses"][0])
        centers, mask = simulate_stage1_from_gt(
            world, frame["gt_mask"], frame["agent_poses"],
            frame["agent_mask"], max_boxes)
        # label rows with the frame's OWN kept-cav order: the dataset's
        # comm-range filter (and per-epoch reshuffle) reorders agents, so
        # the raw scenario cav list would misattribute detections
        save_stage1_cache(stage1_dir, scen["name"], ts,
                          frame["cav_ids"], centers, mask)
        n += 1
    return n


def main(argv: Optional[Sequence[str]] = None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--max_cav", type=int, default=3)
    ap.add_argument("--pos-std", type=float, default=0.4)
    ap.add_argument("--yaw-std", type=float, default=2.0)
    ap.add_argument("--precalc_root", default="",
                    help="OPV2V-format dataset root: write the stage-1 "
                         "box cache instead of the synthetic eval "
                         "(parity: tools/pose_graph_pre_calc.py)")
    ap.add_argument("--stage1_dir", default="",
                    help="cache output dir for --precalc_root")
    ap.add_argument("--json", default="")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")

    if args.precalc_root:
        if not args.stage1_dir:
            raise SystemExit("--precalc_root needs --stage1_dir")
        n = precalc_dataset_cache(args.precalc_root, args.stage1_dir,
                                  args.max_cav)
        print(json.dumps({"cached_frames": n,
                          "stage1_dir": args.stage1_dir}))
        return

    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame

    frames = [make_frame(SyntheticCfg(
        num_agents=args.max_cav, num_objects=10, points_per_agent=2000,
        seed=s)) for s in range(args.frames)]
    out = evaluate_alignment(frames, args.pos_std, args.yaw_std,
                             args.max_cav)
    s = json.dumps(out, indent=2)
    print(s)
    if args.json:
        with open(args.json, "w") as f:
            f.write(s)


if __name__ == "__main__":
    main()
