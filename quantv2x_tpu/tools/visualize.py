"""BEV visualization (parity: opencood/visualization/simple_vis.py).

Renders point cloud + predicted/GT boxes to a PNG, headless (matplotlib Agg).

    python -m quantv2x_tpu.tools.visualize -y configs/... --out vis.png
"""

import argparse

import numpy as np


def render_bev(points, pred_corners=None, gt_corners=None, lidar_range=None,
               out_path="bev.png", title=None):
    """points: (N, >=3); corners: (M, 8, 3) arrays; saves a PNG."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 5), dpi=120)
    if lidar_range is not None:
        ax.set_xlim(lidar_range[0], lidar_range[3])
        ax.set_ylim(lidar_range[1], lidar_range[4])
    if points is not None and len(points):
        ax.scatter(points[:, 0], points[:, 1], s=0.3, c="#888888",
                   linewidths=0)

    def draw(corners, color):
        for c in corners:
            quad = np.asarray(c)[:4, :2]
            loop = np.concatenate([quad, quad[:1]])
            ax.plot(loop[:, 0], loop[:, 1], color=color, linewidth=1.0)

    if gt_corners is not None and len(gt_corners):
        draw(gt_corners, "#2ca02c")
    if pred_corners is not None and len(pred_corners):
        draw(pred_corners, "#d62728")
    ax.set_aspect("equal")
    if title:
        ax.set_title(title)
    ax.set_facecolor("black")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-y", "--hypes", required=True)
    ap.add_argument("--run_dir", default=None)
    ap.add_argument("--out", default="bev.png")
    ap.add_argument("--max_cav", type=int, default=2)
    ap.add_argument("--seed", type=int, default=1000)
    args = ap.parse_args()

    import dataclasses
    import jax
    from quantv2x_tpu.config.hypes import load_hypes
    from quantv2x_tpu.data import anchors as anc
    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.postprocess import decode_detections
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.models.collab_model import PyramidCollabModel
    from quantv2x_tpu.train import checkpoint as ckpt
    from quantv2x_tpu.train.trainer import OptimCfg, create_train_state
    from quantv2x_tpu.utils import box_utils as bu

    hypes = load_hypes(args.hypes)
    model = PyramidCollabModel(
        dataclasses.replace(hypes.model, max_cav=args.max_cav))
    frame = make_frame(SyntheticCfg(
        lidar_range=hypes.voxel.lidar_range, num_agents=args.max_cav,
        num_objects=12, points_per_agent=20000, seed=args.seed))
    batch = frame_to_batch(frame, hypes.voxel, max_cav=args.max_cav)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), batch,
                                  OptimCfg())
    if args.run_dir:
        state, _ = ckpt.restore_checkpoint(args.run_dir, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    anchors = anc.generate_anchors(hypes.anchors)[0]

    @jax.jit
    def infer(v, b):
        out = model.apply(v, b, train=False)
        return decode_detections(out["cls_preds"][0], out["reg_preds"][0],
                                 anchors, hypes.postprocess,
                                 dir_preds=out["dir_preds"][0])

    det = jax.device_get(infer(variables, batch))
    gt_corners = np.asarray(bu.boxes_to_corners_3d(
        batch["gt_boxes"][0], "hwl"))[np.asarray(batch["gt_mask"][0])]
    pts = frame["agent_points"][0][frame["agent_points_mask"][0]]
    path = render_bev(
        pts, det["corners"][det["valid"]], gt_corners,
        hypes.voxel.lidar_range, args.out,
        title=f"pred(red)={int(det['valid'].sum())} gt(green)={len(gt_corners)}",
    )
    print(f"[visualize] wrote {path}")


if __name__ == "__main__":
    main()
