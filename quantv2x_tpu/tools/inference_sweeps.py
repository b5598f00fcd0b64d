"""Robustness sweep drivers: pose noise and collaborator count.

Parity:
  - tools/inference_w_noise.py — pose-noise robustness sweep (AP vs noise
    std);
  - tools/inference_heter_in_order(_mc).py — successively-adding-agents
    evaluation (AP vs number of collaborators, use_cav capping).

    python -m quantv2x_tpu.tools.inference_sweeps -y configs/... \
        --run_dir runs/exp --sweep {noise,agents}
"""

import argparse
import dataclasses
import json

import jax
import numpy as np


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-y", "--hypes", required=True)
    ap.add_argument("--run_dir", default=None)
    ap.add_argument("--sweep", choices=["noise", "agents", "latency",
                                        "comm", "missing"],
                    default="noise")
    ap.add_argument("--thresholds", type=float, nargs="+",
                    default=[0.0, 0.01, 0.03, 0.1, 0.3],
                    help="comm sweep: where2comm transmit thresholds")
    ap.add_argument("--speed_mps", type=float, default=8.33,
                    help="latency sweep: simulated collaborator speed")
    ap.add_argument("--synthetic", type=int, default=8)
    ap.add_argument("--max_cav", type=int, default=4)
    ap.add_argument("--box_align", action="store_true",
                    help="noise sweep: add a second arm that corrects the "
                         "noisy poses via the stage-1 box-align pose graph "
                         "before fusion (parity: box_align in __getitem__, "
                         "intermediate_heter_fusion_3class_dataset.py:"
                         "399-427)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from quantv2x_tpu.config.hypes import load_hypes
    from quantv2x_tpu.data.noise_sim import NoiseCfg, add_pose_noise, drop_agents
    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.models.collab_model import PyramidCollabModel
    from quantv2x_tpu.tools.inference import run_eval
    from quantv2x_tpu.train import checkpoint as ckpt
    from quantv2x_tpu.train.trainer import OptimCfg, create_train_state

    hypes = load_hypes(args.hypes)
    if args.sweep == "comm":
        # comm-rate-vs-AP needs the where2comm communication gate — build
        # whatever the config says (point_pillar_baseline + where2comm)
        from quantv2x_tpu.models.registry import create_model
        model, contract = create_model(hypes, max_cav=args.max_cav)
        if getattr(model, "comm", None) is None:
            raise SystemExit("--sweep comm needs a where2comm config "
                             "(model.args.fusion_method: where2comm)")
    elif args.sweep == "missing":
        # gencomm configs carry a top-level `gencomm:` block (same
        # construction as tools/train_gencomm.py)
        from quantv2x_tpu.models.gencomm import GenCommCfg, GenCommCollabModel
        if "gencomm" not in hypes.raw:
            raise SystemExit("--sweep missing needs a gencomm config")
        gc = hypes.raw["gencomm"]
        model_cfg = dataclasses.replace(hypes.model, max_cav=args.max_cav)
        gcfg = GenCommCfg(
            channels=model_cfg.backbone_filters[-1],
            message_channels=int(gc.get("message_channels", 8)),
            timesteps=int(gc.get("diffusion_steps", 20)),
            ch_mult=tuple(gc.get("ch_mult", (1, 2))),
            num_res_blocks=int(gc.get("num_res_blocks", 2)))
        model = GenCommCollabModel(
            base_model=PyramidCollabModel(model_cfg, name="base_model"),
            cfg=gcfg)
    else:
        model = PyramidCollabModel(
            dataclasses.replace(hypes.model, max_cav=args.max_cav))
    frames = [
        make_frame(SyntheticCfg(
            lidar_range=hypes.voxel.lidar_range, num_agents=args.max_cav,
            num_objects=12, points_per_agent=20000, seed=3000 + s))
        for s in range(args.synthetic)
    ]
    sample = frame_to_batch(frames[0], hypes.voxel, max_cav=args.max_cav)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), sample,
                                  OptimCfg())
    if args.run_dir:
        state, ep = ckpt.restore_checkpoint(args.run_dir, state)
        print(f"[sweep] loaded epoch {ep}")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    results = {}
    if args.sweep == "noise":
        from quantv2x_tpu.data.box_align import (
            BoxAlignCfg, apply_box_align, gt_world_centers,
            simulate_stage1_from_gt,
        )
        ba_cfg = BoxAlignCfg(enabled=True)
        for std in [0.0, 0.2, 0.4, 0.6, 1.0]:
            cfg = NoiseCfg(pos_std=std, rot_std=std)
            rng = np.random.default_rng(0)        # same noise both arms
            noisy = [add_pose_noise(f, cfg, rng) for f in frames]
            batches = [frame_to_batch(f, hypes.voxel, max_cav=args.max_cav)
                       for f in noisy]
            summary, lat = run_eval(model, variables, batches, hypes)
            results[f"std_{std}"] = summary["mAP"]
            print(f"[sweep] noise std={std}: mAP@0.5={summary['mAP'][0.5]:.4f}")
            if args.box_align:
                # stage-1 centers from the CLEAN frame (a per-agent
                # detector sees its own sensor frame — immune to the pose
                # noise); the pose graph then corrects the noisy poses
                aligned = []
                for f_clean, f_noisy in zip(frames, noisy):
                    world = gt_world_centers(f_clean["gt_boxes"],
                                             f_clean["agent_poses"][0])
                    centers, bmask = simulate_stage1_from_gt(
                        world, f_clean["gt_mask"],
                        f_clean["agent_poses"], f_clean["agent_mask"],
                        ba_cfg.max_boxes)
                    aligned.append(apply_box_align(f_noisy, centers, bmask,
                                                   ba_cfg))
                batches = [frame_to_batch(f, hypes.voxel,
                                          max_cav=args.max_cav)
                           for f in aligned]
                summary, lat = run_eval(model, variables, batches, hypes)
                results[f"std_{std}_aligned"] = summary["mAP"]
                print(f"[sweep] noise std={std} +box_align: "
                      f"mAP@0.5={summary['mAP'][0.5]:.4f}")
    elif args.sweep == "latency":
        # communication time-delay robustness (parity: wild_setting async,
        # v2xreal_basedataset.py:89-122 + noise_sim.WildCfg). On synthetic
        # frames the staleness is emulated kinematically: a collaborator
        # moving at --speed_mps reports a pose delay_ms old, so its
        # features get warped into the ego frame with that pose error —
        # the same failure mode the reference's delayed-frame loading
        # produces on sequence data (real datasets apply WildCfg directly
        # at load time via data/dataset.build_frame_source).
        for delay_ms in [0, 100, 200, 300, 500]:
            d = args.speed_mps * delay_ms / 1000.0

            def stale(f):
                out = dict(f)
                poses = np.copy(f["agent_poses"])
                for a in range(1, poses.shape[0]):
                    if f["agent_mask"][a]:
                        yaw = np.radians(float(poses[a, 4]))
                        poses[a, 0] -= d * np.cos(yaw)
                        poses[a, 1] -= d * np.sin(yaw)
                out["agent_poses"] = poses
                return out

            batches = [
                frame_to_batch(stale(f), hypes.voxel, max_cav=args.max_cav)
                for f in frames
            ]
            summary, lat = run_eval(model, variables, batches, hypes)
            results[f"delay_{delay_ms}ms"] = summary["mAP"]
            print(f"[sweep] delay={delay_ms}ms: "
                  f"mAP@0.5={summary['mAP'][0.5]:.4f}")
    elif args.sweep == "comm":
        # AP vs transmitted fraction (the tradeoff study the reference
        # supports via where2comm_attn + comm_modules/where2comm)
        batches = [frame_to_batch(f, hypes.voxel, max_cav=args.max_cav)
                   for f in frames]
        for t in args.thresholds:
            m_t = model.clone(
                comm=dataclasses.replace(model.comm, threshold=float(t)),
                parent=None)
            summary, lat = run_eval(m_t, variables, batches, hypes)
            fwd = jax.jit(lambda v, b, m=m_t: m.apply(v, b, train=False))
            rates = [float(fwd(variables, b)["comm_rate"])
                     for b in batches[:4]]
            rate = float(np.mean(rates))
            results[f"thre_{t}"] = {"mAP": summary["mAP"],
                                    "comm_rate": rate}
            print(f"[sweep] thre={t}: tx={rate:.4f} "
                  f"mAP@0.5={summary['mAP'][0.5]:.4f}")
    elif args.sweep == "missing":
        # missing-message AP recovery — the point of GenComm: collaborators
        # lose a fraction of message pixels; the diffusion generator fills
        # in (heter_model_baseline_w_gencomm_stage2.py:289 missing_message)
        batches = [frame_to_batch(f, hypes.voxel, max_cav=args.max_cav)
                   for f in frames]
        for mr in [0.0, 0.3, 0.6, 1.0]:
            m_r = model.clone(missing_rate=float(mr), parent=None)
            summary, lat = run_eval(
                m_r, variables, batches, hypes,
                apply_fn=lambda v, b, m=m_r: m.apply(v, b, train=False,
                                                     sample=True))
            results[f"missing_{mr}"] = summary["mAP"]
            print(f"[sweep] missing={mr}: "
                  f"mAP@0.5={summary['mAP'][0.5]:.4f}")
    else:
        for use_cav in range(1, args.max_cav + 1):
            batches = [
                frame_to_batch(drop_agents(f, use_cav), hypes.voxel,
                               max_cav=args.max_cav)
                for f in frames
            ]
            summary, lat = run_eval(model, variables, batches, hypes)
            results[f"agents_{use_cav}"] = summary["mAP"]
            print(f"[sweep] agents={use_cav}: mAP@0.5={summary['mAP'][0.5]:.4f}")

    print(json.dumps(results, indent=2, default=float))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, default=float)


if __name__ == "__main__":
    main()
