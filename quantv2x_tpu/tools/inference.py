"""Inference + AP evaluation CLI (parity: opencood/tools/inference_mc.py).

    python -m quantv2x_tpu.tools.inference -y configs/... --run_dir runs/exp1 \
        [--synthetic N] [--quant {none,w8a8,adaround}] [--json out.json]

Evaluates per-class AP@0.3/0.5/0.7 + mAP and mean latency. --quant runs the
PTQ pipeline first (parity: tools/inference_mc_quant.py).
"""

import argparse
import dataclasses
import json
import os
import time

import jax
import numpy as np


def run_eval(model, variables, batches, hypes, apply_fn=None, act_scales=None):
    """Shared eval loop. Returns (ap summary, mean latency s)."""
    from quantv2x_tpu.data import anchors as anc
    from quantv2x_tpu.data.postprocess import decode_detections
    from quantv2x_tpu.utils import box_utils as bu
    from quantv2x_tpu.utils.eval_ap import (
        accumulate_frame, mask_gt_range, new_result_stat, summarize,
    )

    anchors = anc.generate_anchors(hypes.anchors)[0]
    ppcfg = hypes.postprocess

    if apply_fn is None:
        def apply_fn(v, b):
            return model.apply(v, b, train=False)

    @jax.jit
    def infer(variables, batch):
        out = apply_fn(variables, batch)
        det = decode_detections(
            out["cls_preds"][0], out["reg_preds"][0], anchors, ppcfg,
            dir_preds=out["dir_preds"][0],
        )
        return det

    stat = new_result_stat(hypes.model.num_class)
    lat = []
    for i, batch in enumerate(batches):
        t0 = time.time()
        det = jax.block_until_ready(infer(variables, batch))
        if i > 0:
            lat.append(time.time() - t0)
        gt_corners = bu.boxes_to_corners_3d(batch["gt_boxes"][0], "hwl")
        # GT masked to the eval range (parity:
        # base_postprocessor_multi_class.py:97-143) — predictions already are
        gt_mask = mask_gt_range(gt_corners, batch["gt_mask"][0],
                                ppcfg.gt_range)
        accumulate_frame(
            stat, det["corners"], det["scores"], det["labels"], det["valid"],
            gt_corners, batch["gt_classes"][0], gt_mask,
        )
    return summarize(stat), float(np.mean(lat)) if lat else 0.0


def run_eval_single(model, variables, frames, hypes, contract, frame_vox):
    """Eval loop for the single-agent contracts.

    contract "voxels": ego cloud only; "early": clouds merged to ego before
    voxelization (early-fusion dataset parity); "late": per-agent detection
    + projected-NMS merge (late-fusion post_process parity).
    """
    import jax.numpy as jnp

    from quantv2x_tpu.data import anchors as anc
    from quantv2x_tpu.data.postprocess import decode_detections
    from quantv2x_tpu.models.single_model import (
        late_fuse_detections, merge_points_to_ego,
    )
    from quantv2x_tpu.utils import box_utils as bu
    from quantv2x_tpu.utils.eval_ap import (
        accumulate_frame, mask_gt_range, new_result_stat, summarize,
    )
    from quantv2x_tpu.utils.transformation import np_pose_to_world

    anchors = anc.generate_anchors(hypes.anchors)[0]
    ppcfg = hypes.postprocess

    @jax.jit
    def infer(variables, vox):
        out = model.apply(variables, vox, train=False)
        return decode_detections(
            out["cls_preds"][0], out["reg_preds"][0], anchors, ppcfg,
            dir_preds=out["dir_preds"][0],
        )

    stat = new_result_stat(hypes.model.num_class)
    lat = []
    for i, frame in enumerate(frames):
        t0 = time.time()
        if contract == "early":
            det = infer(variables, frame_vox(merge_points_to_ego(frame)))
        elif contract == "late":
            A = int(np.asarray(frame["agent_mask"]).sum())
            dets = [infer(variables, frame_vox(frame, agent=a))
                    for a in range(A)]
            T_we = np_pose_to_world(frame["agent_poses"][0])
            T_ew = np.linalg.inv(T_we)
            transforms = [
                jnp.asarray(T_ew @ np_pose_to_world(frame["agent_poses"][a]),
                            jnp.float32)
                for a in range(A)
            ]
            det = late_fuse_detections(dets, transforms,
                                       nms_threshold=ppcfg.nms_threshold)
        else:
            det = infer(variables, frame_vox(frame))
        det = jax.block_until_ready(det)
        if i > 0:
            lat.append(time.time() - t0)
        gt_corners = bu.boxes_to_corners_3d(jnp.asarray(frame["gt_boxes"]),
                                            "hwl")
        gt_mask = mask_gt_range(gt_corners, frame["gt_mask"], ppcfg.gt_range)
        accumulate_frame(
            stat, det["corners"], det["scores"], det["labels"], det["valid"],
            gt_corners, jnp.asarray(frame["gt_classes"]), gt_mask,
        )
    return summarize(stat), float(np.mean(lat)) if lat else 0.0


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-y", "--hypes", required=True)
    ap.add_argument("--run_dir", default=None)
    ap.add_argument("--synthetic", type=int, default=16)
    ap.add_argument("--max_cav", type=int, default=2)
    ap.add_argument("--quant", choices=["none", "w8a8", "adaround"],
                    default="none")
    ap.add_argument("--calib", type=int, default=4)
    ap.add_argument("--percentile", type=float, default=None,
                    help="activation calibration percentile (PTQConfig"
                         ".act_percentile); checkpoint-dependent — "
                         "overtrained models need 0.9999+")
    ap.add_argument("--iters", type=int, default=None,
                    help="AdaRound reconstruction iterations per unit "
                         "(reference default 5000)")
    ap.add_argument("--engine",
                    choices=["none", "fused", "int8", "int8_fused"],
                    default="none",
                    help="evaluate a deployment engine transform instead "
                    "of the stock apply (parity: the reference evaluates "
                    "its serialized TensorRT engines). int8_fused = the "
                    "headline int8 fused-block Pallas engine")
    ap.add_argument("--engine_clip",
                    choices=["mse", "entropy", "percentile"],
                    default="mse",
                    help="int8_fused boundary-grid selection (mse = "
                         "per-boundary Lp clip search)")
    ap.add_argument("--engine_adaround", type=int, default=0,
                    help="int8_fused: learned-rounding iterations per "
                         "fused block (0 = nearest rounding)")
    ap.add_argument("--objects", type=int, default=12,
                    help="synthetic eval scene objects (match training)")
    ap.add_argument("--points", type=int, default=20000,
                    help="synthetic eval points per agent")
    ap.add_argument("--json", default=None)
    ap.add_argument("--epoch", type=int, default=None,
                    help="checkpoint epoch to load (default latest; for "
                         "the best-val checkpoint use --best)")
    ap.add_argument("--best", action="store_true",
                    help="load the best-val checkpoint recorded in "
                         "<run_dir>/best instead of the latest epoch")
    ap.add_argument("--test_seed_base", type=int, default=1016,
                    help="first synthetic-test-frame seed (default = the "
                         "round-3 accuracy-table protocol)")
    args = ap.parse_args()

    from quantv2x_tpu.config.hypes import load_hypes
    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.data.voxelizer import voxelize
    from quantv2x_tpu.models.registry import create_model
    from quantv2x_tpu.train import checkpoint as ckpt
    from quantv2x_tpu.train.trainer import OptimCfg, create_train_state

    import jax.numpy as jnp

    hypes = load_hypes(args.hypes)
    model, contract = create_model(hypes, max_cav=args.max_cav)
    if contract not in ("collab", "voxels", "early", "late"):
        raise SystemExit(
            f"inference.py drives collab/single contracts; "
            f"{hypes.raw['model']['core_method']!r} is {contract!r}")

    from quantv2x_tpu.data.synthetic import hypes_synth_extras
    synth_extras, assign_modality = hypes_synth_extras(hypes.raw)
    # Seed protocol: the TEST set is pinned to seeds test_seed_base..+N
    # (default 1016 — exactly the frames[calib:] split the round-3 table's
    # --calib 16 runs produced, i.e. the set the FP32 0.794 anchor was
    # measured on) so AP rows stay comparable across runs regardless of
    # --calib. Calibration frames keep the legacy 1000..1015 seeds (so
    # calibration data matches the r3 runs) and spill to a disjoint 8000+
    # base beyond 16.
    def _frame(seed):
        return assign_modality(make_frame(SyntheticCfg(
            lidar_range=hypes.voxel.lidar_range, num_agents=args.max_cav,
            num_objects=args.objects, points_per_agent=args.points,
            seed=seed, **synth_extras,
        )))

    calib_seeds = ([1000 + s for s in range(min(args.calib, 16))]
                   + [8000 + s for s in range(max(0, args.calib - 16))])
    test_seeds = [args.test_seed_base + s for s in range(args.synthetic)]
    frames = [_frame(s) for s in calib_seeds + test_seeds]
    if contract == "collab":
        batches = [frame_to_batch(f, hypes.voxel, max_cav=args.max_cav)
                   for f in frames]
        sample = batches[0]
    else:
        # single-agent voxel contract (plain / early-merged / late per-agent)
        def frame_vox(f, agent=0):
            return voxelize(jnp.asarray(f["agent_points"][agent]),
                            jnp.asarray(f["agent_points_mask"][agent]),
                            hypes.voxel)
        sample = frame_vox(frames[0])
    calib_frames, test_frames = frames[: args.calib], frames[args.calib:]
    if contract == "collab":
        calib, test = batches[: args.calib], batches[args.calib:]

    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), sample, OptimCfg()
    )
    epoch = None
    if args.run_dir:
        if args.best and args.epoch is not None:
            raise SystemExit("--epoch and --best are mutually exclusive")
        epoch_want = args.epoch
        if args.best:
            marker = os.path.join(args.run_dir, "best")
            if not os.path.exists(marker):
                raise SystemExit(
                    f"--best: no best-val marker at {marker} (the run "
                    f"predates best-val tracking or the marker was "
                    f"pruned); use --epoch N instead")
            with open(marker) as f:
                epoch_want = int(f.read().split()[0])
        state, epoch = ckpt.restore_checkpoint(args.run_dir, state,
                                               epoch=epoch_want)
        print(f"[inference] loaded epoch {epoch}")
    variables = {"params": state.params, "batch_stats": state.batch_stats,
                 **dict(state.extra_vars)}

    def emit(summary, lat, n_frames, **extra):
        # mean_latency_s is per-CALL host wall-clock: on the tunneled axon
        # backend every jitted call pays ~30 ms+ of tunnel dispatch, so it
        # is NOT device latency (bench.py's 64-frame scan-chains are; the
        # same pipeline that reads ~1.3 s/call here measures ~21 ms/frame
        # there). Kept for relative comparisons only.
        out = {"ap": summary, "mean_latency_s": round(lat, 4),
               "latency_note": "tunnel_per_call; device-rate latency is "
                               "bench.py scan-chain ms/frame",
               "fps": round(1.0 / lat, 2) if lat else None,
               "frames": n_frames, **extra}
        print(json.dumps(out, indent=2, default=float))
        if args.json:
            with open(args.json, "w") as f:
                json.dump(out, f, default=float)

    if contract in ("voxels", "early", "late"):
        if args.quant != "none" or args.engine != "none":
            raise SystemExit(
                f"--quant/--engine drive the collab contract; "
                f"{contract!r} models run FP only here")
        summary, lat = run_eval_single(model, variables, test_frames, hypes,
                                       contract, frame_vox)
        emit(summary, lat, len(test_frames), quant="none", mode=contract)
        return

    if args.engine != "none":
        if args.quant != "none":
            raise SystemExit("--engine and --quant are mutually exclusive "
                             "(int8 engine quantizes by itself)")
        if args.engine == "fused":
            from quantv2x_tpu.quant.fused_engine import build_fused_engine
            _, eng_apply = build_fused_engine(model, variables, h_tile=16,
                                              min_channels=0)
        elif args.engine == "int8_fused":
            from quantv2x_tpu.quant.int8_fused_engine import \
                build_int8_fused_engine
            _, eng_apply = build_int8_fused_engine(
                model, variables, calib, h_tile=16,
                clip=args.engine_clip, adaround_iters=args.engine_adaround)
        else:
            from quantv2x_tpu.quant.int8_engine import build_int8_engine
            _, eng_apply = build_int8_engine(model, variables, calib)
        summary, lat = run_eval(model, variables, test, hypes,
                                apply_fn=eng_apply)
        emit(summary, lat, len(test), quant=args.engine, engine=args.engine)
        return

    if args.quant == "none":
        summary, lat = run_eval(model, variables, test, hypes)
    else:
        from quantv2x_tpu.quant.adaround import ReconCfg, adaround_reconstruct
        from quantv2x_tpu.quant.ptq import PTQConfig, ptq_calibrate

        qcfg = PTQConfig()
        if args.percentile is not None:
            qcfg = dataclasses.replace(qcfg, act_percentile=args.percentile)
        if args.quant == "w8a8":
            qvars, act_scales, qapply = ptq_calibrate(
                model, variables, calib, qcfg)
        else:
            rcfg = ReconCfg() if args.iters is None else ReconCfg(
                iters=args.iters)
            resume = (os.path.join(args.run_dir, "adaround_resume")
                      if args.run_dir else None)
            from quantv2x_tpu.quant.adaround import resume_fingerprint
            meta = resume_fingerprint(variables, calib_seeds=calib_seeds,
                                      epoch=epoch, iters=rcfg.iters)
            qvars, act_scales, qapply = adaround_reconstruct(
                model, variables, calib, cfg=qcfg, rcfg=rcfg, verbose=True,
                resume_dir=resume, resume_meta=meta,
            )
        summary, lat = run_eval(
            model, qvars, test, hypes,
            apply_fn=lambda v, b: qapply(v, act_scales, b),
        )

    emit(summary, lat, len(test), quant=args.quant)


if __name__ == "__main__":
    main()
