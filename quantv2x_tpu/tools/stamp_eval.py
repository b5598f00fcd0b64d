"""STAMP heterogeneous-transfer AP evaluation.

Parity: the reference evaluates STAMP by fusing collaborators that run a
DIFFERENT (protocol) model stack through the adapter/reverter bridge into
the ego model's pyramid (heter_model_baseline_w_stamp.py:885-931,
stamp_modules/adapter.py:93-856). Three rows on the same held-out frames:

  ego_homogeneous   all agents ego-encoded (upper anchor; no bridge)
  hetero_raw        collaborators protocol-encoded, fused UNBRIDGED
                    (the feature-space-mismatch failure STAMP fixes)
  hetero_stamp      collaborators protocol-encoded -> reverter -> ego
                    fusion (the trained bridge row)

    python -m quantv2x_tpu.tools.stamp_eval -y configs/v2x_real/stamp_dsa_small.yaml \
        --stamp_dir runs/stamp_small --ego_dir runs/acc_small_r4 \
        --protocol_dir runs/proto_small --json runs/eval_stamp.json
"""

import argparse
import dataclasses
import json
import os

import jax
import numpy as np


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-y", "--hypes", required=True)
    ap.add_argument("--stamp_dir", required=True,
                    help="train_stamp run dir (bridge params)")
    ap.add_argument("--ego_dir", required=True)
    ap.add_argument("--protocol_dir", required=True)
    ap.add_argument("--synthetic", type=int, default=16)
    ap.add_argument("--max_cav", type=int, default=2)
    ap.add_argument("--objects", type=int, default=12)
    ap.add_argument("--points", type=int, default=20000)
    ap.add_argument("--test_seed_base", type=int, default=1016)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from quantv2x_tpu.config.hypes import load_hypes
    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.models.collab_model import PyramidCollabModel
    from quantv2x_tpu.models.stamp import StampCollabModel
    from quantv2x_tpu.tools.inference import run_eval
    from quantv2x_tpu.train import checkpoint as ckpt
    from quantv2x_tpu.train.trainer import OptimCfg, create_train_state

    hypes = load_hypes(args.hypes)
    model_cfg = dataclasses.replace(hypes.model, max_cav=args.max_cav)
    ch = model_cfg.backbone_filters[-1]

    # same variant resolution as train_stamp (the bridge params must match)
    stamp_raw = hypes.raw.get("stamp", {})

    def spec(block):
        # re-derive the adapter spec exactly as the trainer does
        if not block:
            return None
        cm = str(block.get("core_method", "convnext"))
        if cm == "convnext":
            return None
        H, W = model_cfg.bev_hw
        a = dict(block.get("args", {}))
        a.setdefault("in_channels", ch)
        a.setdefault("out_channels", ch)
        a.setdefault("in_cav_lidar_range", list(hypes.voxel.lidar_range))
        a.setdefault("out_cav_lidar_range", list(hypes.voxel.lidar_range))
        a.setdefault("in_feature_shape", [H // 2, W // 2])
        a.setdefault("out_feature_shape", [H // 2, W // 2])
        sub = {k: v for k, v in block.items()
               if k not in ("core_method", "args")}
        if sub:
            a.setdefault("submodule_args", sub)
        return {"core_method": cm, "args": a}

    frames = [
        make_frame(SyntheticCfg(
            lidar_range=hypes.voxel.lidar_range, num_agents=args.max_cav,
            num_objects=args.objects, points_per_agent=args.points,
            seed=args.test_seed_base + s))
        for s in range(args.synthetic)
    ]
    batches = [frame_to_batch(f, hypes.voxel, max_cav=args.max_cav)
               for f in frames]

    import orbax.checkpoint as ocp

    def load_full(run_dir):
        ep = ckpt.latest_epoch(run_dir)
        with ocp.StandardCheckpointer() as c:
            return c.restore(os.path.join(os.path.abspath(run_dir),
                                          f"epoch_{ep}")), ep

    results = {}
    for stage in ("infer_hetero", "infer_hetero_raw"):
        ego = PyramidCollabModel(model_cfg, name="ego_model")
        protocol = PyramidCollabModel(model_cfg, name="protocol_model")
        model = StampCollabModel(
            ego_model=ego, protocol_model=protocol,
            protocol_channels=ch, local_channels=ch, stage=stage,
            adapter_spec=spec(stamp_raw.get("adapter")),
            reverter_spec=spec(stamp_raw.get("reverter")),
        )
        state, _tx = create_train_state(
            model, jax.random.PRNGKey(0), batches[0], OptimCfg())
        params = dict(state.params)
        bstats = dict(state.batch_stats)
        for scope, run_dir in (("ego_model", args.ego_dir),
                               ("protocol_model", args.protocol_dir)):
            full, ep = load_full(run_dir)
            params[scope] = full["params"]
            if full.get("batch_stats"):
                bstats[scope] = full["batch_stats"]
        full, ep = load_full(args.stamp_dir)
        if "bridge" in full["params"]:
            params["bridge"] = full["params"]["bridge"]
            print(f"[stamp_eval] bridge from {args.stamp_dir} epoch {ep}")
        variables = {"params": params, "batch_stats": bstats}
        summary, lat = run_eval(model, variables, batches, hypes)
        key = "hetero_stamp" if stage == "infer_hetero" else "hetero_raw"
        results[key] = summary
        print(f"[stamp_eval] {key}: mAP@0.5={summary['mAP'][0.5]:.4f}")

    # homogeneous anchor: the plain ego collab model on the same frames
    ego = PyramidCollabModel(model_cfg)
    state, _tx = create_train_state(
        ego, jax.random.PRNGKey(0), batches[0], OptimCfg())
    full, ep = load_full(args.ego_dir)
    variables = {"params": full["params"],
                 "batch_stats": full.get("batch_stats") or {}}
    summary, lat = run_eval(ego, variables, batches, hypes)
    results["ego_homogeneous"] = summary
    print(f"[stamp_eval] ego_homogeneous: mAP@0.5={summary['mAP'][0.5]:.4f}")

    out = {"rows": results, "frames": len(batches),
           "ego_dir": args.ego_dir, "protocol_dir": args.protocol_dir,
           "stamp_dir": args.stamp_dir}
    print(json.dumps(out, indent=2, default=float))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, default=float)


if __name__ == "__main__":
    main()
