"""GenComm two-stage training CLI (parity: the train drivers for
heter_model_baseline_w_gencomm_stage{1,2} and
loss/point_pillar_gencomm_pyramid_loss_mc.py).

Stage 1 trains the conditional diffusion denoiser + message extractor on
frozen agent features; stage 2 freezes the denoiser (and everything else)
and tunes only the collaborator message extractor through detection loss.

    python -m quantv2x_tpu.tools.train_gencomm -y configs/v2xreal_lidar_pyramid.yaml \
        --run_dir runs/gencomm1 --stage 1 [--base_dir runs/collab] \
        [--resume_from runs/gencomm1]   # stage 2 resumes stage 1's gencomm

Loss = detection + w_feat·MSE(gt_feature, pred_feature) + w_ddpm·DDPM.
"""

import argparse
import dataclasses
import json
import os
import time

import jax
import numpy as np


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-y", "--hypes", required=True)
    ap.add_argument("--run_dir", default="runs/gencomm")
    ap.add_argument("--stage", type=int, default=1, choices=[1, 2])
    ap.add_argument("--base_dir", default="",
                    help="run dir of the trained collab detection model")
    ap.add_argument("--resume_from", default="",
                    help="stage-1 run dir whose gencomm params seed stage 2")
    ap.add_argument("--synthetic", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--max_cav", type=int, default=2)
    ap.add_argument("--save_freq", type=int, default=5)
    ap.add_argument("--w_feat", type=float, default=1.0)
    ap.add_argument("--w_ddpm", type=float, default=1.0)
    ap.add_argument("--message_channels", type=int, default=8)
    args = ap.parse_args()

    from quantv2x_tpu.config.hypes import load_hypes, save_hypes
    from quantv2x_tpu.data import anchors as anc
    from quantv2x_tpu.data.pipeline import frame_to_batch, stack_batches
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.loss.detection_loss import detection_loss
    from quantv2x_tpu.models.collab_model import PyramidCollabModel
    from quantv2x_tpu.models.gencomm import GenCommCfg, GenCommCollabModel
    from quantv2x_tpu.train import checkpoint as ckpt
    from quantv2x_tpu.train.trainer import (
        assign_batch_targets, create_train_state, TrainState,
    )
    from quantv2x_tpu.utils.tb import ScalarWriter
    import optax

    hypes = load_hypes(args.hypes)
    model_cfg = dataclasses.replace(hypes.model, max_cav=args.max_cav)
    base = PyramidCollabModel(model_cfg, name="base_model")
    gcfg = GenCommCfg(channels=model_cfg.backbone_filters[-1],
                      message_channels=args.message_channels)
    margs = hypes.raw.get("model", {}).get("args", {})
    model = GenCommCollabModel(base_model=base, cfg=gcfg,
                               use_enhancer="enhancer" in margs)

    frames = [
        make_frame(SyntheticCfg(
            lidar_range=hypes.voxel.lidar_range, num_agents=args.max_cav,
            num_objects=12, points_per_agent=20000, seed=s,
        ))
        for s in range(args.synthetic)
    ]
    batches = [frame_to_batch(f, hypes.voxel, max_cav=args.max_cav)
               for f in frames]
    args.batch_size = min(args.batch_size, max(len(batches), 1))
    groups = [
        stack_batches(*batches[i:i + args.batch_size])
        for i in range(0, len(batches) - args.batch_size + 1, args.batch_size)
    ]

    # stage 1: all of gencomm (+ the optional enhancer, which lives at the
    # top level of the param tree) trains; stage 2: extractor only — the
    # reference likewise keeps the trained enhancer frozen in stage 2
    # (fix_modules += ["enhancer"], stage2:178)
    if args.stage == 1:
        predicate = lambda p: (p.startswith("gencomm")
                               or p.startswith("enhancer"))
    else:
        predicate = lambda p: p.startswith("gencomm/extractor")
    optim = dataclasses.replace(hypes.optim,
                                steps_per_epoch=max(len(groups), 1))
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), groups[0], optim,
        trainable_predicate=predicate,
        init_rngs={"diffusion": jax.random.PRNGKey(7)},
    )

    # graft pretrained subtrees
    import orbax.checkpoint as ocp
    params = dict(state.params)
    bstats = dict(state.batch_stats)
    if args.base_dir:
        ep = ckpt.latest_epoch(args.base_dir)
        with ocp.StandardCheckpointer() as c:
            full = c.restore(os.path.join(os.path.abspath(args.base_dir),
                                          f"epoch_{ep}"))
        params["base_model"] = full["params"]
        if full.get("batch_stats"):
            bstats["base_model"] = full["batch_stats"]
        print(f"[gencomm] grafted detector {args.base_dir} (epoch {ep})")
    if args.resume_from:
        ep = ckpt.latest_epoch(args.resume_from)
        with ocp.StandardCheckpointer() as c:
            full = c.restore(os.path.join(os.path.abspath(args.resume_from),
                                          f"epoch_{ep}"))
        params["gencomm"] = full["params"]["gencomm"]
        if "enhancer" in full["params"] and "enhancer" in params:
            # carry the stage-1-trained enhancer into stage 2 (frozen there)
            params["enhancer"] = full["params"]["enhancer"]
        print(f"[gencomm] seeded gencomm from {args.resume_from} (epoch {ep})")
    state = state.replace(params=params, batch_stats=bstats)

    anchor_pack = anc.generate_anchors(hypes.anchors)
    loss_cfg = hypes.loss

    def loss_fn(p, bs, batch, labels, rng):
        out, mut = model.apply({"params": p, "batch_stats": bs}, batch,
                               train=True, rngs={"diffusion": rng},
                               mutable=["batch_stats"])
        det, metrics = detection_loss(out, labels, loss_cfg)
        feat = ((out["gt_feature"] - out["pred_feature"]) ** 2).mean()
        total = det + args.w_feat * feat + args.w_ddpm * out["ddpm_loss"]
        metrics = dict(metrics, det_loss=det, feat_loss=feat,
                       ddpm_loss=out["ddpm_loss"], total_loss=total)
        return total, (mut["batch_stats"], metrics)

    @jax.jit
    def step(state: TrainState, batch):
        labels = assign_batch_targets(batch, anchor_pack)
        rng = jax.random.fold_in(jax.random.PRNGKey(23), state.step)
        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, labels, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            params=optax.apply_updates(state.params, updates),
            batch_stats=new_bs, opt_state=new_opt, step=state.step + 1,
        ), metrics

    os.makedirs(args.run_dir, exist_ok=True)
    save_hypes(hypes, os.path.join(args.run_dir, "config.yaml"))
    writer = ScalarWriter(args.run_dir)
    log_path = os.path.join(args.run_dir, "train_log.jsonl")
    for epoch in range(args.epochs):
        t0 = time.time()
        tot = {"total_loss": 0.0, "ddpm_loss": 0.0, "feat_loss": 0.0}
        n = 0
        rng = np.random.default_rng(epoch)
        for j in rng.permutation(len(groups)):
            state, metrics = step(state, groups[j])
            for k in tot:
                tot[k] += float(metrics[k])
            n += 1
        avg = {k: v / max(n, 1) for k, v in tot.items()}
        writer.scalars(avg, epoch)
        line = {"epoch": epoch, **{k: round(v, 5) for k, v in avg.items()},
                "sec": round(time.time() - t0, 1)}
        print(f"[gencomm s{args.stage}] {line}")
        with open(log_path, "a") as f:
            f.write(json.dumps(line) + "\n")
        if (epoch + 1) % args.save_freq == 0 or epoch == args.epochs - 1:
            ckpt.save_checkpoint(args.run_dir, epoch, state)
    writer.close()
    print("[gencomm] done")


if __name__ == "__main__":
    main()
