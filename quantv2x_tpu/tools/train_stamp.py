"""STAMP adapter training CLI (parity: opencood/tools/train_stamp.py:43-317).

Trains ONLY the adapter/reverter bridge between a frozen ego-modality stack
and a frozen protocol-modality stack, with the alpha-weighted five-feature
adapter loss (loss/adapter_loss.py) plus optional detection supervision
through the frozen heads (stage ``train_adapter_w_output``).

    python -m quantv2x_tpu.tools.train_stamp -y configs/v2xreal_lidar_pyramid.yaml \
        --run_dir runs/stamp [--ego_dir runs/ego] [--protocol_dir runs/proto] \
        [--stage train_adapter_w_output] [--synthetic N]

Checkpoint grafting mirrors stamp_tools.py/merge_model_w_adapter.py: the
ego/protocol runs' param trees are loaded whole into the wrapper's
``ego_model``/``protocol_model`` scopes; only ``bridge/*`` gets gradients.
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
    ap.add_argument("--run_dir", default="runs/stamp")
    ap.add_argument("--ego_dir", default="",
                    help="run dir of the trained ego collab model")
    ap.add_argument("--protocol_dir", default="",
                    help="run dir of the trained protocol (m0) model")
    ap.add_argument("--stage", default="train_adapter_w_output",
                    choices=["train_adapter", "train_adapter_w_output"])
    ap.add_argument("--synthetic", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--max_cav", type=int, default=2)
    ap.add_argument("--save_freq", type=int, default=5)
    ap.add_argument("--eval_freq", type=int, default=2)
    ap.add_argument("--alpha", nargs=3, type=float, default=[1.0, 1.0, 1.0],
                    metavar=("P2M", "M2P2M", "M2P"))
    args = ap.parse_args()

    from quantv2x_tpu.config.hypes import load_hypes, save_hypes
    from quantv2x_tpu.data import anchors as anc
    from quantv2x_tpu.data.pipeline import frame_to_batch, stack_batches
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.loss.adapter_loss import AdapterLossCfg, adapter_loss
    from quantv2x_tpu.loss.detection_loss import detection_loss
    from quantv2x_tpu.models.collab_model import PyramidCollabModel
    from quantv2x_tpu.models.stamp import StampCollabModel
    from quantv2x_tpu.train import checkpoint as ckpt
    from quantv2x_tpu.train.trainer import (
        assign_batch_targets, create_train_state, TrainState,
    )
    from quantv2x_tpu.utils.tb import ScalarWriter
    import optax

    hypes = load_hypes(args.hypes)
    model_cfg = dataclasses.replace(hypes.model, max_cav=args.max_cav)
    ego = PyramidCollabModel(model_cfg, name="ego_model")
    protocol = PyramidCollabModel(model_cfg, name="protocol_model")
    ch = model_cfg.backbone_filters[-1]

    def variant_spec(block):
        """hypes stamp.adapter/.reverter -> build_adapter spec. The short
        form ``{core_method: convnext, depth: N}`` keeps the compact
        bridge pair; a reference-parity core_method (adapterconv /
        adapterfc / adapterconvnext / adapterdsa / adapteratt / identity,
        adapter.py:811-856) selects a variant, with geometry defaulting
        to this config's fused-feature space (encode_agents emits
        (B, L, H/2, W/2, C) on the cav lidar range)."""
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

    stamp_raw = hypes.raw.get("stamp", {})
    model = StampCollabModel(
        ego_model=ego, protocol_model=protocol,
        protocol_channels=ch, local_channels=ch, stage=args.stage,
        adapter_spec=variant_spec(stamp_raw.get("adapter")),
        reverter_spec=variant_spec(stamp_raw.get("reverter")),
    )
    w_output = args.stage == "train_adapter_w_output"
    adapter_cfg = AdapterLossCfg(*args.alpha)

    # ---- data (synthetic driver until real clips are mounted) ------------
    frames = [
        make_frame(SyntheticCfg(
            lidar_range=hypes.voxel.lidar_range, num_agents=args.max_cav,
            num_objects=12, points_per_agent=20000, seed=s,
        ))
        for s in range(args.synthetic)
    ]
    batches = [frame_to_batch(f, hypes.voxel, max_cav=args.max_cav)
               for f in frames]
    n_val = max(len(batches) // 5, 1)
    val_groups = [stack_batches(*batches[:n_val])]
    train_b = batches[n_val:]
    args.batch_size = min(args.batch_size, max(len(batches), 1))
    groups = [
        stack_batches(*train_b[i:i + args.batch_size])
        for i in range(0, len(train_b) - args.batch_size + 1, args.batch_size)
    ]

    # ---- state: only bridge/* trains (train_stamp ref :107-119) ----------
    optim = dataclasses.replace(
        hypes.optim, steps_per_epoch=max(len(groups), 1))
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), groups[0], optim,
        trainable_predicate=lambda p: p.startswith("bridge"),
    )

    # graft pretrained stacks (reference loads model_dir ego.pth/protocol.pth)
    params = dict(state.params)
    bstats = dict(state.batch_stats)
    for scope, run_dir in (("ego_model", args.ego_dir),
                           ("protocol_model", args.protocol_dir)):
        if not run_dir:
            continue
        sub_like = {"params": params[scope], "batch_stats": bstats.get(scope, {})}
        import orbax.checkpoint as ocp
        ep = ckpt.latest_epoch(run_dir)
        with ocp.StandardCheckpointer() as c:
            full = c.restore(os.path.join(os.path.abspath(run_dir),
                                          f"epoch_{ep}"))
        params[scope] = full["params"]
        if full.get("batch_stats"):
            bstats[scope] = full["batch_stats"]
        print(f"[stamp] grafted {run_dir} (epoch {ep}) -> {scope}")
    state = state.replace(params=params, batch_stats=bstats)

    anchor_pack = anc.generate_anchors(hypes.anchors)
    loss_cfg = hypes.loss

    def loss_fn(p, bs, batch, labels):
        out = model.apply({"params": p, "batch_stats": bs}, batch, train=True)
        outputs, feats = out
        total, metrics = adapter_loss(*feats, adapter_cfg)
        if w_output and outputs is not None:
            det, det_m = detection_loss(outputs, labels, loss_cfg)
            total = total + det
            metrics = dict(metrics, **det_m, det_loss=det)
        metrics = dict(metrics, total_loss=total)
        return total, metrics

    @jax.jit
    def step(state: TrainState, batch):
        labels = assign_batch_targets(batch, anchor_pack) if w_output else None
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, labels)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            params=optax.apply_updates(state.params, updates),
            opt_state=new_opt, step=state.step + 1,
        ), metrics

    @jax.jit
    def eval_step(state: TrainState, batch):
        labels = assign_batch_targets(batch, anchor_pack) if w_output else None
        _, metrics = loss_fn(state.params, state.batch_stats, batch, labels)
        return metrics

    os.makedirs(args.run_dir, exist_ok=True)
    save_hypes(hypes, os.path.join(args.run_dir, "config.yaml"))
    writer = ScalarWriter(args.run_dir)
    log_path = os.path.join(args.run_dir, "train_log.jsonl")
    best_val, best_epoch = float("inf"), -1

    for epoch in range(args.epochs):
        t0 = time.time()
        tot, n = 0.0, 0
        rng = np.random.default_rng(epoch)
        for j in rng.permutation(len(groups)):
            state, metrics = step(state, groups[j])
            tot += float(metrics["total_loss"])
            n += 1
        writer.scalars({"train_loss": tot / max(n, 1)}, epoch)
        line = {"epoch": epoch, "loss": round(tot / max(n, 1), 5),
                "sec": round(time.time() - t0, 1)}
        if epoch % args.eval_freq == 0:
            vals = [float(eval_step(state, g)["total_loss"])
                    for g in val_groups]
            v = float(np.mean(vals))
            writer.scalars({"Validate_Loss": v}, epoch)
            line["val_loss"] = round(v, 5)
            if v < best_val:
                prev_best = best_epoch
                best_val, best_epoch = v, epoch
                ckpt.save_checkpoint(
                    args.run_dir, epoch, state, best_val=v,
                    prev_best_epoch=prev_best if prev_best >= 0 else None)
        print(f"[stamp] {line}")
        with open(log_path, "a") as f:
            f.write(json.dumps(line) + "\n")
        if (epoch + 1) % args.save_freq == 0 or epoch == args.epochs - 1:
            ckpt.save_checkpoint(args.run_dir, epoch, state)
    writer.close()
    print(f"[stamp] done; best val {best_val:.5f} @ epoch {best_epoch}")


if __name__ == "__main__":
    main()
