"""Codebook 3-stage training driver (parity: tools/train_stage2.py /
train_stage3.py + SURVEY.md §3.4).

Stage 1: plain detection training (tools/train.py) of the collab model.
Stage 2: attach the UMGM codebook at the communication point, FREEZE
         everything else, train only codebook params on detection +
         codebook reconstruction loss (train_stage2.py:67-95).
Stage 3: unfreeze, co-train the whole pipeline at low lr.

    python -m quantv2x_tpu.tools.train_codebook -y configs/... \
        --stage1_dir runs/stage1 --run_dir runs/stage2 --stage 2
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
    ap.add_argument("--stage", type=int, choices=[2, 3], default=2)
    ap.add_argument("--stage1_dir", required=False, default=None,
                    help="run dir holding the stage-1 (or stage-2) checkpoint")
    ap.add_argument("--run_dir", default="runs/codebook_stage2")
    ap.add_argument("--synthetic", type=int, default=24)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--max_cav", type=int, default=2)
    ap.add_argument("--seg_num", type=int, default=2)
    ap.add_argument("--dict_size", type=int, default=256)
    ap.add_argument("--levels", type=int, default=3,
                    help="residual codebook levels (wire = "
                         "levels*seg_num*log2(dict_size) bits/px)")
    ap.add_argument("--wire_mix", type=float, default=0.0,
                    help="stage-3 only: probability a train step runs "
                         "with the wire BYPASSED (mixed wire/no-wire "
                         "co-training keeps the detector usable without "
                         "the codebook; r4's wire-only stage 3 dropped "
                         "no-wire mAP@0.5 0.794 -> 0.527)")
    ap.add_argument("--objects", type=int, default=12,
                    help="synthetic scene objects (match the stage-1 run)")
    ap.add_argument("--points", type=int, default=20000,
                    help="synthetic points per agent (match stage 1)")
    args = ap.parse_args()

    from quantv2x_tpu.config.hypes import load_hypes
    from quantv2x_tpu.data import anchors as anc
    from quantv2x_tpu.data.pipeline import frame_to_batch, stack_batches
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.models.codebook import CodebookCompressor
    from quantv2x_tpu.models.collab_model import PyramidCollabModel
    from quantv2x_tpu.train import checkpoint as ckpt
    from quantv2x_tpu.train.trainer import (
        create_train_state, make_train_step,
    )

    hypes = load_hypes(args.hypes)
    mcfg = dataclasses.replace(hypes.model, max_cav=args.max_cav)
    compressor = CodebookCompressor(
        channel=mcfg.backbone_filters[-1], seg_num=args.seg_num,
        dict_sizes=(args.dict_size,) * args.levels, dtype=mcfg.jnp_dtype,
    )
    model = PyramidCollabModel(mcfg, compressor=compressor)

    frames = [
        make_frame(SyntheticCfg(
            lidar_range=hypes.voxel.lidar_range, num_agents=args.max_cav,
            num_objects=args.objects, points_per_agent=args.points, seed=s,
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

    optim = dataclasses.replace(
        hypes.optim,
        lr=hypes.optim.lr if args.stage == 2 else hypes.optim.lr * 0.1,
        steps_per_epoch=len(groups),
    )
    trainable = (
        (lambda p: p.startswith("compressor")) if args.stage == 2 else None
    )
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), groups[0], optim,
        trainable_predicate=trainable,
        init_rngs={"gumbel": jax.random.PRNGKey(11)},
    )

    # restore the previous stage's weights (check_missing_key-style
    # partial load, train_utils.py:145-168).
    #   stage 2: --stage1_dir is a stage-1 run — no compressor subtree,
    #     so restore into a compressor-less twin and keep the codebook's
    #     fresh init;
    #   stage 3: --stage1_dir is a stage-2 run — the checkpoint HAS the
    #     trained codebook, which co-training must start from (restoring
    #     into the compressor-less twin would silently drop it and train
    #     detection weights against random codewords).
    if args.stage1_dir:
        if args.stage == 3:
            prev, epoch = ckpt.restore_checkpoint(args.stage1_dir, state)
            state = prev
            assert "compressor" in state.params, (
                "--stage 3 expects a stage-2 run dir (with trained "
                "codebook); got a checkpoint without a compressor subtree")
        else:
            base_model = PyramidCollabModel(mcfg)
            base_state, _ = create_train_state(
                base_model, jax.random.PRNGKey(0), groups[0], optim
            )
            prev, epoch = ckpt.restore_checkpoint(args.stage1_dir,
                                                  base_state)
            merged = dict(state.params)
            for k in merged:
                if k in prev.params and k != "compressor":
                    merged[k] = prev.params[k]
            state = state.replace(params=merged,
                                  batch_stats=prev.batch_stats)
        print(f"[codebook] loaded stage-{args.stage - 1} weights from "
              f"epoch {epoch}")

    anchor_pack = anc.generate_anchors(hypes.anchors)
    # stage 2: the detector is FROZEN — run it in eval mode (stage-1 BN
    # running stats, no buffer drift) and keep only the compressor on the
    # gumbel train path. Round 4 ran the whole model in train mode: the
    # "frozen" detector co-adapted through its BatchNorm buffers, which
    # is why its wire-bypassed eval collapsed (cls logits shifted by the
    # wire-distribution stats).
    step = jax.jit(make_train_step(
        model, tx, anchor_pack, hypes.loss,
        trainable_predicate=trainable,
        apply_train_kwargs=({"train": False, "compressor_train": True}
                            if args.stage == 2 else {"train": True}),
    ))

    os.makedirs(args.run_dir, exist_ok=True)
    log_path = os.path.join(args.run_dir, "train_log.jsonl")
    for epoch in range(args.epochs):
        t0 = time.time()
        rng = np.random.default_rng(epoch)
        tot, naux, n = 0.0, 0.0, 0
        for j in rng.permutation(len(groups)):
            g = groups[j]
            if args.wire_mix > 0.0:
                g = dict(g)
                g["wire_bypass"] = np.bool_(rng.random() < args.wire_mix)
            state, metrics = step(state, g)
            tot += float(metrics["total_loss"])
            naux += float(metrics.get("aux_loss", 0.0))
            n += 1
        # dead-code reassignment between epochs (codebook.py reAssignCodebook)
        from quantv2x_tpu.models.codebook_utils import reassign_dead_codes
        new_params, n_dead = reassign_dead_codes(
            state.params, dict(state.extra_vars).get("codebook_stats", {}),
            jax.random.PRNGKey(1000 + epoch),
        )
        if n_dead:
            state = state.replace(params=new_params)
        line = {"epoch": epoch, "loss": round(tot / n, 4),
                "codebook_loss": round(naux / n, 4), "dead_codes": n_dead,
                "sec": round(time.time() - t0, 1)}
        print(f"[codebook s{args.stage}] {line}")
        with open(log_path, "a") as f:
            f.write(json.dumps(line) + "\n")
        if (epoch + 1) % 10 == 0 or epoch == args.epochs - 1:
            ckpt.save_checkpoint(args.run_dir, epoch, state)
    print("[codebook] done")


if __name__ == "__main__":
    main()
