"""Training CLI (parity: opencood/tools/train.py:45-231).

    python -m quantv2x_tpu.tools.train -y configs/v2xreal_lidar_pyramid.yaml \
        --run_dir runs/exp1 [--synthetic N] [--epochs E] [--devices data,agent]

Until the real V2X-Real loader lands, --synthetic N trains on N generated
multi-agent frames (same batch contract as the dataset pipeline).
"""

import argparse
import json
import os
import time

import jax
import numpy as np


def _backup_source(run_dir: str):
    """Snapshot the framework source into the run dir (parity:
    train_utils.backup_script — the reference copies models/data_utils/
    utils/loss next to every checkpoint so a run is reproducible even
    after the repo moves on). One zip instead of a file tree."""
    import zipfile

    import quantv2x_tpu

    pkg = os.path.dirname(quantv2x_tpu.__file__)
    out = os.path.join(run_dir, "source_backup.zip")
    try:
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
            for base, _, files in os.walk(pkg):
                for fn in files:
                    if fn.endswith(".py"):
                        p = os.path.join(base, fn)
                        z.write(p, os.path.relpath(p, os.path.dirname(pkg)))
    except OSError as e:      # never fail a run over a snapshot
        print(f"[train] source backup skipped: {e}")


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-y", "--hypes", required=True)
    ap.add_argument("--run_dir", default="runs/default")
    ap.add_argument("--synthetic", type=int, default=32,
                    help="number of synthetic frames (0 = use dataset dirs)")
    ap.add_argument("--max_frames", type=int, default=512,
                    help="cap on dataset frames loaded when --synthetic 0")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--max_cav", type=int, default=2)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--save_freq", type=int, default=10,
                    help="checkpoint every N epochs (saves are expensive over a remote-TPU tunnel)")
    ap.add_argument("--augment", action="store_true",
                    help="apply flip/rotation/scale augmentation when generating frames")
    ap.add_argument("--mesh", default="", help="e.g. '4,2' = data4 x agent2")
    ap.add_argument("--preload", action="store_true",
                    help="legacy mode: load up to --max_frames once, "
                    "voxelize once, keep groups device-resident (cheap "
                    "over a remote-TPU tunnel but caps the epoch at "
                    "--max_frames and freezes the augmentation draw). "
                    "Default for --synthetic 0 is STREAMING: PrefetchLoader "
                    "re-reads + re-augments + re-voxelizes every epoch "
                    "(the reference DataLoader-worker path, train.py:57-72)")
    ap.add_argument("--epoch_reload", action="store_true",
                    help=argparse.SUPPRESS)  # merged into default streaming
    ap.add_argument("--val_frames", type=int, default=32,
                    help="validation frames per val pass (0 = no val)")
    ap.add_argument("--val_freq", type=int, default=1,
                    help="validate every N epochs (best-val checkpointing)")
    ap.add_argument("--init_from", default="",
                    help="run dir to warm-start params/batch_stats from "
                         "(graft by leaf path; missing leaves keep init — "
                         "HEAL stage-2 style)")
    ap.add_argument("--trainable", default="",
                    help="regex over param scopes; non-matching params are "
                         "frozen (e.g. 'lss_m3|aligner_m3')")
    args = ap.parse_args()

    from quantv2x_tpu.config.hypes import load_hypes
    from quantv2x_tpu.data import anchors as anc
    from quantv2x_tpu.data.pipeline import frame_to_batch, stack_batches
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.models.collab_model import PyramidCollabModel
    from quantv2x_tpu.train import checkpoint as ckpt
    from quantv2x_tpu.train.trainer import (
        create_train_state, make_train_step,
    )

    hypes = load_hypes(args.hypes)
    epochs = args.epochs or hypes.raw.get("train_params", {}).get("epoches", 18)
    batch_size = args.batch_size or hypes.raw.get("train_params", {}).get(
        "batch_size", 2
    )
    max_cav = args.max_cav

    import dataclasses
    model_cfg = dataclasses.replace(hypes.model, max_cav=max_cav)
    from quantv2x_tpu.models.registry import create_model
    model, contract = create_model(hypes, max_cav=max_cav)
    if contract != "collab":
        raise SystemExit(
            f"train.py drives the cooperative batch contract; "
            f"{hypes.raw['model']['core_method']!r} is a {contract!r}-"
            "contract model — use its dedicated driver/tests")

    # ---- data ------------------------------------------------------------
    # three sources: synthetic in-memory frames, a dataset tree streamed
    # per epoch (DEFAULT for --synthetic 0), or a dataset tree preloaded
    # once (--preload, the remote-tunnel-friendly legacy mode)
    ds = None
    val_ds = None
    streaming = False
    # heter configs: synthetic frames carry the camera rig + modality ids
    # (reference: modality_assign JSON; here round-robin over modalities)
    from quantv2x_tpu.data.synthetic import hypes_synth_extras
    synth_extras, assign_modality = hypes_synth_extras(hypes.raw)
    if args.synthetic:
        print(f"[train] generating {args.synthetic} synthetic frames...")
        frames = [
            assign_modality(make_frame(SyntheticCfg(
                lidar_range=hypes.voxel.lidar_range, num_agents=max_cav,
                num_objects=12, points_per_agent=20000, seed=s,
                **synth_extras,
            )))
            for s in range(args.synthetic)
        ]
        if args.augment:
            from quantv2x_tpu.data.augment import augment_frame
            rng_aug = np.random.default_rng(123)
            frames += [augment_frame(f, rng_aug) for f in frames]
    else:
        from quantv2x_tpu.data.dataset import build_frame_source
        ds = build_frame_source(hypes.raw, "train", max_cav=max_cav)
        if hypes.raw.get("validate_dir") and \
                hypes.raw["validate_dir"] != hypes.raw.get("root_dir"):
            try:
                val_ds = build_frame_source(hypes.raw, "val",
                                            max_cav=max_cav)
            except FileNotFoundError:
                val_ds = None
        streaming = not args.preload
        if streaming:
            print(f"[train] streaming {len(ds)} frames/epoch from "
                  f"{hypes.raw.get('root_dir')}")
        else:
            n = min(len(ds), args.max_frames)
            print(f"[train] preloading {n}/{len(ds)} frames from "
                  f"{hypes.raw.get('root_dir')}")
            frames = [ds[i] for i in range(n)]
            if args.augment:
                from quantv2x_tpu.data.augment import augment_frame
                rng_aug = np.random.default_rng(123)
                frames += [augment_frame(f, rng_aug) for f in frames]

    if streaming:
        from quantv2x_tpu.data.loader import PrefetchLoader
        source = ds
        if args.augment:
            from quantv2x_tpu.data.augment import AugmentedSource
            source = AugmentedSource(ds, seed=123)
        n_frames = min(len(ds), args.max_frames)
        loader = PrefetchLoader(source, hypes.voxel, max_cav=max_cav,
                                indices=range(n_frames), shuffle=True,
                                reinitialize=True, seed=11)
        sample_frame = ds[0]
        groups = None
        steps_per_epoch = max(n_frames // batch_size, 1)
        sample = stack_batches(*[
            frame_to_batch(sample_frame, hypes.voxel, max_cav=max_cav)
        ] * batch_size)

        def batched(epoch_seed):
            buf = []
            for b in loader:
                buf.append(b)
                if len(buf) == batch_size:
                    g = stack_batches(*buf)
                    buf = []
                    yield g
    else:
        batches = [frame_to_batch(f, hypes.voxel, max_cav=max_cav)
                   for f in frames]
        if not batches:
            raise SystemExit(
                "no training frames (check --synthetic / root_dir)")
        batch_size = min(batch_size, len(batches))
        # pre-stack fixed groups once (device-resident); epochs shuffle
        # group order only — avoids per-epoch eager concatenation over the
        # TPU tunnel
        groups = [
            stack_batches(*batches[i:i + batch_size])
            for i in range(0, len(batches) - batch_size + 1, batch_size)
        ]
        steps_per_epoch = max(len(batches) // batch_size, 1)
        sample = groups[0]

        def batched(epoch_seed):
            rng = np.random.default_rng(epoch_seed)
            for j in rng.permutation(len(groups)):
                yield groups[j]

    # ---- state -----------------------------------------------------------
    optim = dataclasses.replace(hypes.optim,
                                steps_per_epoch=steps_per_epoch)
    trainable = None
    if args.trainable:
        import re
        pat = re.compile(args.trainable)
        trainable = lambda path: bool(pat.search(path))  # noqa: E731
    state, tx = create_train_state(model, jax.random.PRNGKey(0), sample,
                                   optim, trainable_predicate=trainable)
    if args.init_from:
        # warm start from another run's checkpoint: graft params/batch_stats
        # by leaf path (new branches keep their init) — HEAL stage-2
        donor, don_ep = ckpt.restore_checkpoint(args.init_from, state)
        state = state.replace(params=donor.params,
                              batch_stats=donor.batch_stats)
        print(f"[train] warm-started from {args.init_from} epoch {don_ep}")
    start_epoch = 0
    if args.resume:
        try:
            state, start_epoch = ckpt.restore_checkpoint(args.run_dir, state)
            start_epoch += 1
            print(f"[train] resumed from epoch {start_epoch - 1}")
        except FileNotFoundError:
            pass

    anchor_pack = anc.generate_anchors(hypes.anchors)
    step = jax.jit(make_train_step(model, tx, anchor_pack, hypes.loss,
                                   trainable_predicate=trainable))

    # multi-chip: shard batches over a (data, agent) mesh; XLA inserts the
    # gradient all-reduce (replaces the reference's DDP/NCCL, train_ddp.py)
    mesh_ctx = None
    shard_fn = lambda g: g  # noqa: E731
    if args.mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from quantv2x_tpu.parallel.sharding import make_mesh, shard_batch
        nd, na = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh(n_data=nd, n_agent=na)
        mesh_ctx = jax.set_mesh(mesh)
        mesh_ctx.__enter__()
        shard_fn = lambda g: shard_batch(mesh, g)  # noqa: E731
        state = jax.device_put(state, NamedSharding(mesh, P()))
        print(f"[train] sharded over mesh data={nd} agent={na}")

    # ---- validation (best-val checkpointing, reference train.py:181-215)
    val_batches = []
    if args.val_frames:
        if val_ds is not None:
            nval = min(len(val_ds), args.val_frames)
            val_frames = [val_ds[i] for i in range(nval)]
        elif args.synthetic:
            val_frames = [
                assign_modality(make_frame(SyntheticCfg(
                    lidar_range=hypes.voxel.lidar_range,
                    num_agents=max_cav, num_objects=12,
                    points_per_agent=20000, seed=5000 + s,
                    **synth_extras,
                )))
                for s in range(min(args.val_frames, 16))
            ]
        else:
            val_frames = []
        vb = [frame_to_batch(f, hypes.voxel, max_cav=max_cav)
              for f in val_frames]
        val_batches = [
            shard_fn(stack_batches(*vb[i:i + batch_size]))
            for i in range(0, len(vb) - batch_size + 1, batch_size)
        ]
    eval_step = None
    if val_batches:
        from quantv2x_tpu.train.trainer import make_eval_step
        eval_step = jax.jit(make_eval_step(model, anchor_pack, hypes.loss))

    os.makedirs(args.run_dir, exist_ok=True)
    from quantv2x_tpu.config.hypes import save_hypes
    save_hypes(hypes, os.path.join(args.run_dir, "config.yaml"))
    _backup_source(args.run_dir)

    log_path = os.path.join(args.run_dir, "train_log.jsonl")
    best_val, best_epoch = float("inf"), None
    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        n, tot = 0, 0.0
        for batch in batched(epoch):
            state, metrics = step(state, shard_fn(batch))
            tot += float(metrics["total_loss"])
            n += 1
        dt = time.time() - t0
        avg = tot / max(n, 1)
        line = {"epoch": epoch, "loss": round(avg, 4),
                "steps": n, "sec": round(dt, 1)}
        if eval_step is not None and (epoch + 1) % args.val_freq == 0:
            vtot = sum(float(eval_step(state, vb)[0]["total_loss"])
                       for vb in val_batches)
            vavg = vtot / len(val_batches)
            line["val_loss"] = round(vavg, 4)
            if vavg < best_val:
                best_val, prev = vavg, best_epoch
                best_epoch = epoch
                ckpt.save_checkpoint(args.run_dir, epoch, state,
                                     best_val=best_val,
                                     prev_best_epoch=prev)
                line["best"] = True
        print(f"[train] {line}")
        with open(log_path, "a") as f:
            f.write(json.dumps(line) + "\n")
        if (epoch + 1) % args.save_freq == 0 or epoch == epochs - 1:
            ckpt.save_checkpoint(args.run_dir, epoch, state)
    print("[train] done")


if __name__ == "__main__":
    main()
