"""Hard-quantized codebook inference with explicit encode/decode separation.

Parity: tools/inference_mc_codebook_encdec.py (+ _cached variant) and
models/heter_pyramid_collab_codebook_mc_encdec.py:33-208 — the transmit
side runs encoder -> codebook.encode -> integer codes (the wire payload);
the receive side runs codebook.decode -> fusion -> heads. --cache_dir
writes/reads the codes as .npz between the two stages (the disk-cache
V2X-channel emulation).

    python -m quantv2x_tpu.tools.inference_codebook_encdec -y configs/... \
        --run_dir runs/codebook_stage2 [--cache_dir /tmp/codes]
"""

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-y", "--hypes", required=True)
    ap.add_argument("--run_dir", default=None)
    ap.add_argument("--synthetic", type=int, default=8)
    ap.add_argument("--max_cav", type=int, default=2)
    ap.add_argument("--seg_num", type=int, default=2)
    ap.add_argument("--dict_size", type=int, default=256)
    ap.add_argument("--levels", type=int, default=3,
                    help="residual codebook levels (wire = "
                         "levels*seg_num*log2(dict_size) bits/px)")
    ap.add_argument("--ego_fp", action="store_true",
                    help="serving ablation: the ego keeps its LOCAL FP "
                         "feature and only collaborator messages cross "
                         "the wire (the reference round-trips all agents "
                         "incl. ego, heter_pyramid_collab_codebook_mc.py"
                         ":113-128 — but an ego never transmits to "
                         "itself; requires a wire-robust detector, i.e. "
                         "mixed stage-3 training)")
    ap.add_argument("--no_anchor", action="store_true",
                    help="skip the same-frames no-wire FP row (ap_nowire) "
                         "— it is evaluated by default so every encdec "
                         "JSON carries its own seed-matched anchor")
    ap.add_argument("--cache_dir", default=None)
    ap.add_argument("--calib", type=int, default=4,
                    help="engine calibration frames, drawn from the "
                         "DISJOINT 1000+ seed pool (inference.py "
                         "protocol; r4 calibrated on the first 4 eval "
                         "frames — both a leak and a 4-batch clip search)")
    ap.add_argument("--engine_clip", choices=["mse", "entropy", "percentile"],
                    default="mse")
    ap.add_argument("--engine_adaround", type=int, default=0,
                    help="block-AdaRound iters for the engine tables "
                         "(reference-scale: 5000)")
    ap.add_argument("--engine", choices=["none", "int8_fused"],
                    default="none",
                    help="run encode/decode through the int8 fused-block "
                         "engine — the fully-quantized multi-agent "
                         "pipeline (north-star config #4: INT8 encoder + "
                         "codebook wire + INT8 fusion)")
    ap.add_argument("--objects", type=int, default=12)
    ap.add_argument("--points", type=int, default=20000)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from quantv2x_tpu.config.hypes import load_hypes
    from quantv2x_tpu.data import anchors as anc
    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.postprocess import decode_detections
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.models.codebook import CodebookCompressor
    from quantv2x_tpu.models.collab_model import PyramidCollabModel
    from quantv2x_tpu.train import checkpoint as ckpt
    from quantv2x_tpu.train.trainer import OptimCfg, create_train_state
    from quantv2x_tpu.utils import box_utils as bu
    from quantv2x_tpu.utils.eval_ap import (
        accumulate_frame, mask_gt_range, new_result_stat, summarize,
    )

    hypes = load_hypes(args.hypes)
    mcfg = dataclasses.replace(hypes.model, max_cav=args.max_cav)
    compressor = CodebookCompressor(
        channel=mcfg.backbone_filters[-1], seg_num=args.seg_num,
        dict_sizes=(args.dict_size,) * args.levels, dtype=mcfg.jnp_dtype,
    )
    model = PyramidCollabModel(mcfg, compressor=compressor)

    def _batch(seed):
        return frame_to_batch(
            make_frame(SyntheticCfg(
                lidar_range=hypes.voxel.lidar_range, num_agents=args.max_cav,
                num_objects=args.objects, points_per_agent=args.points,
                seed=seed)),
            hypes.voxel, max_cav=args.max_cav)

    batches = [_batch(2000 + s) for s in range(args.synthetic)]
    calib_batches = [_batch(1000 + s) for s in range(args.calib)]
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), batches[0], OptimCfg(),
        init_rngs={"gumbel": jax.random.PRNGKey(1)},
    )
    if args.run_dir:
        state, ep = ckpt.restore_checkpoint(args.run_dir, state)
        print(f"[encdec] loaded epoch {ep}")
    variables = {"params": state.params, "batch_stats": state.batch_stats,
                 **dict(state.extra_vars)}
    anchors = anc.generate_anchors(hypes.anchors)[0]

    C = mcfg.backbone_filters[-1]

    # optional int8 fused engine wrapping BOTH stages: INT8 encoder, the
    # codebook wire between agents, INT8 fusion — north-star config #4
    # (parity: the composition test tests/test_serving.py:110)
    model_apply = model.apply
    if args.engine == "int8_fused":
        from quantv2x_tpu.quant.int8_fused_engine import \
            build_int8_fused_engine
        _, model_apply = build_int8_fused_engine(
            model, variables, calib_batches, h_tile=16,
            clip=args.engine_clip, adaround_iters=args.engine_adaround)

    @jax.jit
    def encode_stage(variables, batch):
        """Transmit side: agent features -> integer codes."""
        def fn(mdl):
            feats = mdl.encode_agents(batch)          # (B, L, h, w, C)
            B, L, h, w, _ = feats.shape
            codes = mdl.compressor.codebook.encode(feats.reshape(-1, C))
            return codes.reshape(B, L, h, w, -1), (B, L, h, w)
        return model_apply(variables, method=lambda mdl: fn(mdl))

    @jax.jit
    def decode_stage(variables, codes, batch):
        """Receive side: codes -> features -> fusion -> heads -> detections."""
        def fn(mdl):
            B, L, h, w, LM = codes.shape
            flat = codes.reshape(-1, LM)
            lv = len(compressor.dict_sizes)
            feats = mdl.compressor.codebook.decode(
                flat.reshape(-1, lv, args.seg_num))
            feats = feats.reshape(B, L, h, w, C).astype(mcfg.jnp_dtype)
            if args.ego_fp:
                local = mdl.encode_agents(batch)      # ego's own FP path
                feats = jnp.concatenate([local[:, :1], feats[:, 1:]],
                                        axis=1)
            out = mdl.fuse_and_predict(feats, batch)
            return out
        out = model_apply(variables, method=lambda mdl: fn(mdl))
        det = decode_detections(
            out["cls_preds"][0], out["reg_preds"][0], anchors,
            hypes.postprocess, dir_preds=out["dir_preds"][0],
        )
        return det

    @jax.jit
    def nowire_stage(variables, batch):
        """Same frames, wire bypassed: the seed-matched FP anchor (r4's
        anchor was measured on a different seed set; this removes the
        cross-set comparison from every wire-cost claim)."""
        def fn(mdl):
            return mdl.fuse_and_predict(mdl.encode_agents(batch), batch)
        out = model_apply(variables, method=lambda mdl: fn(mdl))
        return decode_detections(
            out["cls_preds"][0], out["reg_preds"][0], anchors,
            hypes.postprocess, dir_preds=out["dir_preds"][0],
        )

    lv = args.levels
    bits_per_px = lv * args.seg_num * int(np.ceil(np.log2(args.dict_size)))
    stat = new_result_stat(mcfg.num_class)
    stat_nw = new_result_stat(mcfg.num_class)
    lat = []
    for i, batch in enumerate(batches):
        t0 = time.time()
        codes, _ = jax.block_until_ready(encode_stage(variables, batch))
        if args.cache_dir:
            os.makedirs(args.cache_dir, exist_ok=True)
            p = os.path.join(args.cache_dir, f"codes_{i}.npz")
            np.savez_compressed(p, codes=np.asarray(codes, np.uint16))
            codes = jnp.asarray(np.load(p)["codes"].astype(np.int32))
        det = jax.block_until_ready(decode_stage(variables, codes, batch))
        if i > 0:
            lat.append(time.time() - t0)
        gt_corners = bu.boxes_to_corners_3d(batch["gt_boxes"][0], "hwl")
        gt_mask = mask_gt_range(gt_corners, batch["gt_mask"][0],
                                hypes.postprocess.gt_range)
        accumulate_frame(stat, det["corners"], det["scores"], det["labels"],
                         det["valid"], gt_corners, batch["gt_classes"][0],
                         gt_mask)
        if not args.no_anchor:
            dn = jax.block_until_ready(nowire_stage(variables, batch))
            accumulate_frame(stat_nw, dn["corners"], dn["scores"],
                             dn["labels"], dn["valid"], gt_corners,
                             batch["gt_classes"][0], gt_mask)

    # per-level codebook health from the training-time EMA usage counts
    # (codebook_stats collection; reference tracks the same for
    # reAssignCodebook) — reported so RD rows carry dead-code context
    usage = {}
    stats_tree = dict(state.extra_vars).get("codebook_stats", {})
    flat = jax.tree_util.tree_flatten_with_path(stats_tree)[0]
    for pth, v in flat:
        key = jax.tree_util.keystr(pth)
        v = np.asarray(v, np.float64)
        if v.ndim != 2:          # (seg, dict) usage counts
            continue
        p = v / np.clip(v.sum(axis=-1, keepdims=True), 1e-9, None)
        with np.errstate(divide="ignore", invalid="ignore"):
            ent = -(p * np.log(np.clip(p, 1e-12, None))).sum(axis=-1)
        from quantv2x_tpu.models.codebook_utils import EPS
        usage[key] = {
            "dead_frac": round(float((v < EPS).mean()), 4),
            "perplexity": round(float(np.exp(ent).mean()), 1),
            "dict_size": int(v.shape[-1]),
        }

    h, w = codes.shape[2], codes.shape[3]
    payload_bytes = h * w * bits_per_px / 8
    out = {
        "ap": summarize(stat),
        "ap_nowire": None if args.no_anchor else summarize(stat_nw),
        "mean_latency_s": round(float(np.mean(lat)), 4) if lat else None,
        "latency_note": "tunnel_per_call; device-rate latency is bench.py "
                        "scan-chain ms/frame",
        "wire_bits_per_bev_pixel": bits_per_px,
        "payload_kb_per_agent": round(payload_bytes / 1024, 1),
        "fp32_payload_kb": round(h * w * C * 4 / 1024, 1),
        "compression_x": round(C * 32 / bits_per_px, 1),
        "codebook_usage": usage,
        "seg_num": args.seg_num, "dict_size": args.dict_size, "levels": lv,
        "engine": args.engine,
        "ego_fp": bool(args.ego_fp),
        "calib": args.calib,
        "max_cav": args.max_cav,
    }
    print(json.dumps(out, indent=2, default=float))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, default=float)


if __name__ == "__main__":
    main()
