#!/usr/bin/env bash
# Round-5 small-grid training queue (VERDICT r4 asks #5/#6): matched-budget
# rows for alternative fusions (att / f_cooper / cobevt), Where2comm,
# GenComm, and the STAMP protocol model + bridge. Protocol identical to
# runs/acc_small_r4 (24 synth frames + augment, 300 epochs, late decay).
set -x
cd "$(dirname "$0")/.."
T="python -m quantv2x_tpu.tools.train"

# stage-3 mixed co-train on the RD winner (1x256x3 = 24 b/px, 85x, wire
# mAP@0.5 ABOVE the anchor stage-2-only) — targets the mAP@0.7 gap
timeout 3600 python -m quantv2x_tpu.tools.train_codebook \
  -y configs/v2x_real/codebook_pyramid_stage3.yaml --stage 3 \
  --stage1_dir runs/cb2_s1d256l3 --run_dir runs/cb3_mixed_s1 \
  --synthetic 128 --epochs 12 --batch_size 2 --max_cav 4 --objects 24 \
  --points 30000 --seg_num 1 --dict_size 256 --levels 3 --wire_mix 0.5 || true
timeout 2400 python -m quantv2x_tpu.tools.inference_codebook_encdec \
  -y configs/v2x_real/codebook_pyramid_stage3.yaml --run_dir runs/cb3_mixed_s1 \
  --synthetic 16 --max_cav 4 --objects 24 --points 30000 \
  --seg_num 1 --dict_size 256 --levels 3 \
  --json runs/eval_cb3_mixed_s1.json || true

for cfg in lidar_attfuse_small lidar_fcooper_small lidar_cobevt_small lidar_where2comm_small; do
  timeout 3600 $T -y configs/v2x_real/$cfg.yaml --run_dir runs/${cfg#lidar_}_r5 \
    --synthetic 24 --augment --epochs 300 --save_freq 100 || true
done

# STAMP protocol model: same architecture as the ego (runs/acc_small_r4),
# genuinely different weights (different data budget -> different optimum)
timeout 3600 $T -y configs/v2x_real/lidar_pyramid_small.yaml \
  --run_dir runs/proto_small_r5 --synthetic 20 --augment --epochs 300 \
  --save_freq 100 || true

# STAMP bridge (DSA adapter variant) between acc_small_r4 (ego) and
# proto_small_r5 (protocol)
timeout 3600 python -m quantv2x_tpu.tools.train_stamp \
  -y configs/v2x_real/stamp_dsa_small.yaml --run_dir runs/stamp_small_r5 \
  --ego_dir runs/acc_small_r4 --protocol_dir runs/proto_small_r5 \
  --synthetic 24 --epochs 40 --batch_size 2 || true

# GenComm stage 1 (denoiser + extractor on the frozen acc_small
# detector); the missing-message sweep restores this run directly —
# stage 2 only re-tunes the extractor and is skipped for time
timeout 3600 python -m quantv2x_tpu.tools.train_gencomm \
  -y configs/v2x_real/gencomm_small.yaml --run_dir runs/gencomm_s1_r5 \
  --stage 1 --base_dir runs/acc_small_r4 --synthetic 24 --epochs 50 \
  --batch_size 2 --message_channels 32 || true
echo "=== small-grid queue done $(date) ==="
