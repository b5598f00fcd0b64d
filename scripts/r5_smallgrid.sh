#!/usr/bin/env bash
# Round-5 small-grid training queue (VERDICT r4 asks #5/#6): matched-budget
# rows for alternative fusions (att / f_cooper / cobevt), Where2comm,
# GenComm, and the STAMP protocol model + bridge. Protocol identical to
# runs/acc_small_r4 (24 synth frames + augment, 300 epochs, late decay).
set -x
cd "$(dirname "$0")/.."
T="python -m quantv2x_tpu.tools.train"

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
