#!/usr/bin/env bash
# Round-5 small-grid eval/sweep queue — CPU-safe (QV2X_PLATFORM honored),
# run after scripts/r5_smallgrid.sh trainings finish.
set -x
cd "$(dirname "$0")/.."
P="${QV2X_PLATFORM:-cpu}"
INF="env QV2X_PLATFORM=$P python -m quantv2x_tpu.tools.inference"
SWP="env QV2X_PLATFORM=$P python -m quantv2x_tpu.tools.inference_sweeps"

# matched-budget fusion comparison rows (pyramid anchor = 0.246)
for cfg in attfuse_small fcooper_small cobevt_small where2comm_small; do
  timeout 3600 $INF -y configs/v2x_real/lidar_$cfg.yaml \
    --run_dir runs/${cfg}_r5 --synthetic 16 \
    --json runs/eval_${cfg}_r5.json || true
done

# Where2comm comm-rate-vs-AP curve
timeout 3600 $SWP -y configs/v2x_real/lidar_where2comm_small.yaml \
  --run_dir runs/where2comm_small_r5 --sweep comm --max_cav 2 \
  --synthetic 16 --json runs/eval_where2comm_comm_sweep.json || true

# GenComm missing-message robustness (stage-1 run: extractor + denoiser
# trained; stage 2 only re-tunes the extractor)
timeout 3600 $SWP -y configs/v2x_real/gencomm_small.yaml \
  --run_dir runs/gencomm_s1_r5 --sweep missing --max_cav 2 \
  --synthetic 16 --json runs/eval_gencomm_missing_sweep.json || true

# STAMP heterogeneous-transfer three-row table
timeout 3600 env QV2X_PLATFORM=$P python -m quantv2x_tpu.tools.stamp_eval \
  -y configs/v2x_real/stamp_dsa_small.yaml --stamp_dir runs/stamp_small_r5 \
  --ego_dir runs/acc_small_r4 --protocol_dir runs/proto_small_r5 \
  --json runs/eval_stamp_r5.json || true
echo "=== small-grid evals done $(date) ==="
