#!/usr/bin/env bash
# Round-5 driver: finish the full-model W8A8+AdaRound flagship row
# (BASELINE.md "(see below)" — reference discipline: 5000 it, 16 calib
# batches, pred terms). Retry loop because the tunneled TPU worker can
# kernel-fault mid-run; per-unit resume files + skip markers in
# runs/flagship_synth/adaround_resume/ make every attempt make forward
# progress.
cd "$(dirname "$0")/.."
for i in 1 2 3 4 5 6; do
  echo "=== adaround attempt $i $(date) ==="
  timeout 7200 python -m quantv2x_tpu.tools.inference \
    -y configs/v2x_real/lidar_pyramid_synth.yaml \
    --run_dir runs/flagship_synth --quant adaround --iters 5000 \
    --calib 16 --synthetic 16 --max_cav 4 --objects 24 --points 30000 \
    --json runs/eval_flagship_adaround.json && break
  echo "=== attempt $i failed; waiting for tunnel recovery ==="
  sleep 300
done
