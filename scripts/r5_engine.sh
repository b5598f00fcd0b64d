#!/usr/bin/env bash
# Round-5 engine rows (VERDICT r4 asks #3/#4): engine-only re-measure with
# joint-LSQ + longer block-AdaRound and the MSE-vs-entropy A/B, then the
# fully-quantized config #4 on the mixed-trained stage-3 codebook model
# with the stronger calibration (16 disjoint frames, 2000-iter refine).
set -x
cd "$(dirname "$0")/.."
INF="python -m quantv2x_tpu.tools.inference -y configs/v2x_real/lidar_pyramid_synth.yaml --run_dir runs/flagship_synth --calib 16 --synthetic 16 --max_cav 4 --objects 24 --points 30000"
ENC="python -m quantv2x_tpu.tools.inference_codebook_encdec -y configs/v2x_real/codebook_pyramid_stage3.yaml --calib 16 --synthetic 16 --max_cav 4 --objects 24 --points 30000"

# stage-3 mixed co-train retry at batch 1 (bs2 RESOURCE_EXHAUSTED: the
# wire_bypass select keeps both feature branches live through backward)
timeout 3600 python -m quantv2x_tpu.tools.train_codebook \
  -y configs/v2x_real/codebook_pyramid_stage3.yaml --stage 3 \
  --stage1_dir runs/cb2_s1d256l3 --run_dir runs/cb3_mixed_s1 \
  --synthetic 128 --epochs 10 --batch_size 1 --max_cav 4 --objects 24 \
  --points 30000 --seg_num 1 --dict_size 256 --levels 3 --wire_mix 0.5 || true
timeout 2400 $ENC --run_dir runs/cb3_mixed_s1 --seg_num 1 --levels 3 \
  --json runs/eval_cb3_mixed_s1.json || true

# catch-up: s4d256l3 encdec eval completes the RD table (its first run
# predated the dynamic code-column kernel fix)
timeout 2400 python -m quantv2x_tpu.tools.inference_codebook_encdec \
  -y configs/v2x_real/codebook_pyramid_stage2.yaml --run_dir runs/cb2_s4d256l3 \
  --synthetic 16 --max_cav 4 --objects 24 --points 30000 \
  --seg_num 4 --dict_size 256 --levels 3 --json runs/eval_cb2_s4d256l3.json || true

# ask #4: engine-only, joint-LSQ + 2000-iter refinement, mse vs entropy
timeout 7200 $INF --engine int8_fused --engine_clip mse \
  --engine_adaround 1200 --json runs/eval_engine_mse_a1200.json || true
timeout 7200 $INF --engine int8_fused --engine_clip entropy \
  --engine_adaround 1200 --json runs/eval_engine_entropy_a1200.json || true

# ask #3: config #4 on the r4 stage-3 model with ONLY the calibration
# changed (16 disjoint frames vs the 4 leaked eval frames of the
# committed 0.625 row; same 600 iters) — isolates the calib effect
timeout 7200 $ENC --run_dir runs/codebook_stage3 --engine int8_fused \
  --engine_adaround 600 --json runs/eval_cb3_orig_int8_c16.json || true

# config #4 on the mixed-trained stage 3 (RD-winner 24 b/px wire) + the
# ego-FP serving row
timeout 7200 $ENC --run_dir runs/cb3_mixed_s1 --seg_num 1 --levels 3 \
  --engine int8_fused --engine_adaround 1200 \
  --json runs/eval_cb3_mixed_s1_int8.json || true
timeout 7200 $ENC --run_dir runs/cb3_mixed_s1 --seg_num 1 --levels 3 \
  --engine int8_fused --engine_adaround 1200 --ego_fp \
  --json runs/eval_cb3_mixed_s1_int8_egofp.json || true
echo "=== engine rows done $(date) ==="

# full-model W8A8 collapse bisection on the TPU (CPU calibrate was ~3h;
# TPU ptq_calibrate measures 23 s)
timeout 5400 env QV2X_PLATFORM=axon python scripts/drive_w8a8_diag.py || true

# catch-up: s4d256l3 encdec eval (its first run predated the dynamic
# code-column kernel fix)
timeout 2400 python -m quantv2x_tpu.tools.inference_codebook_encdec \
  -y configs/v2x_real/codebook_pyramid_stage2.yaml --run_dir runs/cb2_s4d256l3 \
  --synthetic 16 --max_cav 4 --objects 24 --points 30000 \
  --seg_num 4 --dict_size 256 --levels 3 --json runs/eval_cb2_s4d256l3.json || true
echo "=== diag + catchup done $(date) ==="
