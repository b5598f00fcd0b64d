#!/usr/bin/env bash
# Round-5 codebook rate-distortion sweep (VERDICT r4 ask #1): stage-2
# trainings at 4 wire configs + encdec evals (each JSON carries its own
# seed-matched no-wire anchor + per-level usage stats), then mixed
# wire/no-wire stage-3 co-training to fix the r4 wire-dependence.
set -x
cd "$(dirname "$0")/.."
TRAIN="python -m quantv2x_tpu.tools.train_codebook"
EVAL="python -m quantv2x_tpu.tools.inference_codebook_encdec"
COMMON="--synthetic 128 --epochs 40 --batch_size 2 --max_cav 4 --objects 24 --points 30000"
EVC="--synthetic 16 --max_cav 4 --objects 24 --points 30000"

# stage-2-only eval of the existing default run (2x256x3 = 48 b/px)
timeout 2400 $EVAL -y configs/v2x_real/codebook_pyramid_stage2.yaml \
  --run_dir runs/codebook_stage2 $EVC --seg_num 2 --dict_size 256 --levels 3 \
  --json runs/eval_cb2_s2d256l3.json || true

for spec in "4 256 3 s4d256l3" "2 1024 3 s2d1024l3" "2 256 2 s2d256l2" "1 256 3 s1d256l3"; do
  set -- $spec
  timeout 3600 $TRAIN -y configs/v2x_real/codebook_pyramid_stage2.yaml \
    --stage 2 --stage1_dir runs/flagship_synth --run_dir runs/cb2_$4 \
    $COMMON --seg_num $1 --dict_size $2 --levels $3 || true
  timeout 2400 $EVAL -y configs/v2x_real/codebook_pyramid_stage2.yaml \
    --run_dir runs/cb2_$4 $EVC --seg_num $1 --dict_size $2 --levels $3 \
    --json runs/eval_cb2_$4.json || true
done

# mixed wire/no-wire stage 3 from the default stage-2 (wire-dependence fix)
timeout 3600 $TRAIN -y configs/v2x_real/codebook_pyramid_stage3.yaml \
  --stage 3 --stage1_dir runs/codebook_stage2 --run_dir runs/cb3_mixed \
  --synthetic 128 --epochs 12 --batch_size 2 --max_cav 4 --objects 24 \
  --points 30000 --wire_mix 0.5 || true
timeout 2400 $EVAL -y configs/v2x_real/codebook_pyramid_stage3.yaml \
  --run_dir runs/cb3_mixed $EVC --seg_num 2 --dict_size 256 --levels 3 \
  --json runs/eval_cb3_mixed.json || true
echo "=== codebook RD sweep done $(date) ==="
