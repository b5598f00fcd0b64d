#!/usr/bin/env bash
# Round-5 codebook rate-distortion sweep (VERDICT r4 ask #1): stage-2
# trainings at 5 wire configs + encdec evals (each JSON carries its own
# seed-matched no-wire anchor + per-level usage stats), then mixed
# wire/no-wire stage-3 co-training to fix the r4 wire-dependence.
#
# All stage-2 runs use the round-5 STRICT freeze (detector in eval mode;
# round 4's stage 2 let BatchNorm buffers co-adapt to the wire, which is
# why runs/codebook_stage2 scores ~0 with the wire bypassed) — so the
# default 2x256x3 point is retrained too.
set -x
cd "$(dirname "$0")/.."
TRAIN="python -m quantv2x_tpu.tools.train_codebook"
EVAL="python -m quantv2x_tpu.tools.inference_codebook_encdec"
COMMON="--synthetic 128 --epochs 50 --batch_size 2 --max_cav 4 --objects 24 --points 30000"
EVC="--synthetic 16 --max_cav 4 --objects 24 --points 30000"

for spec in "2 256 3 s2d256l3" "4 256 3 s4d256l3" "2 1024 3 s2d1024l3" "2 256 2 s2d256l2" "1 256 3 s1d256l3"; do
  set -- $spec
  timeout 3600 $TRAIN -y configs/v2x_real/codebook_pyramid_stage2.yaml \
    --stage 2 --stage1_dir runs/flagship_synth --run_dir runs/cb2_$4 \
    $COMMON --seg_num $1 --dict_size $2 --levels $3 || true
  timeout 2400 $EVAL -y configs/v2x_real/codebook_pyramid_stage2.yaml \
    --run_dir runs/cb2_$4 $EVC --seg_num $1 --dict_size $2 --levels $3 \
    --json runs/eval_cb2_$4.json || true
done

# mixed wire/no-wire stage 3 from the strict-frozen default stage 2
timeout 3600 $TRAIN -y configs/v2x_real/codebook_pyramid_stage3.yaml \
  --stage 3 --stage1_dir runs/cb2_s2d256l3 --run_dir runs/cb3_mixed \
  --synthetic 128 --epochs 12 --batch_size 2 --max_cav 4 --objects 24 \
  --points 30000 --wire_mix 0.5 || true
timeout 2400 $EVAL -y configs/v2x_real/codebook_pyramid_stage3.yaml \
  --run_dir runs/cb3_mixed $EVC --seg_num 2 --dict_size 256 --levels 3 \
  --json runs/eval_cb3_mixed.json || true
echo "=== codebook RD sweep done $(date) ==="
