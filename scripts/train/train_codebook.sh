#!/usr/bin/env bash
# Parity: scripts/train_codebook_mc/* — 3-stage codebook training.
set -e
cd "$(dirname "$0")/../.."
python -m quantv2x_tpu.tools.train_codebook \
    -y configs/v2x_real/codebook_pyramid_stage2.yaml \
    --run_dir runs/codebook "$@"
