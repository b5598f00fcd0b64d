#!/usr/bin/env bash
# Parity: scripts/train/train.sh (reference) — flagship FP32/bf16 training.
set -e
cd "$(dirname "$0")/../.."
python -m quantv2x_tpu.tools.train -y configs/v2xreal_lidar_pyramid.yaml \
    --run_dir runs/lidar_pyramid "$@"
