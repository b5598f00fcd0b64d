#!/usr/bin/env bash
# Parity: scripts/inference_mc/inference_mc_quant.sh — W8A8 PTQ pipeline
# (16 calib batches, AdaRound reconstruction) + quantized eval.
set -e
cd "$(dirname "$0")/../.."
python -m quantv2x_tpu.tools.inference -y configs/v2xreal_lidar_pyramid.yaml \
    --run_dir runs/lidar_pyramid --quant adaround --calib 16 "$@"
