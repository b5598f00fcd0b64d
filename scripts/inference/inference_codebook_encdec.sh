#!/usr/bin/env bash
# Parity: scripts/inference_mc/inference_mc_codebook_encdec(_cached).sh —
# hard-quantized codebook wire eval; pass --cache_dir for the cached
# two-phase (encode->disk->decode) variant.
set -e
cd "$(dirname "$0")/../.."
python -m quantv2x_tpu.tools.inference_codebook_encdec \
    -y configs/v2x_real/codebook_pyramid_stage3.yaml \
    --run_dir runs/codebook "$@"
