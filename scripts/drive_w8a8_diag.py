"""Localize the full-model W8A8 collapse (flagship ckpt, CPU).

The reference-discipline full-model W8A8+AdaRound row lands at 0.081
mAP@0.5 vs FP32 0.794 — same collapse as plain W8A8 (0.104), i.e. learned
rounding cannot rescue it. This driver bisects WHERE per-tensor 8-bit
activation quantization destroys the pipeline by re-running plain PTQ
with (a) 16-bit activations, (b) selected scopes kept FP, (c) a finer
activation percentile. Paired frames (seeds 1016+), GT-range protocol.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("QV2X_PLATFORM", "cpu")

from quantv2x_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import jax
import numpy as np


def main():
    from quantv2x_tpu.config.hypes import load_hypes
    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.models.registry import create_model
    from quantv2x_tpu.quant.ptq import PTQConfig, ptq_calibrate
    from quantv2x_tpu.quant.quantizer import QuantSpec
    from quantv2x_tpu.tools.inference import run_eval
    from quantv2x_tpu.train import checkpoint as ckpt
    from quantv2x_tpu.train.trainer import OptimCfg, create_train_state

    hypes = load_hypes("configs/v2x_real/lidar_pyramid_synth.yaml")
    model, _ = create_model(hypes, max_cav=4)

    def frame(seed):
        return make_frame(SyntheticCfg(
            lidar_range=hypes.voxel.lidar_range, num_agents=4,
            num_objects=24, points_per_agent=30000, seed=seed))

    calib = [frame_to_batch(frame(1000 + s), hypes.voxel, max_cav=4)
             for s in range(16)]
    test = [frame_to_batch(frame(1016 + s), hypes.voxel, max_cav=4)
            for s in range(16)]

    state, _ = create_train_state(model, jax.random.PRNGKey(0), calib[0],
                                  OptimCfg())
    state, ep = ckpt.restore_checkpoint("runs/flagship_synth", state)
    print(f"loaded epoch {ep}", flush=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    base = PTQConfig()
    rows = {
        "w8a16": dataclasses.replace(
            base, act_spec=QuantSpec(n_bits=16)),
        "w8a8_fp_late": dataclasses.replace(
            base, skip_scopes=("codebook", "shrink", "heads")),
        "w8a8_fp_heads": dataclasses.replace(
            base, skip_scopes=("codebook", "heads")),
        "w8a8_fp_pyramid": dataclasses.replace(
            base, skip_scopes=("codebook", "pyramid")),
        "w8a8_p9999": dataclasses.replace(base, act_percentile=0.9999),
    }
    which = sys.argv[1:] or list(rows)
    out = {}
    for name in which:
        cfg = rows[name]
        qvars, act_scales, qapply = ptq_calibrate(
            model, variables, calib, cfg)
        summary, _ = run_eval(
            model, qvars, test, hypes,
            apply_fn=lambda v, b: qapply(v, act_scales, b))
        out[name] = summary["mAP"]
        print(name, {k: round(v, 3) for k, v in summary["mAP"].items()},
              flush=True)
    with open("runs/eval_w8a8_diag.json", "w") as f:
        json.dump(out, f, default=float)


if __name__ == "__main__":
    main()
