"""ICI collective cost model for the cooperative-perception topology.

The ≥80% weak-scaling gate (BASELINE.json) cannot be measured on this
single-chip tunnel, and virtual-CPU-device efficiencies measure host-core
saturation, not collectives (BASELINE.md r3). This tool makes the scaling
story quantitative the other way: exact bytes-on-wire per step for each
collective in the design, projected against published TPU link rates.

Collectives modeled (parallel/serving.py + train step):
  - agent all-gather of codebook codes (serving wire; uint8 lanes);
  - agent all-gather of bf16 features (the no-codebook alternative);
  - data-parallel gradient all-reduce (training; bf16/f32 params).

Ring-collective time model (the standard alpha-beta form the scaling
books use): all_gather of S bytes per chip over N chips on a
bandwidth-W ring costs (N-1)/N * N*S / W one-way bytes-time; all_reduce
costs 2x that of a reduce-scatter+all-gather = 2*(N-1)/N * S / W.

    python -m quantv2x_tpu.tools.comm_model -y configs/... [--chips 4]
        [--step_ms 18.9] [--ici_gbps 400]

Default link rate: 400 Gbit/s/direction per v5e chip pair (v4: 2x).
Prints one JSON dict; numbers are exact byte counts, times are the model.
"""

import argparse
import json


def model(h: int, w: int, channel: int, seg: int, levels: int,
          lane_bits: int, entropy_bits: int, chips: int, step_ms: float,
          ici_gbps: float, param_mb: float, dtype_bytes: int = 2):
    wire_bytes = h * w * levels * seg * (lane_bits // 8)
    entropy_bytes = h * w * entropy_bits // 8
    feat_bytes = h * w * channel * dtype_bytes
    bw = ici_gbps * 1e9 / 8              # bytes/s one-way per link
    n = chips

    def allgather_ms(per_chip):
        return (n - 1) * per_chip / bw * 1e3

    def allreduce_ms(per_chip):
        return 2 * (n - 1) / n * per_chip / bw * 1e3

    grad_bytes = param_mb * 1e6
    out = {
        "chips": n,
        "bev_hw": [h, w],
        "codes_kb_per_agent": round(wire_bytes / 1024, 1),
        "entropy_coded_kb_per_agent": round(entropy_bytes / 1024, 1),
        "bf16_feature_kb_per_agent": round(feat_bytes / 1024, 1),
        "ici_gbps_per_direction": ici_gbps,
        "agent_allgather_codes_ms": round(allgather_ms(wire_bytes), 4),
        "agent_allgather_bf16_ms": round(allgather_ms(feat_bytes), 4),
        "dp_grad_allreduce_ms": round(allreduce_ms(grad_bytes), 4),
    }
    if step_ms:
        serve_overhead = out["agent_allgather_codes_ms"] / step_ms
        serve_overhead_bf16 = out["agent_allgather_bf16_ms"] / step_ms
        train_overhead = out["dp_grad_allreduce_ms"] / step_ms
        out.update({
            "frame_ms": step_ms,
            "serve_wire_fraction_codes": round(serve_overhead, 6),
            "serve_wire_fraction_bf16": round(serve_overhead_bf16, 6),
            "train_allreduce_fraction": round(train_overhead, 6),
            # weak-scaling efficiency if the collective is the ONLY
            # serial term (compute perfectly parallel): t/(t+c)
            "projected_scaling_efficiency_serve": round(
                step_ms / (step_ms + out["agent_allgather_codes_ms"]), 4),
            "projected_scaling_efficiency_train": round(
                step_ms / (step_ms + out["dp_grad_allreduce_ms"]), 4),
        })
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-y", "--hypes", default=None)
    ap.add_argument("--chips", type=int, default=4)
    ap.add_argument("--step_ms", type=float, default=18.9,
                    help="measured per-frame ms (BENCH int8_4agent_ms)")
    ap.add_argument("--ici_gbps", type=float, default=400.0)
    ap.add_argument("--param_mb", type=float, default=21.0,
                    help="trainable param bytes (BASELINE.md sharding note)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    h, w, C = 100, 352, 64
    seg, levels, lane_bits, entropy_bits = 2, 3, 8, 48
    if args.hypes:
        from quantv2x_tpu.config.hypes import load_hypes
        hypes = load_hypes(args.hypes)
        gx, gy = hypes.voxel.grid_size[0], hypes.voxel.grid_size[1]
        h, w = gy // 2, gx // 2
        C = hypes.model.backbone_filters[-1]
        cb = hypes.raw.get("codebook") or {}
        seg = cb.get("seg_num", 2)
        levels = cb.get("levels", 3)
        k = cb.get("dict_size", 256)
        lane_bits = 8 if k <= 256 else 16 if k <= 65536 else 32
        import math
        entropy_bits = levels * seg * math.ceil(math.log2(k))
    out = model(h, w, C, seg, levels, lane_bits, entropy_bits,
                args.chips, args.step_ms, args.ici_gbps, args.param_mb)
    line = json.dumps(out, indent=2)
    print(line)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
