"""End-to-end benchmark: cooperative-detection frames/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Pipeline measured (batch=1 frame, 2 agents, full V2X-Real grid 704x200):
voxelized inputs -> pillar VFE -> BEV scatter -> backbone -> pyramid
weighted fusion -> shrink -> heads -> decode+NMS, as one jitted program.

Baseline: the only in-repo reference number is the HEAL-era Pyramid
("STTR") 24.0 FPS on an unspecified GPU
(/root/reference/opencood/visualization/ap_vs_fps_scatter_plot.py:19-27);
vs_baseline = fps / 24.0. BASELINE.md records that QuantV2X publishes no
reproducible numbers in-repo.
"""

import json
import os
import time

import numpy as np


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from quantv2x_tpu.data import anchors as anc
    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.postprocess import PostprocessCfg, decode_detections
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.data.voxelizer import VoxelCfg
    from quantv2x_tpu.models.collab_model import ModelCfg, PyramidCollabModel

    small = os.environ.get("BENCH_SMALL", "0") == "1"
    lidar_range = (
        (-38.4, -38.4, -3.0, 38.4, 38.4, 1.0) if small
        else (-140.8, -40.0, -3.0, 140.8, 40.0, 1.0)
    )
    voxel = VoxelCfg(
        lidar_range=lidar_range, voxel_size=(0.4, 0.4, 4.0),
        max_points_per_voxel=32,
        max_voxels=4096 if small else 24000,
    )
    max_cav = 2
    mcfg = ModelCfg(voxel=voxel, max_cav=max_cav, dtype="bfloat16")
    acfg = anc.AnchorGridCfg(
        lidar_range=lidar_range, voxel_size=(0.4, 0.4, 4.0),
        feature_stride=2, classes=anc.V2XREAL_CLASSES,
    )
    # several distinct frames: the tunneled backend memoizes identical
    # (program, input) executions, so same-input timing loops lie
    frames = [
        make_frame(SyntheticCfg(
            lidar_range=lidar_range, num_agents=max_cav, num_objects=12,
            points_per_agent=30000, seed=s,
        ))
        for s in range(4)
    ]
    batches = [frame_to_batch(f, voxel, max_cav=max_cav) for f in frames]
    batch = batches[0]
    model = PyramidCollabModel(mcfg)
    # init must be jitted: eager init dispatches thousands of tiny ops
    # (catastrophic over a remote-TPU tunnel)
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b,
                                             train=False))(batch)
    anchors = anc.generate_anchors(acfg)[0]
    pp_cfg = PostprocessCfg(gt_range=lidar_range, pre_nms_top_k=256,
                            max_detections=150)

    @jax.jit
    def e2e(variables, batch):
        out = model.apply(variables, batch, train=False)
        det = decode_detections(
            out["cls_preds"][0], out["reg_preds"][0], anchors, pp_cfg,
            dir_preds=out["dir_preds"][0],
        )
        return det

    # compile + warmup
    t0 = time.time()
    det = jax.block_until_ready(e2e(variables, batch))
    compile_s = time.time() - t0

    # primary measurement: scan-chain — N frames execute inside ONE jit
    # (4 distinct inputs cycled; the tunneled backend memoizes identical
    # (program, input) pairs and its block_until_ready is unreliable, so
    # per-call loops both lie and pay a tunnel round trip per frame); one
    # scalar fetch at the end forces real synchronization
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    REP = 4
    n_chain = len(batches) * REP

    def make_chain(mdl):
        @jax.jit
        def chain(v, sb):
            def body(carry, b):
                out = mdl.apply(v, b, train=False)
                det = decode_detections(
                    out["cls_preds"][0], out["reg_preds"][0], anchors,
                    pp_cfg, dir_preds=out["dir_preds"][0])
                return carry + det["scores"].sum(), 0
            big = jax.tree.map(lambda x: jnp.concatenate([x] * REP), sb)
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), big)
            return acc
        return chain

    chain = make_chain(model)
    _ = float(chain(variables, stacked))  # compile
    times = []
    for _ in range(3):
        t0 = time.time()
        _ = float(chain(variables, stacked))
        times.append(time.time() - t0)
    stock_dt = min(times) / n_chain

    # deployment path: BN-folded Pallas fused residual blocks (the
    # TensorRT-vertical-fusion analogue, quant/fused_engine) — one HBM
    # round trip per block on this BW-bound device
    fused_dt = None
    try:
        from quantv2x_tpu.quant.fused_engine import build_fused_engine

        class _FusedModel:
            def apply(self, v, b, train=False):
                return fused_apply(v, b)

        _, fused_apply = build_fused_engine(model, variables, h_tile=16,
                                            min_channels=0)
        chain_f = make_chain(_FusedModel())
        _ = float(chain_f(variables, stacked))
        times_f = []
        for _ in range(3):
            t0 = time.time()
            _ = float(chain_f(variables, stacked))
            times_f.append(time.time() - t0)
        fused_dt = min(times_f) / n_chain
    except Exception as e:
        print(f"# fused engine path failed: {e}", flush=True)

    # proj_first deployment variant: warp once before the pyramid instead
    # of per level (reference pyramid_fuse_onnx mode) on the fused engine
    pf_dt = None
    try:
        import dataclasses as _dc

        model_pf = PyramidCollabModel(_dc.replace(mcfg, proj_first=True))
        # proj_first adds no params — reuse the same variables
        _, pf_apply = build_fused_engine(model_pf, variables, h_tile=16,
                                         min_channels=0)

        class _PFModel:
            def apply(self, v, b, train=False):
                return pf_apply(v, b)

        chain_p = make_chain(_PFModel())
        _ = float(chain_p(variables, stacked))
        times_p = []
        for _ in range(3):
            t0 = time.time()
            _ = float(chain_p(variables, stacked))
            times_p.append(time.time() - t0)
        pf_dt = min(times_p) / n_chain
    except Exception as e:
        print(f"# proj_first path failed: {e}", flush=True)

    dt = min(d for d in (stock_dt, fused_dt, pf_dt) if d)
    fps = 1.0 / dt

    # secondary: per-call latency incl. host dispatch (serving round trip)
    trivial = jax.jit(lambda x: x + 1.0)
    _ = float(trivial(jnp.float32(0.0)))
    t0 = time.time()
    for i in range(10):
        _ = float(trivial(jnp.float32(i)))
    fetch_overhead = (time.time() - t0) / 10
    iters = 8
    percall = []
    for i in range(iters):
        t0 = time.time()
        det = e2e(variables, batches[i % len(batches)])
        _ = float(det["scores"][0])
        percall.append(time.time() - t0)
    # min resists intermittent multi-second tunnel stalls
    percall_ms = max(min(percall) - fetch_overhead, 1e-6) * 1e3

    # also measure the reference's own resnext:false pyramid variant (dense
    # 3x3 blocks — much better MXU utilization than 4-wide grouped convs)
    fast_ms = None
    try:
        mcfg_b = ModelCfg(voxel=voxel, max_cav=max_cav, dtype="bfloat16",
                          pyramid_block="basic")
        model_b = PyramidCollabModel(mcfg_b)
        vars_b = jax.jit(lambda b: model_b.init(jax.random.PRNGKey(0), b,
                                                train=False))(batch)
        chain_b = make_chain(model_b)
        _ = float(chain_b(vars_b, stacked))
        times_b = []
        for _ in range(3):
            t0 = time.time()
            _ = float(chain_b(vars_b, stacked))
            times_b.append(time.time() - t0)
        fast_ms = round(min(times_b) / n_chain * 1e3, 2)
    except Exception:
        pass

    print(json.dumps({
        "metric": "fp_bf16_e2e_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 24.0, 3),
        "detail": {
            "compile_s": round(compile_s, 1),
            "latency_ms": round(dt * 1e3, 2),
            "stock_latency_ms": round(stock_dt * 1e3, 2),
            "fused_latency_ms": (round(fused_dt * 1e3, 2)
                                 if fused_dt else None),
            "proj_first_latency_ms": (round(pf_dt * 1e3, 2)
                                      if pf_dt else None),
            "percall_ms": round(percall_ms, 2),
            "grid": list(voxel.grid_size),
            "agents": max_cav,
            "backend": jax.default_backend(),
            "num_detections": int(np.asarray(det["valid"]).sum()),
            "basic_block_latency_ms": fast_ms,
        },
    }))


if __name__ == "__main__":
    main()
