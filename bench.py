"""End-to-end benchmark: cooperative-detection frames/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Pipeline measured (batch=1 frame, 2 agents, full V2X-Real grid 704x200):
voxelized inputs -> pillar VFE -> BEV scatter -> backbone -> pyramid
weighted fusion -> shrink -> heads -> decode+NMS, as one jitted program.

Headline metric (north star, BASELINE.md): INT8 end-to-end frames/s/chip —
the int8 fused-block Pallas engine (quant/int8_fused_engine), the
framework's TensorRT-INT8-deployment analogue. bf16 stock / bf16 fused /
proj_first arms are reported in detail for comparison.

Baseline: the only in-repo reference number is the HEAL-era Pyramid
("STTR") 24.0 FPS on an unspecified GPU
(/root/reference/opencood/visualization/ap_vs_fps_scatter_plot.py:19-27);
vs_baseline = fps / 24.0. BASELINE.md records that QuantV2X publishes no
reproducible numbers in-repo.

Timing method: N distinct frames chained in ONE jit (scan), one scalar
fetch — the tunneled backend memoizes identical (program, input) pairs and
adds ~30 ms per CALL (not per step; scripts/drive_scanmode.py), so chains
are long (64 frames) to keep the per-frame smear ~0.5 ms.
"""

import json
import os
import time

import numpy as np


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    # record whether the on-disk compile cache is warm: compile_s ~170 s
    # cold at the flagship grid, near-zero when these entries hit
    cache_dir = os.path.expanduser("~/.cache/jax_comp")
    cache_entries_before = (
        len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0)
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

    def _e2e(variables, batch):
        out = model.apply(variables, batch, train=False)
        det = decode_detections(
            out["cls_preds"][0], out["reg_preds"][0], anchors, pp_cfg,
            dir_preds=out["dir_preds"][0],
        )
        return det

    # AOT split so the persistent-cache question is answerable: trace_s is
    # host-side tracing/lowering (on the tunneled backend this includes
    # any trace-time device traffic), compile_s is the XLA compile or
    # cache load alone — conflating them made r3 report "cache miss" for
    # what was actually 500+ s of trace-time eager dispatch
    t0 = time.time()
    e2e_lowered = jax.jit(_e2e).lower(variables, batch)
    trace_s = time.time() - t0
    t0 = time.time()
    e2e = e2e_lowered.compile()
    compile_s = time.time() - t0
    det = jax.block_until_ready(e2e(variables, batch))

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    REP = 4 if small else 16
    n_chain = len(batches) * REP

    def make_chain(apply_fn):
        @jax.jit
        def chain(v, sb):
            def body(carry, b):
                out = apply_fn(v, b)
                det = decode_detections(
                    out["cls_preds"][0], out["reg_preds"][0], anchors,
                    pp_cfg, dir_preds=out["dir_preds"][0])
                return carry + det["scores"].sum(), 0
            big = jax.tree.map(lambda x: jnp.concatenate([x] * REP), sb)
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), big)
            return acc
        return chain

    def bench_arm(apply_fn, v=None, sb=None):
        chain = make_chain(apply_fn)
        v = variables if v is None else v
        sb = stacked if sb is None else sb
        _ = float(chain(v, sb))
        times = []
        for _ in range(3):
            t0 = time.time()
            _ = float(chain(v, sb))
            times.append(time.time() - t0)
        return min(times) / n_chain

    stock_dt = bench_arm(lambda v, b: model.apply(v, b, train=False))

    # bf16 fused-block Pallas engine (TensorRT-vertical-fusion analogue)
    fused_dt = None
    try:
        from quantv2x_tpu.quant.fused_engine import build_fused_engine
        _, fused_apply = build_fused_engine(model, variables, h_tile=16,
                                            min_channels=0)
        fused_dt = bench_arm(lambda v, b: fused_apply(v, b))
    except Exception as e:
        print(f"# bf16 fused engine failed: {e}", flush=True)

    # INT8 fused engine — the headline (north-star) path
    int8_dt = None
    int8_corr = None
    try:
        from quantv2x_tpu.quant.int8_fused_engine import \
            build_int8_fused_engine
        _, int8_apply = build_int8_fused_engine(
            model, variables, batches[:2], h_tile=16)
        int8_dt = bench_arm(lambda v, b: int8_apply(v, b))
        o_s = jax.jit(lambda v, b: model.apply(v, b, train=False))(
            variables, batch)
        o_q = jax.jit(lambda v, b: int8_apply(v, b))(variables, batch)
        int8_corr = float(np.corrcoef(
            np.asarray(o_s["cls_preds"], np.float32).ravel(),
            np.asarray(o_q["cls_preds"], np.float32).ravel())[0, 1])
    except Exception as e:
        print(f"# int8 fused engine failed: {e}", flush=True)

    # proj_first deployment variant on the int8 engine
    pf_dt = None
    try:
        import dataclasses as _dc
        from quantv2x_tpu.quant.int8_fused_engine import \
            build_int8_fused_engine as _bie

        model_pf = PyramidCollabModel(_dc.replace(mcfg, proj_first=True))
        _, pf_apply = _bie(model_pf, variables, batches[:2], h_tile=16)
        pf_dt = bench_arm(lambda v, b: pf_apply(v, b))
    except Exception as e:
        print(f"# proj_first int8 path failed: {e}", flush=True)

    # north-star config #4 arms (BASELINE.json configs[3]): the flagship
    # 4-agent pipeline, int8 engine alone and with the codebook wire
    # (INT8 encoder + UMGM codes between agents + INT8 fusion; reference
    # path heter_pyramid_collab_codebook_mc_encdec.py:33-181)
    int84_dt = None
    cb4_dt = None
    try:
        import dataclasses as _dc
        from quantv2x_tpu.models.codebook import CodebookCompressor
        from quantv2x_tpu.quant.int8_fused_engine import \
            build_int8_fused_engine as _bie4

        frames4 = [
            make_frame(SyntheticCfg(
                lidar_range=lidar_range, num_agents=4, num_objects=12,
                points_per_agent=30000, seed=100 + s))
            for s in range(4)
        ]
        batches4 = [frame_to_batch(f, voxel, max_cav=4) for f in frames4]
        stacked4 = jax.tree.map(lambda *xs: jnp.stack(xs), *batches4)
        mcfg4 = _dc.replace(mcfg, max_cav=4)

        model4 = PyramidCollabModel(mcfg4)
        vars4 = jax.jit(lambda b: model4.init(
            jax.random.PRNGKey(0), b, train=False))(batches4[0])
        _, i8_apply4 = _bie4(model4, vars4, batches4[:2], h_tile=16)
        int84_dt = bench_arm(lambda v, b: i8_apply4(v, b), vars4, stacked4)

        comp = CodebookCompressor(
            channel=mcfg.backbone_filters[-1], seg_num=2,
            dict_sizes=(256,) * 3, dtype=mcfg.jnp_dtype)
        model4c = PyramidCollabModel(mcfg4, compressor=comp)
        vars4c = jax.jit(lambda b: model4c.init(
            {"params": jax.random.PRNGKey(0),
             "gumbel": jax.random.PRNGKey(1)}, b, train=False))(batches4[0])
        _, i8c_apply = _bie4(model4c, vars4c, batches4[:2], h_tile=16)
        cb4_dt = bench_arm(lambda v, b: i8c_apply(v, b), vars4c, stacked4)
    except Exception as e:
        print(f"# 4-agent codebook/int8 arms failed: {e}", flush=True)

    # optional per-stage roofline accounting (BENCH_DETAIL=1 / --detail):
    # measured ms + XLA-cost-analysis FLOPs/bytes per stage against the
    # device calibration (BASELINE.md: ~31 TF/s bf16 matmul, ~60 TF/s
    # conv, ~68 GB/s HBM on this tunneled chip) -> achieved fraction
    if os.environ.get("BENCH_DETAIL", "0") == "1" or \
            "--detail" in os.sys.argv:
        import jax as _jax
        PEAK_TFLOPS, PEAK_GBS = 60.0, 68.0

        def cost_of(fn, *fargs):
            try:
                ca = _jax.jit(fn).lower(*fargs).compile().cost_analysis()
                if isinstance(ca, list):
                    ca = ca[0]
                return (float(ca.get("flops", 0.0)),
                        float(ca.get("bytes accessed", 0.0)))
            except Exception:
                return 0.0, 0.0

        def chain_time(stage_fn):
            @jax.jit
            def chain(v, sb):
                def body(c, b):
                    out = stage_fn(v, b)
                    return c + sum(o.astype(jnp.float32).sum()
                                   for o in jax.tree.leaves(out)), 0
                big = jax.tree.map(lambda x: jnp.concatenate([x] * REP), sb)
                a, _ = jax.lax.scan(body, jnp.float32(0.0), big)
                return a
            _ = float(chain(variables, stacked))
            ts = []
            for _ in range(3):
                t0 = time.time()
                _ = float(chain(variables, stacked))
                ts.append(time.time() - t0)
            return min(ts) / n_chain

        def enc_fn(v, b):
            return model.apply(v, b, train=False, method="encode_agents")

        def full_fn(v, b):
            return model.apply(v, b, train=False)

        def dec_fn(v, b):
            out = model.apply(v, b, train=False)
            return decode_detections(
                out["cls_preds"][0], out["reg_preds"][0], anchors, pp_cfg,
                dir_preds=out["dir_preds"][0])

        t_enc = chain_time(enc_fn)
        t_full = chain_time(full_fn)
        t_dec = chain_time(dec_fn)
        stages = [
            ("encode", t_enc, cost_of(enc_fn, variables, batch)),
            ("fuse+heads", t_full - t_enc, None),
            ("decode+nms", t_dec - t_full, None),
            ("model total", t_full, cost_of(full_fn, variables, batch)),
            ("e2e", t_dec, cost_of(dec_fn, variables, batch)),
        ]
        fl_full = stages[3][2]
        fl_e2e = stages[4][2]
        stages[1] = ("fuse+heads", t_full - t_enc,
                     (fl_full[0] - stages[0][2][0],
                      fl_full[1] - stages[0][2][1]))
        stages[2] = ("decode+nms", t_dec - t_full,
                     (fl_e2e[0] - fl_full[0], fl_e2e[1] - fl_full[1]))
        print("# roofline (stock bf16 arms; device calib "
              f"{PEAK_TFLOPS:.0f} TF/s conv, {PEAK_GBS:.0f} GB/s HBM):",
              flush=True)
        for name, dt_s, cost in stages:
            fl, by = cost
            tf = fl / dt_s / 1e12
            gb = by / dt_s / 1e9
            bound = "compute" if tf / PEAK_TFLOPS > gb / PEAK_GBS else "memory"
            frac = max(tf / PEAK_TFLOPS, gb / PEAK_GBS)
            print(f"# {name:12s} {dt_s*1e3:7.2f} ms  {fl/1e9:8.1f} GFLOP "
                  f"{by/1e6:8.0f} MB  {tf:6.1f} TF/s {gb:6.1f} GB/s  "
                  f"{bound}-bound @ {frac*100:4.0f}% of roofline",
                  flush=True)

    # headline = the 4-agent int8 flagship arm — the max_cav=4 config the
    # BASELINE accuracy table describes (VERDICT r3 #7); fall back to the
    # 2-agent int8 arms, then bf16, if an arm failed
    if int84_dt:
        dt = int84_dt
        metric = "int8_4agent_e2e_frames_per_sec_per_chip"
    elif any(d for d in (int8_dt, pf_dt) if d):
        dt = min(d for d in (int8_dt, pf_dt) if d)
        metric = "int8_e2e_frames_per_sec_per_chip"
    else:
        dt = min(d for d in (stock_dt, fused_dt) if d)
        metric = "fp_bf16_e2e_frames_per_sec_per_chip"
    fps = 1.0 / dt

    # secondary: per-call latency incl. host dispatch (serving round trip)
    trivial = jax.jit(lambda x: x + 1.0)
    _ = float(trivial(jnp.float32(0.0)))
    t0 = time.time()
    for i in range(10):
        _ = float(trivial(jnp.float32(i)))
    fetch_overhead = (time.time() - t0) / 10
    percall = []
    for i in range(8):
        t0 = time.time()
        det = e2e(variables, batches[i % len(batches)])
        _ = float(det["scores"][0])
        percall.append(time.time() - t0)
    percall_ms = max(min(percall) - fetch_overhead, 1e-6) * 1e3

    print(json.dumps({
        "metric": metric,
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 24.0, 3),
        "detail": {
            "compile_s": round(compile_s, 1),
            "trace_s": round(trace_s, 1),
            "compile_cache_entries_before": cache_entries_before,
            # entries_after > entries_before distinguishes a true cache
            # MISS (new program fingerprint compiled + stored) from mere
            # backend slowness on a hit (r4 read 45.7 s with 546 entries
            # and no way to tell which)
            "compile_cache_entries_after": (
                len(os.listdir(cache_dir)) if os.path.isdir(cache_dir)
                else 0),
            "compile_cache_hit": bool(cache_entries_before and
                                      compile_s < 30.0),
            "latency_ms": round(dt * 1e3, 2),
            "stock_bf16_ms": round(stock_dt * 1e3, 2),
            "bf16_fused_ms": (round(fused_dt * 1e3, 2)
                              if fused_dt else None),
            "int8_fused_ms": (round(int8_dt * 1e3, 2)
                              if int8_dt else None),
            "int8_proj_first_ms": (round(pf_dt * 1e3, 2)
                                   if pf_dt else None),
            "int8_cls_corr_vs_fp": (round(int8_corr, 5)
                                    if int8_corr else None),
            "int8_4agent_ms": (round(int84_dt * 1e3, 2)
                               if int84_dt else None),
            "int8_codebook_4agent_ms": (round(cb4_dt * 1e3, 2)
                                        if cb4_dt else None),
            "percall_ms": round(percall_ms, 2),
            "chain_frames": n_chain,
            "grid": list(voxel.grid_size),
            "agents": 4 if int84_dt else max_cav,
            "detail_arm_agents": max_cav,
            "backend": jax.default_backend(),
            "num_detections": int(np.asarray(det["valid"]).sum()),
            "baseline_source": "HEAL-era GPU plot point 24 FPS "
                               "(ap_vs_fps_scatter_plot.py:19-27); "
                               "QuantV2X publishes no in-repo numbers",
        },
    }))


if __name__ == "__main__":
    main()
