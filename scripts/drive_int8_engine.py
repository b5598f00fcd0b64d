"""TPU drive: A/B the int8 fused engine vs stock bf16 vs bf16 fused engine
on the flagship PyramidCollabModel (704x200 grid, 2 agents).

Scan-chain timing (distinct frames inside one jit, one scalar fetch) as in
bench.py. Also checks cls-logit correlation of the int8 path vs stock.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    basic = os.environ.get("DRIVE_BASIC", "0") == "1"
    lidar_range = (-140.8, -40.0, -3.0, 140.8, 40.0, 1.0)
    voxel = VoxelCfg(lidar_range=lidar_range, voxel_size=(0.4, 0.4, 4.0),
                     max_points_per_voxel=32, max_voxels=24000)
    max_cav = 2
    mcfg = ModelCfg(voxel=voxel, max_cav=max_cav, dtype="bfloat16",
                    **({"pyramid_block": "basic"} if basic else {}))
    acfg = anc.AnchorGridCfg(lidar_range=lidar_range,
                             voxel_size=(0.4, 0.4, 4.0), feature_stride=2,
                             classes=anc.V2XREAL_CLASSES)
    frames = [make_frame(SyntheticCfg(
        lidar_range=lidar_range, num_agents=max_cav, num_objects=12,
        points_per_agent=30000, seed=s)) for s in range(4)]
    batches = [frame_to_batch(f, voxel, max_cav=max_cav) for f in frames]
    batch = batches[0]
    model = PyramidCollabModel(mcfg)
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b,
                                             train=False))(batch)
    anchors = anc.generate_anchors(acfg)[0]
    pp_cfg = PostprocessCfg(gt_range=lidar_range, pre_nms_top_k=256,
                            max_detections=150)

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    REP = int(os.environ.get("DRIVE_REP", "4"))
    n_chain = len(batches) * REP
    skip_stock = os.environ.get("DRIVE_SKIP_STOCK", "0") == "1"

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

    def bench(apply_fn, label):
        t0 = time.time()
        chain = make_chain(apply_fn)
        _ = float(chain(variables, stacked))
        print(f"{label}: compile {time.time()-t0:.1f}s", flush=True)
        times = []
        for _ in range(3):
            t0 = time.time()
            _ = float(chain(variables, stacked))
            times.append(time.time() - t0)
        dt = min(times) / n_chain
        print(f"{label}: {dt*1e3:.2f} ms/frame  {1/dt:.1f} fps", flush=True)
        return dt

    stock = lambda v, b: model.apply(v, b, train=False)
    dt_stock = None if skip_stock else bench(stock, "stock bf16")

    # bf16 fused engine
    from quantv2x_tpu.quant.fused_engine import build_fused_engine
    _, fused_apply = build_fused_engine(model, variables, h_tile=16,
                                        min_channels=0)
    dt_fused = bench(lambda v, b: fused_apply(v, b), "bf16 fused")

    # int8 fused engine (calibrate on 2 frames)
    from quantv2x_tpu.quant.int8_fused_engine import build_int8_fused_engine
    t0 = time.time()
    tables, int8_apply = build_int8_fused_engine(
        model, variables, batches[:2], h_tile=16)
    print(f"int8 engine build: {time.time()-t0:.1f}s, "
          f"{len(tables)} blocks", flush=True)
    dt_int8 = bench(lambda v, b: int8_apply(v, b), "int8 fused")

    # fidelity: cls logits correlation int8 vs stock on one frame
    o_s = jax.jit(stock)(variables, batch)
    o_q = jax.jit(lambda v, b: int8_apply(v, b))(variables, batch)
    a = np.asarray(o_s["cls_preds"], np.float32).ravel()
    bq = np.asarray(o_q["cls_preds"], np.float32).ravel()
    corr = np.corrcoef(a, bq)[0, 1]
    print(f"cls corr int8 vs stock: {corr:.5f}", flush=True)
    s = "" if dt_stock is None else f"stock {dt_stock*1e3:.1f} "
    print(f"summary: {s}fused {dt_fused*1e3:.1f} "
          f"int8 {dt_int8*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
