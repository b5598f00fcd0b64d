"""Binary-search decode's in-context cost: progressively enable stages.
Variant inputs scale BOTH cls and reg per rep (no CSE sharing)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from quantv2x_tpu.data import anchors as anc
    from quantv2x_tpu.data.anchors import decode_deltas
    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.data.voxelizer import VoxelCfg
    from quantv2x_tpu.models.collab_model import ModelCfg, PyramidCollabModel
    from quantv2x_tpu.quant.fused_engine import build_fused_engine
    from quantv2x_tpu.utils import box_utils as bu
    from quantv2x_tpu.utils.common import limit_period

    lidar_range = (-140.8, -40.0, -3.0, 140.8, 40.0, 1.0)
    voxel = VoxelCfg(lidar_range=lidar_range, voxel_size=(0.4, 0.4, 4.0),
                     max_points_per_voxel=32, max_voxels=24000)
    max_cav = 2
    mcfg = ModelCfg(voxel=voxel, max_cav=max_cav, dtype="bfloat16")
    acfg = anc.AnchorGridCfg(lidar_range=lidar_range,
                             voxel_size=(0.4, 0.4, 4.0), feature_stride=2,
                             classes=anc.V2XREAL_CLASSES)
    frames = [make_frame(SyntheticCfg(
        lidar_range=lidar_range, num_agents=max_cav, num_objects=12,
        points_per_agent=30000, seed=s)) for s in range(4)]
    batches = [frame_to_batch(f, voxel, max_cav=max_cav) for f in frames]
    model = PyramidCollabModel(mcfg)
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b,
                                             train=False))(batches[0])
    anchors = anc.generate_anchors(acfg)[0]
    H, W, S, _ = anchors.shape
    C = 3
    _, fused_apply = build_fused_engine(model, variables, h_tile=16,
                                        min_channels=0)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    REP = 4
    n_chain = len(batches) * REP

    def decode_upto(cls_preds, reg_preds, dir_preds, stage):
        prob = jax.nn.sigmoid(cls_preds.reshape(H * W * S, C))
        scores = prob.max(axis=-1)
        deltas = reg_preds.reshape(H * W * S, 7)
        boxes = decode_deltas(deltas, anchors.reshape(-1, 7))
        dlogits = dir_preds.reshape(H * W * S, 2)
        dir_labels = jnp.argmax(dlogits, axis=-1).astype(boxes.dtype)
        period = jnp.pi
        yaw = boxes[:, 6]
        dir_rot = limit_period(yaw - 0.7853, 0.0, period)
        yaw = limit_period(dir_rot + 0.7853 + period * dir_labels, 0.5,
                           2 * jnp.pi)
        boxes = boxes.at[:, 6].set(yaw)
        masked = jnp.where(scores > 0.2, scores, -1.0)
        ts, ti = jax.lax.approx_max_k(masked, 256, recall_target=0.95)
        if stage == 0:
            return ts.sum() + boxes[:256].sum()
        top_boxes = boxes[ti]
        if stage == 1:                      # + gather
            return ts.sum() + top_boxes.sum()
        corners = bu.boxes_to_corners_3d(top_boxes, "hwl")
        if stage == 2:                      # + corners
            return ts.sum() + corners.sum()
        ok = ((ts > 0) & bu.mask_large_boxes(corners)
              & bu.mask_abnormal_z(corners, -6.0, 4.0))
        if stage == 3:                      # + filters
            return ts.sum() + ok.sum()
        keep = bu.nms_corners(corners, ts, ok, 0.15)
        if stage == 4:                      # + nms
            return keep.sum() + ts.sum()
        final = keep & bu.mask_boxes_range(corners, lidar_range)
        order = jnp.argsort(jnp.where(final, -ts, jnp.inf), stable=True)
        sel = order[:150]
        return corners[sel].sum() + ts[sel].sum()

    def mk(stage):
        @jax.jit
        def chain(v, sb):
            def body(c, b):
                out = fused_apply(v, b)
                val = decode_upto(out["cls_preds"][0],
                                  out["reg_preds"][0],
                                  out["dir_preds"][0], stage)
                return c + val.astype(jnp.float32), 0
            big = jax.tree.map(lambda x: jnp.concatenate([x] * REP), sb)
            a, _ = jax.lax.scan(body, jnp.float32(0.0), big)
            return a
        return chain

    prev = None
    names = ["topk+deltas", "+gather", "+corners", "+filters", "+nms",
             "+argsort/sel"]
    for stage in range(6):
        chain = mk(stage)
        _ = float(chain(variables, stacked))
        ts = []
        for _ in range(3):
            t0 = time.time()
            _ = float(chain(variables, stacked))
            ts.append(time.time() - t0)
        cur = min(ts) / n_chain
        d = "" if prev is None else f"  (+{(cur-prev)*1e3:.2f})"
        print(f"stage {stage} {names[stage]:14s}: {cur*1e3:.2f} ms{d}",
              flush=True)
        prev = cur


if __name__ == "__main__":
    main()
