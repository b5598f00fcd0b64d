"""In-context marginal cost of decode: full e2e chain with decode run
1x vs 3x per frame (distinct inputs to defeat CSE)."""
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
    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.postprocess import PostprocessCfg, decode_detections
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.data.voxelizer import VoxelCfg
    from quantv2x_tpu.models.collab_model import ModelCfg, PyramidCollabModel
    from quantv2x_tpu.quant.fused_engine import build_fused_engine

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
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0),
                                             batches[0], train=False))(
                                                 batches[0])
    anchors = anc.generate_anchors(acfg)[0]
    pp_cfg = PostprocessCfg(gt_range=lidar_range, pre_nms_top_k=256,
                            max_detections=150)
    _, fused_apply = build_fused_engine(model, variables, h_tile=16,
                                        min_channels=0)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    REP = 4
    n_chain = len(batches) * REP

    def mk(dec_reps):
        @jax.jit
        def chain(v, sb):
            def body(c, b):
                out = fused_apply(v, b)
                acc = c
                for i in range(dec_reps):
                    det = decode_detections(
                        out["cls_preds"][0] * (1.0 + 0.01 * i),
                        out["reg_preds"][0], anchors, pp_cfg,
                        dir_preds=out["dir_preds"][0])
                    acc = acc + det["scores"].sum()
                return acc, 0
            big = jax.tree.map(lambda x: jnp.concatenate([x] * REP), sb)
            a, _ = jax.lax.scan(body, jnp.float32(0.0), big)
            return a
        return chain

    for reps in (0, 1, 3):
        if reps == 0:
            @jax.jit
            def chain(v, sb):
                def body(c, b):
                    out = fused_apply(v, b)
                    return c + sum(o.astype(jnp.float32).sum()
                                   for o in jax.tree.leaves(out)), 0
                big = jax.tree.map(lambda x: jnp.concatenate([x] * REP), sb)
                a, _ = jax.lax.scan(body, jnp.float32(0.0), big)
                return a
        else:
            chain = mk(reps)
        _ = float(chain(variables, stacked))
        ts = []
        for _ in range(4):
            t0 = time.time()
            _ = float(chain(variables, stacked))
            ts.append(time.time() - t0)
        print(f"decode x{reps}: {min(ts)/n_chain*1e3:.2f} ms/frame "
              f"(all runs: {[f'{t/n_chain*1e3:.1f}' for t in ts]})",
              flush=True)


if __name__ == "__main__":
    main()
