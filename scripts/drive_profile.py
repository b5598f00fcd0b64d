"""Per-stage profile of the flagship frame via prefix chains.

Chains (16 steps, distinct frames): encode | encode+fuse | e2e(+decode),
for stock bf16, bf16 fused engine, int8 fused engine. Differences give
per-stage costs with the per-call tunnel overhead cancelled.
"""
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
    batch = batches[0]
    model = PyramidCollabModel(mcfg)
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b,
                                             train=False))(batch)
    anchors = anc.generate_anchors(acfg)[0]
    pp_cfg = PostprocessCfg(gt_range=lidar_range, pre_nms_top_k=256,
                            max_detections=150)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    REP = 4
    n_chain = len(batches) * REP

    def timeit(chain):
        _ = float(chain(variables, stacked))
        ts = []
        for _ in range(3):
            t0 = time.time()
            _ = float(chain(variables, stacked))
            ts.append(time.time() - t0)
        return min(ts) / n_chain

    def leafsum(t):
        return sum(x.astype(jnp.float32).sum()
                   for x in jax.tree.leaves(t))

    def make_chains(apply_fn):
        """apply_fn(v, b, method) -> output; returns 3 prefix chains."""
        def mk(stage):
            @jax.jit
            def chain(v, sb):
                def body(c, b):
                    feats = apply_fn(v, b, "encode_agents")
                    if stage == 0:
                        return c + leafsum(feats), 0
                    out = apply_fn(v, (feats, b), "fuse_and_predict")
                    if stage == 1:
                        return c + leafsum(out), 0
                    det = decode_detections(
                        out["cls_preds"][0], out["reg_preds"][0], anchors,
                        pp_cfg, dir_preds=out["dir_preds"][0])
                    return c + det["scores"].sum(), 0
                big = jax.tree.map(lambda x: jnp.concatenate([x] * REP), sb)
                acc, _ = jax.lax.scan(body, jnp.float32(0.0), big)
                return acc
            return chain
        return [mk(s) for s in range(3)]

    def profile(label, apply_fn):
        chains = make_chains(apply_fn)
        t = [timeit(c) for c in chains]
        print(f"{label}: encode {t[0]*1e3:6.2f} | +fuse "
              f"{(t[1]-t[0])*1e3:6.2f} | +decode {(t[2]-t[1])*1e3:6.2f} "
              f"| e2e {t[2]*1e3:6.2f} ms", flush=True)
        return t

    def stock_apply(v, b, method):
        if method == "encode_agents":
            return model.apply(v, b, train=False, method="encode_agents")
        feats, b0 = b
        return model.apply(v, feats, b0, train=False,
                           method="fuse_and_predict")

    profile("stock bf16", stock_apply)

    from quantv2x_tpu.quant.fused_engine import build_fused_engine
    _, fused_apply = build_fused_engine(model, variables, h_tile=16,
                                        min_channels=0)

    def bf16_fused(v, b, method):
        if method == "encode_agents":
            return fused_apply(v, b, method="encode_agents")
        feats, b0 = b
        return fused_apply(v, feats, b0, method="fuse_and_predict")

    profile("bf16 fused", bf16_fused)

    from quantv2x_tpu.quant.int8_fused_engine import build_int8_fused_engine
    _, int8_apply = build_int8_fused_engine(model, variables, batches[:2],
                                            h_tile=16)

    def int8_fused(v, b, method):
        if method == "encode_agents":
            return int8_apply(v, b, method="encode_agents")
        feats, b0 = b
        return int8_apply(v, feats, b0, method="fuse_and_predict")

    profile("int8 fused", int8_fused)


if __name__ == "__main__":
    main()
