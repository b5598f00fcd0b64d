"""Pinpoint the in-context decode cost op by op."""
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
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.data.voxelizer import VoxelCfg
    from quantv2x_tpu.models.collab_model import ModelCfg, PyramidCollabModel
    from quantv2x_tpu.quant.fused_engine import build_fused_engine

    lidar_range = (-140.8, -40.0, -3.0, 140.8, 40.0, 1.0)
    voxel = VoxelCfg(lidar_range=lidar_range, voxel_size=(0.4, 0.4, 4.0),
                     max_points_per_voxel=32, max_voxels=24000)
    mcfg = ModelCfg(voxel=voxel, max_cav=2, dtype="bfloat16")
    acfg = anc.AnchorGridCfg(lidar_range=lidar_range,
                             voxel_size=(0.4, 0.4, 4.0), feature_stride=2,
                             classes=anc.V2XREAL_CLASSES)
    frames = [make_frame(SyntheticCfg(
        lidar_range=lidar_range, num_agents=2, num_objects=12,
        points_per_agent=30000, seed=s)) for s in range(4)]
    batches = [frame_to_batch(f, voxel, max_cav=2) for f in frames]
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

    def variant(out, mode):
        cls = out["cls_preds"][0]                     # (H, W, S*C) bf16
        if mode == "sum":
            return cls.astype(jnp.float32).sum()
        if mode == "f32sum":
            return cls.astype(jnp.float32).sum() * 2.0
        if mode == "reshape_max":
            m = cls.reshape(H, W, S, C).max(axis=-1)
            return m.astype(jnp.float32).sum()
        if mode == "slice_max":
            m = cls[..., 0::C]
            for c in range(1, C):
                m = jnp.maximum(m, cls[..., c::C])
            return m.astype(jnp.float32).sum()
        if mode == "flat":
            m = cls.reshape(H, W, S, C).max(axis=-1)
            return m.reshape(-1).astype(jnp.float32).sum()
        if mode == "topk":
            m = cls.reshape(H, W, S, C).max(axis=-1)
            sc = jax.nn.sigmoid(m.reshape(-1).astype(jnp.float32))
            ts, ti = jax.lax.approx_max_k(sc, 256, recall_target=0.95)
            return ts.sum() + ti.sum()
        if mode == "topk_exact":
            m = cls.reshape(H, W, S, C).max(axis=-1)
            sc = jax.nn.sigmoid(m.reshape(-1).astype(jnp.float32))
            ts, ti = jax.lax.top_k(sc, 256)
            return ts.sum() + ti.sum()
        if mode == "gathers":
            m = cls.reshape(H, W, S, C).max(axis=-1)
            sc = jax.nn.sigmoid(m.reshape(-1).astype(jnp.float32))
            ts, ti = jax.lax.approx_max_k(sc, 256, recall_target=0.95)
            hi = ti // (W * S)
            rem = ti % (W * S)
            wi = rem // S
            si = rem % S
            rows = out["reg_preds"][0][hi, wi]
            d = jnp.take_along_axis(
                rows, si[:, None] * 7 + jnp.arange(7)[None, :], axis=1)
            return ts.sum() + d.astype(jnp.float32).sum()
        raise ValueError(mode)

    for mode in ["sum", "reshape_max", "slice_max", "flat", "topk",
                 "topk_exact", "gathers"]:
        @jax.jit
        def chain(v, sb, mode=mode):
            def body(c, b):
                out = fused_apply(v, b)
                return c + variant(out, mode).astype(jnp.float32), 0
            big = jax.tree.map(lambda x: jnp.concatenate([x] * REP), sb)
            a, _ = jax.lax.scan(body, jnp.float32(0.0), big)
            return a
        _ = float(chain(variables, stacked))
        ts = []
        for _ in range(3):
            t0 = time.time()
            _ = float(chain(variables, stacked))
            ts.append(time.time() - t0)
        print(f"{mode:12s}: {min(ts)/n_chain*1e3:.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
