"""(a) overhead amortization with 64-frame chains; (b) fuse sub-stages."""
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
    from quantv2x_tpu.utils.transformation import normalize_pairwise_tfm
    from quantv2x_tpu.quant.fused_engine import build_fused_engine

    rng = jax.random.PRNGKey(0)

    @jax.jit
    def trivial64(xs):
        def body(c, x):
            return c + x.sum(), 0
        a, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return a

    xs = jax.random.normal(rng, (64, 8, 128), jnp.float32)
    _ = float(trivial64(xs))
    ts = []
    for _ in range(3):
        t0 = time.time()
        _ = float(trivial64(xs))
        ts.append(time.time() - t0)
    print(f"trivial 64-step scan: {min(ts)*1e3:.1f} ms total", flush=True)

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
    pp_cfg = PostprocessCfg(gt_range=lidar_range, pre_nms_top_k=256,
                            max_detections=150)
    _, fused_apply = build_fused_engine(model, variables, h_tile=16,
                                        min_channels=0)
    stacked = jax.tree.map(lambda *xs_: jnp.stack(xs_), *batches)

    def e2e_chain(rep):
        @jax.jit
        def chain(v, sb):
            def body(c, b):
                out = fused_apply(v, b)
                det = decode_detections(
                    out["cls_preds"][0], out["reg_preds"][0], anchors,
                    pp_cfg, dir_preds=out["dir_preds"][0])
                return c + det["scores"].sum(), 0
            big = jax.tree.map(lambda x: jnp.concatenate([x] * rep), sb)
            a, _ = jax.lax.scan(body, jnp.float32(0.0), big)
            return a
        return chain, 4 * rep

    for rep in (4, 16):
        chain, n = e2e_chain(rep)
        _ = float(chain(variables, stacked))
        ts = []
        for _ in range(3):
            t0 = time.time()
            _ = float(chain(variables, stacked))
            ts.append(time.time() - t0)
        print(f"e2e bf16-fused chain x{n}: {min(ts)/n*1e3:.2f} ms/frame",
              flush=True)

    # fuse sub-stages: agent feats precomputed once, then
    # (a) pyramid trunk (get_multiscale_feature) only,
    # (b) + occupancy heads + warp + weighted fuse,
    # (c) + decode_multiscale (deconvs) + shrink + heads  (= fuse_and_predict)
    H, W = mcfg.bev_hw

    def feats_of(b):
        return model.apply(variables, b, train=False,
                           method="encode_agents")

    feats = [jax.jit(feats_of)(b) for b in batches]
    fstack = jax.tree.map(lambda *xs_: jnp.stack(xs_), *feats)

    from quantv2x_tpu.models.pyramid_fusion import weighted_fuse

    def stage_fn(stage):
        def fn(m, agent_feats, b):
            c = m.cfg
            affine = normalize_pairwise_tfm(
                b["pairwise_t_matrix"], H, W, c.voxel.voxel_size[0])
            B, L = agent_feats.shape[:2]
            x = agent_feats.reshape((B * L,) + agent_feats.shape[2:])
            feats = m.pyramid.encode(x, False)
            if stage == 0:
                return sum(o.astype(jnp.float32).sum() for o in feats)
            theta_ego = affine[:, 0]
            fused_levels = []
            for i, f in enumerate(feats):
                occ = m.pyramid.single_heads[i](f)
                score = jax.nn.sigmoid(occ) + 1e-4
                fl = f.reshape(B, L, *f.shape[1:])
                sl = score.reshape(B, L, *score.shape[1:])
                fused = jax.vmap(
                    lambda fb, sb, mb, tb: weighted_fuse(
                        fb, sb, mb, tb, m.pyramid.align_corners))(
                    fl, sl, b["agent_mask"], theta_ego)
                fused_levels.append(fused)
            if stage == 1:
                return sum(o.astype(jnp.float32).sum()
                           for o in fused_levels)
            y = m.pyramid.decode(tuple(fused_levels), False)
            y = m.shrink(y)
            heads = m.heads(y)
            return sum(o.astype(jnp.float32).sum() for o in heads)
        return fn

    names = ["trunk", "trunk+fuse", "full fuse_and_predict"]
    for stage in range(3):
        fn = stage_fn(stage)

        @jax.jit
        def chain(v, fs, sb, fn=fn):
            def body(c, xb):
                f, b = xb
                val = model.apply(v, f, b, method=fn)
                return c + val.astype(jnp.float32), 0
            bigf = jax.tree.map(lambda x: jnp.concatenate([x] * 4), fs)
            bigb = jax.tree.map(lambda x: jnp.concatenate([x] * 4), sb)
            a, _ = jax.lax.scan(body, jnp.float32(0.0), (bigf, bigb))
            return a
        try:
            _ = float(chain(variables, fstack, stacked))
            ts = []
            for _ in range(3):
                t0 = time.time()
                _ = float(chain(variables, fstack, stacked))
                ts.append(time.time() - t0)
            print(f"fuse[{names[stage]}]: {min(ts)/16*1e3:.2f} ms/frame",
                  flush=True)
        except Exception as e:
            print(f"fuse[{names[stage]}] failed: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
