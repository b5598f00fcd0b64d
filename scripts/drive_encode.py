"""Encode sub-stage costs: VFE | +scatter | +backbone via method chains."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.data.voxelizer import VoxelCfg
    from quantv2x_tpu.models.collab_model import ModelCfg, PyramidCollabModel
    from quantv2x_tpu.models.pillar_encoder import scatter_to_bev

    lidar_range = (-140.8, -40.0, -3.0, 140.8, 40.0, 1.0)
    voxel = VoxelCfg(lidar_range=lidar_range, voxel_size=(0.4, 0.4, 4.0),
                     max_points_per_voxel=32, max_voxels=24000)
    mcfg = ModelCfg(voxel=voxel, max_cav=2, dtype="bfloat16")
    frames = [make_frame(SyntheticCfg(
        lidar_range=lidar_range, num_agents=2, num_objects=12,
        points_per_agent=30000, seed=s)) for s in range(4)]
    batches = [frame_to_batch(f, voxel, max_cav=2) for f in frames]
    model = PyramidCollabModel(mcfg)
    variables = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b,
                                             train=False))(batches[0])
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    REP = 4
    n_chain = len(batches) * REP
    nx, ny, _ = voxel.grid_size

    def vfe_only(m, b):
        vf = b["voxel_features"]
        B, L, V, P, F = vf.shape
        return m.vfe(vf.reshape(B * L * V, P, F),
                     b["voxel_coords"].reshape(B * L * V, 3),
                     b["voxel_num_points"].reshape(B * L * V), False)

    def vfe_scatter(m, b):
        pil = vfe_only(m, b)
        vf = b["voxel_features"]
        B, L, V = vf.shape[:3]
        pil = pil.reshape(B * L, V, -1)
        return jax.vmap(lambda f, co, msk: scatter_to_bev(
            f, co, msk, (ny, nx)))(
                pil, b["voxel_coords"].reshape(B * L, V, 3),
                b["voxel_mask"].reshape(B * L, V))

    def full_encode(m, b):
        return m.encode_agents(b, train=False)

    for label, fn in [("vfe", vfe_only), ("vfe+scatter", vfe_scatter),
                      ("encode(all)", full_encode)]:
        @jax.jit
        def chain(v, sb, fn=fn):
            def body(c, b):
                out = model.apply(v, b, method=fn)
                return c + out.astype(jnp.float32).sum(), 0
            big = jax.tree.map(lambda x: jnp.concatenate([x] * REP), sb)
            a, _ = jax.lax.scan(body, jnp.float32(0.0), big)
            return a
        _ = float(chain(variables, stacked))
        ts = []
        for _ in range(3):
            t0 = time.time()
            _ = float(chain(variables, stacked))
            ts.append(time.time() - t0)
        print(f"{label:12s}: {min(ts)/n_chain*1e3:.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
