"""TPU ablation of fuse_and_predict internals: warp / fuse / heads /
deconvs, by monkeypatching one component at a time. Model-only scan-chain
timing, fused engine active — deltas vs full attribute the cost."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from quantv2x_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import quantv2x_tpu.models.pyramid_fusion as pf  # noqa: E402
from quantv2x_tpu.data.pipeline import frame_to_batch  # noqa: E402
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame  # noqa: E402
from quantv2x_tpu.data.voxelizer import VoxelCfg  # noqa: E402
from quantv2x_tpu.models.collab_model import (  # noqa: E402
    ModelCfg,
    PyramidCollabModel,
)
from quantv2x_tpu.quant.fused_engine import build_fused_engine  # noqa: E402

LIDAR_RANGE = (-140.8, -40.0, -3.0, 140.8, 40.0, 1.0)
VOXEL = VoxelCfg(lidar_range=LIDAR_RANGE, voxel_size=(0.4, 0.4, 4.0),
                 max_points_per_voxel=32, max_voxels=24000)
MAX_CAV = 2
K, REP = 4, 3


def measure(batches, stacked, label):
    mcfg = ModelCfg(voxel=VOXEL, max_cav=MAX_CAV, dtype="bfloat16")
    model = PyramidCollabModel(mcfg)
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(batches[0])
    _, fused_apply = build_fused_engine(model, variables, h_tile=16,
                                        min_channels=0)

    @jax.jit
    def chain(v, sb):
        def body(c, b):
            out = fused_apply(v, b)
            return c + out["cls_preds"].sum().astype(jnp.float32), 0
        big = jax.tree.map(lambda x: jnp.concatenate([x] * REP), sb)
        acc, _ = jax.lax.scan(body, jnp.float32(0), big)
        return acc

    _ = float(chain(variables, stacked))
    times = []
    for _ in range(3):
        t0 = time.time()
        _ = float(chain(variables, stacked))
        times.append(time.time() - t0)
    ms = min(times) / (K * REP) * 1e3
    print(f"{label:24s} {ms:7.2f} ms", flush=True)
    return ms


def main():
    print("backend:", jax.default_backend(), flush=True)
    frames = [
        make_frame(SyntheticCfg(lidar_range=LIDAR_RANGE, num_agents=MAX_CAV,
                                num_objects=12, points_per_agent=30000,
                                seed=s))
        for s in range(K)
    ]
    batches = [frame_to_batch(f, VOXEL, max_cav=MAX_CAV) for f in frames]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)

    full = measure(batches, stacked, "full")

    # 1) warp -> identity
    orig_warp = pf.warp_affine_batch
    pf.warp_affine_batch = lambda feats, theta, ac=False: feats
    no_warp = measure(batches, stacked, "warp->identity")
    pf.warp_affine_batch = orig_warp

    # 2) weighted softmax fuse -> masked mean (keep warps)
    orig_fuse = pf.weighted_fuse

    def mean_fuse(feats, scores, agent_mask, affine_ego, align_corners=False):
        feats_ego = pf.warp_affine_batch(feats, affine_ego, align_corners)
        m = agent_mask[:, None, None, None].astype(feats_ego.dtype)
        return (feats_ego * m).sum(0) / jnp.maximum(m.sum(0), 1e-3)

    pf.weighted_fuse = mean_fuse
    no_softmax = measure(batches, stacked, "softmax->mean")
    pf.weighted_fuse = orig_fuse

    # 3) pyramid decode (deconv+concat) -> cheap broadcast surrogate
    # (patch only the PyramidFusion subclass so the encoder backbone's own
    # decode keeps its real channel counts)
    def fake_decode(self, feats, train=False):
        h, w = feats[0].shape[1:3]
        reps = [jnp.broadcast_to(
            f.mean(axis=(1, 2), keepdims=True),
            (f.shape[0], h, w, 128)).astype(f.dtype) for f in feats]
        return jnp.concatenate(reps, axis=-1)

    pf.PyramidFusion.decode = fake_decode
    no_decode = measure(batches, stacked, "deconvs->broadcast")
    del pf.PyramidFusion.decode

    print(f"warp cost     ~{full - no_warp:6.2f} ms")
    print(f"softmax cost  ~{full - no_softmax:6.2f} ms")
    print(f"deconv cost   ~{full - no_decode:6.2f} ms")


if __name__ == "__main__":
    main()
