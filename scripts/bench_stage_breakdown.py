"""TPU stage breakdown of the fused flagship: encode vs fuse vs decode.

Scan-chain timing (BASELINE.md discipline). Run AFTER bench.py has warmed
the compile cache.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from quantv2x_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quantv2x_tpu.data import anchors as anc  # noqa: E402
from quantv2x_tpu.data.pipeline import frame_to_batch  # noqa: E402
from quantv2x_tpu.data.postprocess import (  # noqa: E402
    PostprocessCfg,
    decode_detections,
)
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


def chain_time(step_fn, stacked, n):
    @jax.jit
    def chain(sb):
        def body(c, b):
            return c + step_fn(b), 0
        big = jax.tree.map(lambda x: jnp.concatenate([x] * REP), sb)
        acc, _ = jax.lax.scan(body, jnp.float32(0), big)
        return acc

    _ = float(chain(stacked))
    times = []
    for _ in range(3):
        t0 = time.time()
        _ = float(chain(stacked))
        times.append(time.time() - t0)
    return min(times) / n * 1e3


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
    mcfg = ModelCfg(voxel=VOXEL, max_cav=MAX_CAV, dtype="bfloat16")
    model = PyramidCollabModel(mcfg)
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(batches[0])
    _, fused_apply = build_fused_engine(model, variables, h_tile=16,
                                        min_channels=0)
    acfg = anc.AnchorGridCfg(lidar_range=LIDAR_RANGE,
                             voxel_size=(0.4, 0.4, 4.0), feature_stride=2,
                             classes=anc.V2XREAL_CLASSES)
    anchors = anc.generate_anchors(acfg)[0]
    pp_cfg = PostprocessCfg(gt_range=LIDAR_RANGE, pre_nms_top_k=256,
                            max_detections=150)

    n = K * REP

    # stage 1: encode (VFE + scatter + BEV backbone), fused blocks active
    def enc(b):
        f = fused_apply(variables, b, method="encode_agents")
        return f.sum().astype(jnp.float32)

    ms_enc = chain_time(enc, stacked, n)
    print(f"encode_agents:     {ms_enc:7.2f} ms", flush=True)

    # precompute features for stage-2-only timing
    feats4 = [jax.jit(
        lambda b: fused_apply(variables, b, method="encode_agents"))(b)
        for b in batches]
    stacked_fb = (jax.tree.map(lambda *xs: jnp.stack(xs), *feats4),
                  jax.tree.map(lambda *xs: jnp.stack(xs), *batches))

    def fuse(fb):
        f, b = fb
        out = fused_apply(variables, f, b, method="fuse_and_predict")
        return out["cls_preds"].sum().astype(jnp.float32)

    ms_fuse = chain_time(fuse, stacked_fb, n)
    print(f"fuse_and_predict:  {ms_fuse:7.2f} ms", flush=True)

    # stage 3: decode+NMS from precomputed head outputs
    outs = [jax.jit(lambda b: fused_apply(variables, b))(b)
            for b in batches]
    stacked_o = jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    def dec(o):
        det = decode_detections(o["cls_preds"][0], o["reg_preds"][0],
                                anchors, pp_cfg, dir_preds=o["dir_preds"][0])
        return det["scores"].sum().astype(jnp.float32)

    ms_dec = chain_time(dec, stacked_o, n)
    print(f"decode+nms:        {ms_dec:7.2f} ms", flush=True)
    print(f"sum={ms_enc + ms_fuse + ms_dec:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
