"""TPU A/B: per-level warp fusion vs proj_first (warp once before pyramid).

proj_first (reference fuse_modules/pyramid_fuse_onnx.py deployment mode)
warps agent features into the ego frame a single time at full resolution;
fusion is then warp-free at every level, paying only a strided fov-mask
slice. Scan-chain timing per BASELINE.md discipline; fused-block engine
active on both arms (deployment configuration).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quantv2x_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

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


def chain_time(apply_fn, variables, stacked, n):
    @jax.jit
    def chain(v, sb):
        def body(c, b):
            out = apply_fn(v, b)
            return c + out["cls_preds"].sum().astype(jnp.float32), 0
        big = jax.tree.map(lambda x: jnp.concatenate([x] * REP), sb)
        acc, _ = jax.lax.scan(body, jnp.float32(0), big)
        return acc

    t0 = time.time()
    _ = float(chain(variables, stacked))
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        _ = float(chain(variables, stacked))
        times.append(time.time() - t0)
    return min(times) / n * 1e3, compile_s


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

    base = ModelCfg(voxel=VOXEL, max_cav=MAX_CAV, dtype="bfloat16")
    model0 = PyramidCollabModel(base)
    variables = jax.jit(
        lambda b: model0.init(jax.random.PRNGKey(0), b, train=False)
    )(batches[0])

    import dataclasses
    results = {}
    for pf in (False, True):
        mcfg = dataclasses.replace(base, proj_first=pf)
        model = PyramidCollabModel(mcfg)
        # proj_first adds no params: same variable tree works for both arms
        _, fused_apply = build_fused_engine(model, variables, h_tile=16,
                                            min_channels=0)
        ms, cs = chain_time(lambda v, b: fused_apply(v, b), variables,
                            stacked, K * REP)
        results[pf] = ms
        print(f"proj_first={pf}: {ms:7.2f} ms (compile {cs:.0f}s)",
              flush=True)
    print(f"speedup {results[False] / results[True]:.3f}x", flush=True)


if __name__ == "__main__":
    main()
