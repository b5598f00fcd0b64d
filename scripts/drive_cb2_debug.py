"""Debug: stage-2 codebook run scores 0.0 with the wire bypassed."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("QV2X_PLATFORM", "cpu")
from quantv2x_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import dataclasses
import jax
import jax.numpy as jnp

from quantv2x_tpu.config.hypes import load_hypes
from quantv2x_tpu.data.pipeline import frame_to_batch
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.models.codebook import CodebookCompressor
from quantv2x_tpu.models.collab_model import PyramidCollabModel
from quantv2x_tpu.train import checkpoint as ckpt
from quantv2x_tpu.train.trainer import OptimCfg, create_train_state

hypes = load_hypes("configs/v2x_real/codebook_pyramid_stage2.yaml")
mcfg = dataclasses.replace(hypes.model, max_cav=4)
comp = CodebookCompressor(channel=mcfg.backbone_filters[-1], seg_num=2,
                          dict_sizes=(256,) * 3, dtype=mcfg.jnp_dtype)
model = PyramidCollabModel(mcfg, compressor=comp)
batch = frame_to_batch(
    make_frame(SyntheticCfg(lidar_range=hypes.voxel.lidar_range,
                            num_agents=4, num_objects=24,
                            points_per_agent=30000, seed=2000)),
    hypes.voxel, max_cav=4)
state, _ = create_train_state(model, jax.random.PRNGKey(0), batch,
                              OptimCfg(),
                              init_rngs={"gumbel": jax.random.PRNGKey(1)})
state, ep = ckpt.restore_checkpoint("runs/codebook_stage2", state)
print("epoch", ep)
variables = {"params": state.params, "batch_stats": state.batch_stats,
             **dict(state.extra_vars)}


@jax.jit
def probe(variables, batch):
    def fn(mdl):
        feats = mdl.encode_agents(batch)
        q, _aux = mdl.compressor(feats, False)
        out_fp = mdl.fuse_and_predict(feats, batch)
        out_q = mdl.fuse_and_predict(q, batch)
        return dict(
            f_norm=jnp.linalg.norm(feats), q_norm=jnp.linalg.norm(q),
            err=jnp.linalg.norm(feats - q) / jnp.linalg.norm(feats),
            cls_fp_max=out_fp["cls_preds"].max(),
            cls_q_max=out_q["cls_preds"].max(),
        )
    return model.apply(variables, method=lambda mdl: fn(mdl))


for k, v in probe(variables, batch).items():
    print(k, float(v))

# same frame through the RAW flagship checkpoint (no compressor)
base = PyramidCollabModel(mcfg)
bstate, _ = create_train_state(base, jax.random.PRNGKey(0), batch,
                               OptimCfg())
bstate, bep = ckpt.restore_checkpoint("runs/flagship_synth", bstate)
bvars = {"params": bstate.params, "batch_stats": bstate.batch_stats}
out = jax.jit(lambda v, b: base.apply(v, b, train=False))(bvars, batch)
print("flagship cls max", float(out["cls_preds"].max()))
