"""CLIP cross-modality alignment path (heter_pyramid_single_clip parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from quantv2x_tpu.data.pipeline import frame_to_batch
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.data.voxelizer import VoxelCfg
from quantv2x_tpu.loss.aux_losses import clip_loss
from quantv2x_tpu.models.collab_model import ModelCfg
from quantv2x_tpu.models.heter_model import HeterCollabModel, ModalityCfg

RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)


def test_clip_embeddings_and_loss():
    vcfg = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 4.0),
                    max_points_per_voxel=8, max_voxels=1024)
    mcfg = ModelCfg(voxel=vcfg, max_cav=2)
    model = HeterCollabModel(
        mcfg,
        modalities=(ModalityCfg("m1", "point_pillar"),
                    ModalityCfg("m2", "point_pillar")),
    )
    frame = make_frame(SyntheticCfg(lidar_range=RANGE, num_agents=2,
                                    num_objects=4, points_per_agent=2000,
                                    seed=0))
    batch = frame_to_batch(frame, vcfg, max_cav=2)
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b,
                             with_clip_embeddings=True))(batch)
    out = model.apply(variables, batch, with_clip_embeddings=True)
    emb = out["clip_embeddings"]
    assert set(emb) == {"m1", "m2"}
    assert emb["m1"].shape == emb["m2"].shape and emb["m1"].ndim == 2
    loss = clip_loss(emb["m1"], emb["m2"], jnp.float32(2.0))
    assert np.isfinite(float(loss))
    # plain call unchanged
    out2 = model.apply(variables, batch)
    assert "clip_embeddings" not in out2
