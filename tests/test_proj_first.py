"""proj_first (warp-once-before-pyramid) vs per-level warp fusion.

Reference parity: fuse_modules/pyramid_fuse_onnx.py:64-67 (proj_first
features arrive pre-warped; fusion is warp-free), selected by
fusion_backbone.proj_first at heter_pyramid_collab_mc.py:101.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.data.pipeline import frame_to_batch
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.data.voxelizer import VoxelCfg
from quantv2x_tpu.models.collab_model import ModelCfg, PyramidCollabModel
from quantv2x_tpu.models.pyramid_fusion import project_to_ego

LIDAR_RANGE = (-25.6, -12.8, -3.0, 25.6, 12.8, 1.0)


@pytest.fixture(scope="module")
def batch_and_cfg():
    vox = VoxelCfg(lidar_range=LIDAR_RANGE, voxel_size=(0.4, 0.4, 4.0),
                   max_points_per_voxel=8, max_voxels=1500)
    frame = make_frame(SyntheticCfg(lidar_range=LIDAR_RANGE, num_agents=2,
                                    num_objects=4, points_per_agent=2000,
                                    seed=3))
    batch = frame_to_batch(frame, vox, max_cav=2)
    cfg = ModelCfg(voxel=vox, max_cav=2, pyramid_layers=(1, 1, 1))
    return batch, cfg


def test_project_to_ego_identity_and_mask():
    B, L, h, w, C = 1, 3, 16, 24, 4
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(B, L, h, w, C)),
                        jnp.float32)
    ident = jnp.broadcast_to(
        jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (B, L, 2, 3))
    out, fov = project_to_ego(feats, ident)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feats), atol=1e-5)
    assert bool(fov.all())

    # a large translation pushes a collaborator fully out of view
    shifted = ident.at[:, 1, 0, 2].set(10.0)
    out2, fov2 = project_to_ego(feats, shifted)
    assert not bool(fov2[0, 1].any())
    assert bool(fov2[0, 0].all())  # ego row never warped
    np.testing.assert_allclose(np.asarray(out2[0, 0]), np.asarray(feats[0, 0]),
                               atol=1e-5)


def test_proj_first_matches_default_under_identity(batch_and_cfg):
    batch, cfg = batch_and_cfg
    # identity pairwise transforms: both paths are exact no-warp fusions
    batch = dict(batch)
    batch["pairwise_t_matrix"] = jnp.broadcast_to(
        jnp.eye(4), batch["pairwise_t_matrix"].shape)

    outs = {}
    for pf in (False, True):
        model = PyramidCollabModel(dataclasses.replace(cfg, proj_first=pf))
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        outs[pf] = model.apply(variables, batch, train=False)

    for key in ("cls_preds", "reg_preds", "dir_preds"):
        np.testing.assert_allclose(np.asarray(outs[True][key]),
                                   np.asarray(outs[False][key]),
                                   atol=1e-4)


def test_proj_first_runs_with_real_transforms(batch_and_cfg):
    batch, cfg = batch_and_cfg
    model = PyramidCollabModel(dataclasses.replace(cfg, proj_first=True))
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = jax.jit(lambda v, b: model.apply(v, b, train=False))(variables, batch)
    assert np.isfinite(np.asarray(out["cls_preds"], np.float32)).all()

    # proj_first introduces no parameters: trees must match exactly
    base = PyramidCollabModel(cfg).init(jax.random.PRNGKey(0), batch,
                                        train=False)
    flat_a = jax.tree_util.tree_structure(base)
    flat_b = jax.tree_util.tree_structure(variables)
    assert flat_a == flat_b
