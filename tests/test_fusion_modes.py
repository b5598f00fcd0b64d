import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.data.voxelizer import VoxelCfg, voxelize
from quantv2x_tpu.models.collab_model import ModelCfg
from quantv2x_tpu.models.comm_mask import CommCfg, communication_mask
from quantv2x_tpu.models.single_model import (
    PyramidSingleModel,
    late_fuse_detections,
    merge_points_to_ego,
)

RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)
VOXEL = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 4.0),
                 max_points_per_voxel=8, max_voxels=1024)


@pytest.fixture(scope="module")
def frame():
    return make_frame(SyntheticCfg(lidar_range=RANGE, num_agents=2,
                                   num_objects=4, points_per_agent=3000,
                                   seed=2))


def test_single_model_forward(frame):
    model = PyramidSingleModel(ModelCfg(voxel=VOXEL, max_cav=1))
    vox = voxelize(jnp.asarray(frame["agent_points"][0]),
                   jnp.asarray(frame["agent_points_mask"][0]), VOXEL)
    variables = jax.jit(
        lambda v: model.init(jax.random.PRNGKey(0), v)
    )(vox)
    out = model.apply(variables, vox)
    H, W = 48, 48
    assert out["cls_preds"].shape == (1, H, W, 18)
    assert len(out["occ_maps"]) == 3


def test_early_fusion_merges_points(frame):
    merged = merge_points_to_ego(frame)
    assert merged["agent_points"].shape[0] == 1
    n_valid = sum(
        frame["agent_points_mask"][a].sum()
        for a in range(2) if frame["agent_mask"][a]
    )
    assert merged["agent_points_mask"].sum() == n_valid
    # ego points unchanged (identity transform for pose 0 at origin... only
    # if ego pose is zero; verify ego block matches original ego points)
    ego_valid = frame["agent_points_mask"][0]
    k = int(ego_valid.sum())
    from quantv2x_tpu.utils.transformation import np_pose_to_world
    if np.allclose(frame["agent_poses"][0], 0):
        np.testing.assert_allclose(
            merged["agent_points"][0][:k, :3],
            frame["agent_points"][0][ego_valid][:, :3], atol=1e-4)


def test_late_fusion_dedups_cross_agent():
    from quantv2x_tpu.utils import box_utils as bu

    box = jnp.array([[5.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3]])
    corners = bu.boxes_to_corners_3d(box, "lwh")
    pad = jnp.zeros((3, 8, 3))
    mk = lambda c, s, valid: {
        "corners": jnp.concatenate([c, pad]),
        "scores": jnp.array([s, 0, 0, 0.0]),
        "labels": jnp.array([1, 0, 0, 0]),
        "valid": jnp.array([valid, False, False, False]),
    }
    eye = jnp.eye(4)
    out = late_fuse_detections(
        [mk(corners, 0.9, True), mk(corners + 0.02, 0.7, True)], [eye, eye]
    )
    assert int(np.asarray(out["valid"]).sum()) == 1
    assert float(out["scores"][0]) == pytest.approx(0.9)


def test_communication_mask_rate():
    B, L, H, W, A = 1, 2, 16, 16, 2
    logits = jnp.full((B, L, H, W, A), -9.0)
    # one hot region on the collaborator
    logits = logits.at[0, 1, 4:6, 4:6, :].set(9.0)
    mask, rate = communication_mask(
        logits, jnp.ones((B, L), bool), CommCfg(threshold=0.1)
    )
    assert mask.shape == (B, L, H, W, 1)
    # ego transmits everything
    assert float(mask[0, 0].mean()) == 1.0
    # collaborator transmits only around the hot region (gaussian spread)
    frac = float(mask[0, 1].mean())
    assert 0.0 < frac < 0.3
    assert 0.5 < float(rate) < 0.7  # ego full + sparse collaborator
