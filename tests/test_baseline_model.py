import jax
import numpy as np
import pytest

from quantv2x_tpu.data.pipeline import frame_to_batch
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.data.voxelizer import VoxelCfg
from quantv2x_tpu.models.baseline_model import BaselineFusionModel
from quantv2x_tpu.models.collab_model import ModelCfg

RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)
VOXEL = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 4.0),
                 max_points_per_voxel=8, max_voxels=1024)
MODEL = ModelCfg(voxel=VOXEL, max_cav=2)


@pytest.fixture(scope="module")
def batch():
    frame = make_frame(SyntheticCfg(lidar_range=RANGE, num_agents=2,
                                    num_objects=4, points_per_agent=3000,
                                    seed=9))
    return frame_to_batch(frame, VOXEL, max_cav=2)


@pytest.mark.parametrize("fusion", ["max", "att", "disconet", "where2comm"])
def test_baseline_fusions_forward(batch, fusion):
    model = BaselineFusionModel(MODEL, fusion_method=fusion)
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(batch)
    out = model.apply(variables, batch, train=False)
    assert out["cls_preds"].shape == (1, 48, 48, 18)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()
