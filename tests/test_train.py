import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.data import anchors as anc
from quantv2x_tpu.data.pipeline import frame_to_batch
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.data.voxelizer import VoxelCfg
from quantv2x_tpu.loss.detection_loss import LossCfg
from quantv2x_tpu.models.collab_model import ModelCfg, PyramidCollabModel
from quantv2x_tpu.train.trainer import (
    OptimCfg,
    create_train_state,
    make_train_step,
)

RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)
VOXEL = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 4.0),
                 max_points_per_voxel=8, max_voxels=1024)
MODEL = ModelCfg(voxel=VOXEL, max_cav=2)
ANCHOR = anc.AnchorGridCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 4.0),
                           feature_stride=2, classes=anc.V2XREAL_CLASSES)


@pytest.fixture(scope="module")
def setup():
    frame = make_frame(SyntheticCfg(lidar_range=RANGE, num_agents=2,
                                    num_objects=5, points_per_agent=4000,
                                    seed=7))
    batch = frame_to_batch(frame, VOXEL, max_cav=2)
    model = PyramidCollabModel(MODEL)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), batch,
        OptimCfg(steps_per_epoch=10),
    )
    anchor_pack = anc.generate_anchors(ANCHOR)
    step = jax.jit(make_train_step(model, tx, anchor_pack, LossCfg()))
    return batch, state, step


def test_loss_decreases_and_updates(setup):
    batch, state, step = setup
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert int(state.step) == 5
    # overfitting a single batch must reduce loss
    assert losses[-1] < losses[0]
    assert float(metrics["num_pos"]) > 0


def test_batch_stats_updated(setup):
    batch, state, step = setup
    before = jax.tree.leaves(state.batch_stats)[0]
    state2, _ = step(state, batch)
    after = jax.tree.leaves(state2.batch_stats)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_uncertainty_head_trains(setup):
    """With uncertainty_dim set, the train step adds the KL loss and the
    unc_head receives updates."""
    import dataclasses

    from quantv2x_tpu.loss.detection_loss import LossCfg
    from quantv2x_tpu.models.collab_model import PyramidCollabModel

    batch, _, _ = setup
    model = PyramidCollabModel(dataclasses.replace(MODEL, uncertainty_dim=3))
    state, tx = create_train_state(
        model, jax.random.PRNGKey(1), batch, OptimCfg(steps_per_epoch=10))
    step = jax.jit(make_train_step(model, tx, anc.generate_anchors(ANCHOR),
                                   LossCfg()))
    before = state.params["heads"]["unc_head"]["kernel"]
    state2, metrics = step(state, batch)
    assert "unc_loss" in metrics
    assert np.isfinite(float(metrics["unc_loss"]))
    after = state2.params["heads"]["unc_head"]["kernel"]
    assert float(jnp.abs(after - before).sum()) > 0


def test_trainable_predicate_freezes_params(setup):
    """HEAL stage-2 parity: a regex scope mask freezes everything else."""
    import re

    batch, _, _ = setup
    model = PyramidCollabModel(MODEL)
    pat = re.compile("cls_head|reg_head|dir_head")
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), batch, OptimCfg(steps_per_epoch=10),
        trainable_predicate=lambda p: bool(pat.search(p)),
    )
    anchor_pack = anc.generate_anchors(ANCHOR)
    step = jax.jit(make_train_step(model, tx, anchor_pack, LossCfg()))
    new_state, _ = step(state, batch)

    def flat(p):
        return {
            "/".join(str(getattr(k, "key", k)) for k in kp): v
            for kp, v in jax.tree_util.tree_flatten_with_path(p)[0]
        }
    before, after = flat(state.params), flat(new_state.params)
    frozen_same = [np.allclose(np.asarray(before[k], np.float32),
                               np.asarray(after[k], np.float32))
                   for k in before if not pat.search(k)]
    head_moved = [not np.allclose(np.asarray(before[k], np.float32),
                                  np.asarray(after[k], np.float32))
                  for k in before if pat.search(k)]
    assert all(frozen_same)
    assert any(head_moved)
