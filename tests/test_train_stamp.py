"""STAMP adapter training pipeline tests (parity: tools/train_stamp.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from quantv2x_tpu.data import anchors as anc
from quantv2x_tpu.data.pipeline import frame_to_batch
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.data.voxelizer import VoxelCfg
from quantv2x_tpu.loss.adapter_loss import AdapterLossCfg, adapter_loss
from quantv2x_tpu.models.collab_model import ModelCfg, PyramidCollabModel
from quantv2x_tpu.models.stamp import StampCollabModel
from quantv2x_tpu.train.trainer import OptimCfg, create_train_state

RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)
VOXEL = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 4.0),
                 max_points_per_voxel=8, max_voxels=512)
MODEL = ModelCfg(voxel=VOXEL, max_cav=2)


def test_adapter_loss_weights_and_terms():
    k = jax.random.PRNGKey(0)
    fm, fp = jax.random.normal(k, (2, 4, 4, 8)), jnp.zeros((2, 4, 4, 8))
    total, m = adapter_loss(fm, fm, fm, fp, fp, AdapterLossCfg(2.0, 3.0, 5.0))
    # identical pairs -> all three terms zero
    assert float(total) == 0.0
    total2, m2 = adapter_loss(fm, fp, fm, fp, fm,
                              AdapterLossCfg(2.0, 0.0, 0.0))
    assert np.isclose(float(total2), 2.0 * float(m2["p2m"]))


@pytest.fixture(scope="module")
def stamp_setup():
    frame = make_frame(SyntheticCfg(lidar_range=RANGE, num_agents=2,
                                    num_objects=4, points_per_agent=3000,
                                    seed=3))
    batch = frame_to_batch(frame, VOXEL, max_cav=2)
    ego = PyramidCollabModel(MODEL, name="ego_model")
    proto = PyramidCollabModel(MODEL, name="protocol_model")
    model = StampCollabModel(ego_model=ego, protocol_model=proto,
                             protocol_channels=64, local_channels=64)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), batch, OptimCfg(steps_per_epoch=4),
        trainable_predicate=lambda p: p.startswith("bridge"),
    )
    return model, state, tx, batch


def test_stamp_outputs_and_feats(stamp_setup):
    model, state, _, batch = stamp_setup
    out, feats = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch, train=False)
    fm, fp2m, fm2p2m, fp, fm2p = feats
    assert fm.shape == fp2m.shape == fm2p2m.shape   # local space
    assert fp.shape == fm2p.shape                   # protocol space
    assert out["cls_preds"].shape[0] == 1
    assert np.isfinite(np.asarray(out["cls_preds"])).all()


def test_stamp_only_bridge_trains(stamp_setup):
    model, state, tx, batch = stamp_setup

    def loss_fn(p):
        _, feats = model.apply(
            {"params": p, "batch_stats": state.batch_stats}, batch,
            train=True)
        total, _ = adapter_loss(*feats)
        return total

    grads = jax.jit(jax.grad(loss_fn))(state.params)
    updates, _ = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    # frozen scopes identical, bridge moved
    for scope in ("ego_model", "protocol_model"):
        for a, b in zip(jax.tree.leaves(state.params[scope]),
                        jax.tree.leaves(new_params[scope])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params["bridge"]),
                        jax.tree.leaves(new_params["bridge"]))
    ]
    assert any(moved)
