"""GenComm two-stage training pipeline tests (tools/train_gencomm.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from quantv2x_tpu.data import anchors as anc
from quantv2x_tpu.data.pipeline import frame_to_batch
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.data.voxelizer import VoxelCfg
from quantv2x_tpu.loss.detection_loss import LossCfg, detection_loss
from quantv2x_tpu.models.collab_model import ModelCfg, PyramidCollabModel
from quantv2x_tpu.models.gencomm import GenCommCfg, GenCommCollabModel
from quantv2x_tpu.train.trainer import (
    OptimCfg,
    assign_batch_targets,
    create_train_state,
)

RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)
VOXEL = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 4.0),
                 max_points_per_voxel=8, max_voxels=512)
MODEL = ModelCfg(voxel=VOXEL, max_cav=2)
ANCHOR = anc.AnchorGridCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 4.0),
                           feature_stride=2, classes=anc.V2XREAL_CLASSES)


@pytest.fixture(scope="module")
def setup():
    frame = make_frame(SyntheticCfg(lidar_range=RANGE, num_agents=2,
                                    num_objects=4, points_per_agent=3000,
                                    seed=11))
    batch = frame_to_batch(frame, VOXEL, max_cav=2)
    base = PyramidCollabModel(MODEL, name="base_model")
    gcfg = GenCommCfg(channels=MODEL.backbone_filters[-1],
                      message_channels=4)
    model = GenCommCollabModel(base_model=base, cfg=gcfg)
    return model, batch


def _make_step(model, batch, predicate):
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), batch,
        OptimCfg(steps_per_epoch=4), trainable_predicate=predicate,
        init_rngs={"diffusion": jax.random.PRNGKey(7)},
    )
    anchor_pack = anc.generate_anchors(ANCHOR)
    loss_cfg = LossCfg()

    def loss_fn(p, bs, batch, labels, rng):
        out, mut = model.apply({"params": p, "batch_stats": bs}, batch,
                               train=True, rngs={"diffusion": rng},
                               mutable=["batch_stats"])
        det, _ = detection_loss(out, labels, loss_cfg)
        feat = ((out["gt_feature"] - out["pred_feature"]) ** 2).mean()
        return det + feat + out["ddpm_loss"]

    @jax.jit
    def step(state, batch):
        labels = assign_batch_targets(batch, anchor_pack)
        grads = jax.grad(loss_fn)(state.params, state.batch_stats, batch,
                                  labels, jax.random.PRNGKey(3))
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return state.replace(params=optax.apply_updates(state.params,
                                                        updates),
                             opt_state=new_opt, step=state.step + 1)

    return state, step


def _delta(a, b):
    return float(sum(jnp.abs(x - y).sum()
                     for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))))


class TestGenCommStages:
    def test_stage1_trains_gencomm_freezes_base(self, setup):
        model, batch = setup
        state, step = _make_step(model, batch,
                                 lambda p: p.startswith("gencomm"))
        s2 = step(state, batch)
        assert _delta(s2.params["gencomm"], state.params["gencomm"]) > 0
        assert _delta(s2.params["base_model"],
                      state.params["base_model"]) == 0

    def test_stage2_trains_extractor_only(self, setup):
        model, batch = setup
        state, step = _make_step(
            model, batch, lambda p: p.startswith("gencomm/extractor"))
        s2 = step(state, batch)
        g = state.params["gencomm"]
        g2 = s2.params["gencomm"]
        assert _delta(g2["extractor"], g["extractor"]) > 0
        frozen = {k: v for k, v in g.items() if k != "extractor"}
        frozen2 = {k: v for k, v in g2.items() if k != "extractor"}
        assert _delta(frozen2, frozen) == 0
