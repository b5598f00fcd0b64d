"""Tests for the CIA-SSD model, SSFA neck and IoU-aware loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.data.anchors import (
    AnchorClassCfg,
    AnchorGridCfg,
    assign_targets,
    generate_anchors,
)
from quantv2x_tpu.data.voxelizer import VoxelCfg, voxelize
from quantv2x_tpu.models.ciassd import (
    CIASSD,
    CiassdCfg,
    SSFA,
    ciassd_iou_loss,
    rectify_scores,
)
from quantv2x_tpu.models.second_encoder import SecondCfg

RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)


class TestSSFA:
    def test_shapes_and_attention_blend(self):
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 16, 16, 64)),
            dtype=jnp.float32)
        model = SSFA()
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        y = model.apply(variables, x, train=False)
        assert y.shape == (1, 16, 16, 128)
        assert np.isfinite(np.asarray(y)).all()


class TestCIASSD:
    def test_end_to_end_shapes(self):
        vcfg = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 0.5),
                        max_points_per_voxel=5, max_voxels=1024)
        scfg = SecondCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 0.5))
        cfg = CiassdCfg(second=scfg, anchor_num=2, num_class=1)
        rng = np.random.default_rng(1)
        pts = jnp.asarray(np.concatenate(
            [rng.uniform(-19, 19, (1500, 2)),
             rng.uniform(-2.9, 0.9, (1500, 1)),
             rng.uniform(0, 1, (1500, 1))], axis=1).astype(np.float32))
        vox = voxelize(pts, jnp.ones(1500, bool), vcfg)
        model = CIASSD(cfg)
        variables = jax.jit(
            lambda v: model.init(jax.random.PRNGKey(0), v))(vox)
        out = model.apply(variables, vox)
        h, w = 48, 48
        assert out["cls_preds"].shape == (1, h, w, 2)
        assert out["reg_preds"].shape == (1, h, w, 14)
        assert out["iou_preds"].shape == (1, h, w, 2)
        assert out["dir_preds"].shape == (1, h, w, 4)


class TestIoULoss:
    @pytest.fixture(scope="class")
    def anchors_and_labels(self):
        grid = AnchorGridCfg(
            lidar_range=RANGE, voxel_size=(0.4, 0.4, 4.0), feature_stride=2,
            classes=(AnchorClassCfg(
                name="vehicle", size_lwh=(3.9, 1.6, 1.56),
                rotations=(0.0, 1.5708), bottom_height=-1.0,
                matched_threshold=0.5, unmatched_threshold=0.3),))
        anchors, slot_cls, m_thr, u_thr = generate_anchors(grid)
        gt = jnp.array([[2.0, 3.0, -0.8, 1.56, 1.6, 3.9, 0.1]])  # hwl
        labels = assign_targets(gt, jnp.array([1]), jnp.ones(1, bool),
                                anchors, slot_cls, m_thr, u_thr)
        return anchors, labels

    def test_perfect_prediction_high_iou_target(self, anchors_and_labels):
        anchors, labels = anchors_and_labels
        H, W, S, _ = anchors.shape
        label_dict = {"labels": labels["labels"][None],
                      "targets": labels["targets"][None]}
        # reg_preds == targets -> IoU == 1 -> iou target == +1
        outputs = {
            "reg_preds": labels["targets"].reshape(1, H, W, S * 7),
            "iou_preds": jnp.ones((1, H, W, S)),
        }
        loss_perfect = ciassd_iou_loss(outputs, label_dict, anchors,
                                       max_pos=16)
        outputs_bad = dict(outputs, iou_preds=-jnp.ones((1, H, W, S)))
        loss_bad = ciassd_iou_loss(outputs_bad, label_dict, anchors,
                                   max_pos=16)
        assert float(loss_perfect) < 1e-5
        assert float(loss_bad) > float(loss_perfect)

    def test_jittable(self, anchors_and_labels):
        anchors, labels = anchors_and_labels
        H, W, S, _ = anchors.shape
        label_dict = {"labels": labels["labels"][None],
                      "targets": labels["targets"][None]}
        outputs = {
            "reg_preds": jnp.zeros((1, H, W, S * 7)),
            "iou_preds": jnp.zeros((1, H, W, S)),
        }
        f = jax.jit(lambda o: ciassd_iou_loss(o, label_dict, anchors,
                                              max_pos=8))
        v = f(outputs)
        assert np.isfinite(float(v))


class TestRectification:
    def test_monotone_in_iou(self):
        cls = jnp.array([0.8, 0.8])
        iou = jnp.array([0.9, -0.5])  # head emits 2*iou-1
        s = np.asarray(rectify_scores(cls, iou, beta=0.5))
        assert s[0] > s[1]

    def test_beta_zero_is_cls(self):
        cls = jnp.array([0.7])
        iou = jnp.array([0.2])
        s = rectify_scores(cls, iou, beta=0.0)
        assert float(s[0]) == pytest.approx(0.7, rel=1e-6)
