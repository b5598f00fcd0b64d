import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.data import anchors as anc
from quantv2x_tpu.data.postprocess import PostprocessCfg, decode_detections

SMALL_CFG = anc.AnchorGridCfg(
    lidar_range=(-32.0, -16.0, -3.0, 32.0, 16.0, 1.0),
    voxel_size=(0.4, 0.4, 4.0),
    feature_stride=2,
    classes=anc.V2XREAL_CLASSES,
)


@pytest.fixture(scope="module")
def anchor_pack():
    return anc.generate_anchors(SMALL_CFG)


def _gt(boxes_cls):
    """list of (box7_hwl, cls) -> padded arrays (M=10)."""
    M = 10
    boxes = np.zeros((M, 7), np.float32)
    classes = np.zeros((M,), np.int32)
    mask = np.zeros((M,), bool)
    for i, (b, c) in enumerate(boxes_cls):
        boxes[i] = b
        classes[i] = c
        mask[i] = True
    return jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(mask)


class TestAnchorGen:
    def test_shapes_and_layout(self, anchor_pack):
        anchors, slot_cls, m_thr, u_thr = anchor_pack
        Wf, Hf = SMALL_CFG.feature_size
        S = SMALL_CFG.num_anchors_per_loc
        assert anchors.shape == (Hf, Wf, S, 7)
        assert S == 6
        # class-major slots: [veh, veh, ped, ped, truck, truck]
        assert np.asarray(slot_cls).tolist() == [1, 1, 2, 2, 3, 3]
        np.testing.assert_allclose(np.asarray(m_thr), [0.6, 0.6, 0.5, 0.5, 0.6, 0.6])
        # rows index y, cols index x; align_center half-pixel offset
        a = np.asarray(anchors)
        stride_m = SMALL_CFG.voxel_size[0] * SMALL_CFG.feature_stride
        assert a[0, 0, 0, 0] == pytest.approx(SMALL_CFG.lidar_range[0] + stride_m / 2)
        assert a[0, 0, 0, 1] == pytest.approx(SMALL_CFG.lidar_range[1] + stride_m / 2)
        assert a[0, 1, 0, 0] - a[0, 0, 0, 0] == pytest.approx(stride_m, abs=1e-4)
        assert a[1, 0, 0, 1] - a[0, 0, 0, 1] == pytest.approx(stride_m, abs=1e-4)
        # hwl dims for the vehicle slot, rotation of second slot
        assert a[0, 0, 0, 3:6].tolist() == pytest.approx([1.56, 1.6, 3.9])
        assert a[0, 0, 1, 6] == pytest.approx(1.57)

    def test_assign_pos_location_and_class(self, anchor_pack):
        anchors, slot_cls, m_thr, u_thr = anchor_pack
        car = np.array([4.0, 2.0, -1.78, 1.56, 1.6, 3.9, 0.0], np.float32)
        gt_boxes, gt_cls, gt_mask = _gt([(car, 1)])
        out = anc.assign_targets(gt_boxes, gt_cls, gt_mask, anchors,
                                 slot_cls, m_thr, u_thr)
        labels = np.asarray(out["labels"])
        pos = np.asarray(out["pos_mask"])
        assert pos.sum() >= 1
        ys, xs, ss = np.where(pos)
        # all positives are vehicle slots with yaw 0 (aligned anchor)
        assert set(ss.tolist()) <= {0}
        # positive anchors sit near the GT center
        a = np.asarray(anchors)
        centers = a[ys, xs, ss, :2]
        assert np.all(np.abs(centers - car[:2]) < 4.0)
        assert set(labels[pos].tolist()) == {1}
        # no positives for other classes anywhere
        assert not np.any(labels[..., 2:] > 0)

    def test_force_match_low_iou_gt(self, anchor_pack):
        anchors, slot_cls, m_thr, u_thr = anchor_pack
        # pedestrian: small box -> standup IoU vs 0.8x0.6 anchors can still
        # clear via force-match even if below 0.5 threshold
        ped = np.array([1.3, 3.1, -0.6, 1.73, 0.6, 0.8, 0.0], np.float32)
        gt_boxes, gt_cls, gt_mask = _gt([(ped, 2)])
        out = anc.assign_targets(gt_boxes, gt_cls, gt_mask, anchors,
                                 slot_cls, m_thr, u_thr)
        labels = np.asarray(out["labels"])
        assert (labels == 2).sum() >= 1

    def test_roundtrip_decode(self, anchor_pack):
        anchors, slot_cls, m_thr, u_thr = anchor_pack
        car = np.array([-6.2, 5.7, -1.5, 1.7, 1.8, 4.2, 0.25], np.float32)
        truck = np.array([10.0, -8.0, -1.6, 3.1, 2.9, 8.2, -0.4], np.float32)
        gt_boxes, gt_cls, gt_mask = _gt([(car, 1), (truck, 3)])
        out = anc.assign_targets(gt_boxes, gt_cls, gt_mask, anchors,
                                 slot_cls, m_thr, u_thr)
        decoded = np.asarray(anc.decode_deltas(out["targets"], anchors))
        pos = np.asarray(out["pos_mask"])
        labels = np.asarray(out["labels"])
        for gt_box, cls in [(car, 1), (truck, 3)]:
            sel = pos & (labels == cls)
            assert sel.sum() >= 1
            rec = decoded[sel]
            np.testing.assert_allclose(rec, np.tile(gt_box, (sel.sum(), 1)),
                                       atol=1e-3)

    def test_padding_gt_ignored(self, anchor_pack):
        anchors, slot_cls, m_thr, u_thr = anchor_pack
        gt_boxes = jnp.zeros((10, 7))
        gt_cls = jnp.zeros((10,), jnp.int32)
        gt_mask = jnp.zeros((10,), bool)
        out = anc.assign_targets(gt_boxes, gt_cls, gt_mask, anchors,
                                 slot_cls, m_thr, u_thr)
        assert not bool(np.asarray(out["pos_mask"]).any())
        assert bool(np.asarray(out["neg_mask"]).all())


class TestDecodeDetections:
    def test_perfect_predictions_recover_gt(self, anchor_pack):
        anchors, slot_cls, m_thr, u_thr = anchor_pack
        Hf, Wf = anchors.shape[:2]
        S = anchors.shape[2]
        car = np.array([4.0, 2.0, -1.78, 1.56, 1.6, 3.9, 0.2], np.float32)
        truck = np.array([-10.0, -5.0, -1.6, 3.0, 3.0, 8.0, 1.0], np.float32)
        gt_boxes, gt_cls, gt_mask = _gt([(car, 1), (truck, 3)])
        out = anc.assign_targets(gt_boxes, gt_cls, gt_mask, anchors,
                                 slot_cls, m_thr, u_thr)
        labels = out["labels"]  # (H, W, S)
        # build ideal logits: +8 for the true class at positives, -8 elsewhere
        C = 3
        lbl = np.asarray(labels)
        cls_logits = np.full((Hf, Wf, S, C), -8.0, np.float32)
        for c in range(1, C + 1):
            cls_logits[..., c - 1][lbl == c] = 8.0
        reg = np.asarray(out["targets"]).reshape(Hf, Wf, S * 7)
        cfg = PostprocessCfg(gt_range=SMALL_CFG.lidar_range, pre_nms_top_k=64,
                             max_detections=16)
        det = decode_detections(
            jnp.asarray(cls_logits.reshape(Hf, Wf, S * C)), jnp.asarray(reg),
            anchors, cfg)
        valid = np.asarray(det["valid"])
        boxes = np.asarray(det["boxes"])[valid]
        det_labels = np.asarray(det["labels"])[valid]
        assert valid.sum() == 2
        # sort by x to match
        got = boxes[np.argsort(boxes[:, 0])]
        want = np.stack([truck, car])
        np.testing.assert_allclose(got, want, atol=1e-2)
        assert sorted(det_labels.tolist()) == [1, 3]

    def test_all_background(self, anchor_pack):
        anchors, *_ = anchor_pack
        Hf, Wf, S, _ = anchors.shape
        cfg = PostprocessCfg(gt_range=SMALL_CFG.lidar_range, pre_nms_top_k=64,
                             max_detections=16)
        det = decode_detections(
            jnp.full((Hf, Wf, S * 3), -9.0), jnp.zeros((Hf, Wf, S * 7)),
            anchors, cfg)
        assert not bool(np.asarray(det["valid"]).any())
