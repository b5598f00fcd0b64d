import numpy as np
import jax.numpy as jnp

from quantv2x_tpu.utils import box_utils as bu
from quantv2x_tpu.utils.eval_ap import (
    accumulate_frame,
    new_result_stat,
    summarize,
)


def _corners(boxes):
    return np.asarray(bu.boxes_to_corners_3d(jnp.asarray(boxes), "lwh"))


def test_perfect_detection_ap1():
    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.2], [10, 5, 0, 4, 2, 1.5, -0.3]],
                  np.float32)
    stat = new_result_stat(num_classes=1)
    accumulate_frame(
        stat, _corners(gt), np.array([0.9, 0.8]), np.array([1, 1]),
        np.ones(2, bool), _corners(gt), np.array([1, 1]), np.ones(2, bool),
    )
    res = summarize(stat)
    for t in (0.3, 0.5, 0.7):
        assert res[1][t] == 1.0


def test_false_positive_halves_precision():
    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
    det = np.array([[0, 0, 0, 4, 2, 1.5, 0.0], [50, 0, 0, 4, 2, 1.5, 0.0]],
                   np.float32)
    stat = new_result_stat(num_classes=1)
    accumulate_frame(
        stat, _corners(det), np.array([0.9, 0.8]), np.array([1, 1]),
        np.ones(2, bool), _corners(gt), np.array([1]), np.ones(1, bool),
    )
    res = summarize(stat)
    # TP at rank 1, FP at rank 2: AP = 1.0 (recall saturates before the FP)
    assert res[1][0.5] == 1.0


def test_missed_gt_lowers_ap():
    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.0], [50, 0, 0, 4, 2, 1.5, 0.0]],
                  np.float32)
    det = gt[:1]
    stat = new_result_stat(num_classes=1)
    accumulate_frame(
        stat, _corners(det), np.array([0.9]), np.array([1]),
        np.ones(1, bool), _corners(gt), np.array([1, 1]), np.ones(2, bool),
    )
    res = summarize(stat)
    assert res[1][0.5] == 0.5


def test_classwise_separation():
    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
    # detection has right box, wrong class -> FP for cls2, miss for cls1
    stat = new_result_stat(num_classes=2)
    accumulate_frame(
        stat, _corners(gt), np.array([0.9]), np.array([2]),
        np.ones(1, bool), _corners(gt), np.array([1]), np.ones(1, bool),
    )
    res = summarize(stat)
    assert res[1][0.5] == 0.0
    assert res[2][0.5] == 0.0


def test_duplicate_detection_is_fp():
    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
    det = np.array([[0, 0, 0, 4, 2, 1.5, 0.0],
                    [0.1, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
    stat = new_result_stat(num_classes=1)
    accumulate_frame(
        stat, _corners(det), np.array([0.9, 0.85]), np.array([1, 1]),
        np.ones(2, bool), _corners(gt), np.array([1]), np.ones(1, bool),
    )
    s = stat[1][0.5]
    assert s["tp"] == [1, 0] and s["fp"] == [0, 1]


def test_gt_range_mask_drops_out_of_range_gt():
    """Out-of-range GT must not count as a miss (parity:
    base_postprocessor_multi_class.py:97-143 GT_RANGE masking)."""
    from quantv2x_tpu.utils.eval_ap import mask_gt_range

    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.0],
                   [500, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
    det = gt[:1]
    gt_range = (-140.8, -40.0, -3.0, 140.8, 40.0, 1.0)
    gt_mask = mask_gt_range(_corners(gt), np.ones(2, bool), gt_range)
    assert gt_mask.tolist() == [True, False]

    stat = new_result_stat(num_classes=1)
    accumulate_frame(
        stat, _corners(det), np.array([0.9]), np.array([1]),
        np.ones(1, bool), _corners(gt), np.array([1, 1]), gt_mask,
    )
    res = summarize(stat)
    # without the range mask the far GT would be a miss -> AP 0.5
    assert res[1][0.5] == 1.0


def test_gt_range_mask_respects_existing_invalid():
    from quantv2x_tpu.utils.eval_ap import mask_gt_range

    gt = np.array([[0, 0, 0, 4, 2, 1.5, 0.0],
                   [5, 0, 0, 4, 2, 1.5, 0.0]], np.float32)
    gt_range = (-140.8, -40.0, -3.0, 140.8, 40.0, 1.0)
    m = mask_gt_range(_corners(gt), np.array([True, False]), gt_range)
    assert m.tolist() == [True, False]
