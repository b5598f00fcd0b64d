"""Detection AP evaluation (VOC-2010 AP over BEV polygon IoU).

Exact parity with the reference's evaluator
(/root/reference/opencood/utils/eval_utils_mc.py:15-159):
  - per frame: detections sorted by score desc, greedily matched to GT by
    max BEV polygon IoU, matched GT removed;
  - TP/FP lists are accumulated in FRAME order (the reference does not
    re-sort globally by score before building the PR curve — we reproduce
    that so AP numbers are comparable);
  - VOC-2010 interpolation (monotone precision envelope).

Multi-class: stats keyed per class; AP at IoU 0.3/0.5/0.7 + mAP.
"""

import numpy as np

from quantv2x_tpu.utils import box_utils as bu

DEFAULT_IOUS = (0.3, 0.5, 0.7)
# range-stratified bands (metres): parity tools/inference.py:190-216
RANGE_BANDS = {"0-30m": (0.0, 30.0), "30-50m": (30.0, 50.0),
               "50-100m": (50.0, 100.0)}


def new_result_stat(num_classes: int = 3, ious=DEFAULT_IOUS):
    return {
        c: {t: {"tp": [], "fp": [], "gt": 0} for t in ious}
        for c in range(1, num_classes + 1)
    }


def new_range_stats(num_classes: int = 3, ious=DEFAULT_IOUS):
    """Per-distance-band stat dicts for range-stratified AP."""
    return {name: new_result_stat(num_classes, ious) for name in RANGE_BANDS}


def mask_gt_range(gt_corners, gt_valid, gt_range):
    """AND the GT validity mask with a center-in-range check.

    Parity: the reference masks ground truth to the evaluation range before
    it ever reaches the AP accumulator
    (opencood/data_utils/post_processor/base_postprocessor_multi_class.py:
    97-143, GT_RANGE at :129-139 via mask_boxes_outside_range_numpy). On
    real data GT is the union of ALL cavs' objects — far beyond ego range —
    so skipping this systematically depresses every AP number. The range
    rule is box_utils.mask_boxes_range — the same test the det side uses,
    so GT and det masking can never drift apart."""
    from quantv2x_tpu.utils import box_utils as bu
    inside = np.asarray(bu.mask_boxes_range(np.asarray(gt_corners),
                                            gt_range))
    return np.asarray(gt_valid, bool) & inside


def accumulate_frame_by_range(range_stats, det_corners, det_scores,
                              det_labels, det_valid, gt_corners, gt_labels,
                              gt_valid, ious=DEFAULT_IOUS):
    """Split dets/GT by distance-to-ego band and accumulate each band."""
    det_c = np.asarray(det_corners)
    gt_c = np.asarray(gt_corners)
    det_d = np.linalg.norm(det_c.mean(axis=1)[:, :2], axis=-1)
    gt_d = np.linalg.norm(gt_c.mean(axis=1)[:, :2], axis=-1)
    for name, (lo, hi) in RANGE_BANDS.items():
        dm = np.asarray(det_valid, bool) & (det_d >= lo) & (det_d < hi)
        gm = np.asarray(gt_valid, bool) & (gt_d >= lo) & (gt_d < hi)
        accumulate_frame(range_stats[name], det_c, det_scores, det_labels,
                         dm, gt_c, gt_labels, gm, ious)


import functools

import jax
import jax.numpy as jnp


def _round_up8(n: int) -> int:
    return ((n + 7) // 8) * 8


@functools.partial(jax.jit)
def _polygon_iou_aligned(det_corners, gt_corners):
    return bu.iou_matrix_polygon(det_corners, gt_corners)


def _padded_polygon_iou(det_corners, gt_corners):
    """Fixed-shape det x gt polygon IoU — compiles once per padded shape.

    Inputs are padded to multiples of 8 boxes: the tunneled TPU backend's
    codegen kernel-faults on this program at unaligned leading dims
    (empirically: 150 crashes the worker, 64/128/160 run fine)."""
    det_corners = jnp.asarray(det_corners)
    gt_corners = jnp.asarray(gt_corners)
    n, m = det_corners.shape[0], gt_corners.shape[0]
    np8, mp8 = _round_up8(n), _round_up8(m)
    d = jnp.zeros((np8, 8, 3), det_corners.dtype).at[:n].set(det_corners)
    g = jnp.zeros((mp8, 8, 3), gt_corners.dtype).at[:m].set(gt_corners)
    return _polygon_iou_aligned(d, g)[:n, :m]


def accumulate_frame(result_stat, det_corners, det_scores, det_labels,
                     det_valid, gt_corners, gt_labels, gt_valid,
                     ious=DEFAULT_IOUS):
    """Update stats with one frame (padded numpy/jnp arrays accepted)."""
    det_valid = np.asarray(det_valid).astype(bool)
    gt_valid = np.asarray(gt_valid).astype(bool)
    # one fixed-shape device call for the whole frame, matching on host after
    full_iou = (
        np.asarray(_padded_polygon_iou(det_corners, gt_corners))
        if det_valid.any() and gt_valid.any() else
        np.zeros((len(np.asarray(det_corners)), len(np.asarray(gt_corners))))
    )
    det_corners = np.asarray(det_corners)
    det_scores = np.asarray(det_scores)
    det_labels = np.asarray(det_labels)
    gt_corners = np.asarray(gt_corners)
    gt_labels = np.asarray(gt_labels)

    for cls in result_stat.keys():
        dsel = det_valid & (det_labels == cls)
        gsel = gt_valid & (gt_labels == cls)
        ds = det_scores[dsel]
        order = np.argsort(-ds)
        n_det, n_gt = int(dsel.sum()), int(gsel.sum())
        for t in ious:
            result_stat[cls][t]["gt"] += int(n_gt)
        if n_det == 0:
            continue
        if n_gt == 0:
            for t in ious:
                result_stat[cls][t]["fp"] += [1] * n_det
                result_stat[cls][t]["tp"] += [0] * n_det
            continue
        iou_mat = full_iou[np.ix_(dsel, gsel)][order]
        for t in ious:
            alive = np.ones(n_gt, bool)
            for i in range(n_det):
                ious_i = np.where(alive, iou_mat[i], -1.0)
                j = int(np.argmax(ious_i))
                if ious_i[j] >= t:
                    result_stat[cls][t]["tp"].append(1)
                    result_stat[cls][t]["fp"].append(0)
                    alive[j] = False
                else:
                    result_stat[cls][t]["tp"].append(0)
                    result_stat[cls][t]["fp"].append(1)


def voc_ap(rec, prec):
    """VOC-2010 AP (parity: eval_utils_mc.voc_ap:15-38)."""
    mrec = np.concatenate([[0.0], rec, [1.0]])
    mpre = np.concatenate([[0.0], prec, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0] + 1
    return float(np.sum((mrec[idx] - mrec[idx - 1]) * mpre[idx]))


def calculate_ap(stat):
    tp = np.cumsum(stat["tp"]).astype(np.float64)
    fp = np.cumsum(stat["fp"]).astype(np.float64)
    gt = max(stat["gt"], 1)
    if len(tp) == 0:
        return 0.0
    rec = tp / gt
    prec = tp / np.maximum(tp + fp, 1e-12)
    return voc_ap(rec, prec)


def summarize(result_stat, ious=DEFAULT_IOUS):
    """-> {class: {iou: ap}}, plus 'mAP' row."""
    out = {}
    for cls, stats in result_stat.items():
        out[cls] = {t: calculate_ap(stats[t]) for t in ious}
    out["mAP"] = {
        t: float(np.mean([out[c][t] for c in result_stat.keys()])) for t in ious
    }
    return out
