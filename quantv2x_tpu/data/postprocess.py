"""Prediction decoding: head outputs -> final detections (jit-safe, padded).

Parity target: voxel_postprocessor_3heads.post_process:318-477 (multi-class)
and voxel_postprocessor.post_process:245-405 (single-class):
  sigmoid -> per-slot max-over-class score/label -> score threshold ->
  delta decode -> corner boxes -> sanity filters -> rotated NMS -> range mask.

TPU-first design: the dynamic masked_select/len()-checks of the reference
become a static top-K prefilter plus validity masks, so the whole pipeline
jits into one XLA program with fixed shapes.
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp

from quantv2x_tpu.data.anchors import decode_deltas
from quantv2x_tpu.utils import box_utils as bu
from quantv2x_tpu.utils.common import limit_period


@dataclasses.dataclass(frozen=True)
class PostprocessCfg:
    score_threshold: float = 0.2
    nms_threshold: float = 0.15
    pre_nms_top_k: int = 512
    max_detections: int = 150
    gt_range: tuple = (-140.8, -40.0, -3.0, 140.8, 40.0, 1.0)
    order: str = "hwl"
    num_classes: int = 3


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_detections(cls_preds, reg_preds, anchors, cfg: PostprocessCfg,
                      transform=None, dir_preds=None, dir_offset=0.7853,
                      num_dir_bins=2):
    """One frame's head outputs -> padded final detections.

    Args:
      cls_preds: (H, W, S*C) logits — S anchor slots x C class logits
                 (C=1 for single-class).
      reg_preds: (H, W, S*7).
      anchors: (H, W, S, 7) hwl.
      transform: optional (4, 4) projection into ego frame.
      dir_preds: optional (H, W, S*num_dir_bins) direction logits.

    Returns dict with corners (K, 8, 3), boxes (K, 7), scores (K,),
    labels (K,) 1-based, valid (K,) — K = cfg.pre_nms_top_k after NMS and
    filters (padded).
    """
    H, W, S, _ = anchors.shape
    C = cfg.num_classes

    # --- gather-first decode (TPU layout discipline) ---
    # The reference decodes every anchor then masks; a naive port reshapes
    # the (H, W, S*7) head outputs to (H*W*S, 7) — a pathological relayout
    # (7-lane rows use 5% of the VPU) that measured ~4 ms/frame in context.
    # Instead: per-slot scores via max-over-class (sigmoid is monotonic, so
    # max(sigmoid(x)) == sigmoid(max(x))), top-K on the flat score map,
    # then gather the K candidate rows and run ALL box math on (K, ...).
    logits_max = cls_preds.reshape(H, W, S, C).max(axis=-1)
    scores_map = jax.nn.sigmoid(logits_max)                 # (H, W, S)
    keep = scores_map > cfg.score_threshold

    # static top-K prefilter replaces dynamic masked_select. Exact top_k,
    # NOT approx_max_k: the approximate partial-reduction path measured
    # 2.7 ms/frame in context on this backend vs 0.2 ms for exact top_k
    # (scripts/drive_decode_ctx3.py ablation).
    K = cfg.pre_nms_top_k
    masked_scores = jnp.where(keep, scores_map, -1.0).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(masked_scores, K)
    top_valid = top_scores > 0
    hi = top_idx // (W * S)
    rem = top_idx % (W * S)
    wi = rem // S
    si = rem % S

    cls_rows = cls_preds[hi, wi]                            # (K, S*C)
    top_logits = jnp.take_along_axis(
        cls_rows, si[:, None] * C + jnp.arange(C)[None, :], axis=1)
    top_labels = top_logits.argmax(axis=-1).astype(jnp.int32) + 1

    reg_rows = reg_preds[hi, wi]                            # (K, S*7)
    deltas = jnp.take_along_axis(
        reg_rows, si[:, None] * 7 + jnp.arange(7)[None, :], axis=1)
    top_anchors = anchors[hi, wi, si]                       # (K, 7)
    top_boxes = decode_deltas(deltas.astype(jnp.float32), top_anchors)

    if dir_preds is not None:
        # direction classifier fixes the yaw bin (parity:
        # voxel_postprocessor.post_process:325-336)
        dir_rows = dir_preds[hi, wi]                        # (K, S*bins)
        dlogits = jnp.take_along_axis(
            dir_rows,
            si[:, None] * num_dir_bins + jnp.arange(num_dir_bins)[None, :],
            axis=1)
        dir_labels = jnp.argmax(dlogits, axis=-1).astype(top_boxes.dtype)
        period = 2 * jnp.pi / num_dir_bins
        yaw = top_boxes[:, 6]
        dir_rot = limit_period(yaw - dir_offset, 0.0, period)
        yaw = dir_rot + dir_offset + period * dir_labels
        yaw = limit_period(yaw, 0.5, 2 * jnp.pi)
        top_boxes = top_boxes.at[:, 6].set(yaw)

    corners = bu.boxes_to_corners_3d(top_boxes, cfg.order)  # (K, 8, 3)
    if transform is not None:
        corners = bu.project_corners(corners, transform)

    ok = (
        top_valid
        & bu.mask_large_boxes(corners)
        # wide band: the parity target (box_utils_mc.remove_bbx_abnormal_z)
        # is deliberately near-a-no-op (+/-100) for curvy roads; a tight
        # gt_range band dropped valid detections on slopes/overpasses
        & bu.mask_abnormal_z(corners, cfg.gt_range[2] - 3.0,
                             cfg.gt_range[5] + 3.0)
    )
    nms_keep = bu.nms_corners(corners, top_scores, ok, cfg.nms_threshold)
    final = nms_keep & bu.mask_boxes_range(corners, cfg.gt_range)

    # compact survivors to the front, capped at max_detections
    order = jnp.argsort(jnp.where(final, -top_scores, jnp.inf), stable=True)
    M = cfg.max_detections
    sel = order[:M]
    return {
        "corners": corners[sel],
        "boxes": top_boxes[sel],
        "scores": top_scores[sel],
        "labels": top_labels[sel],
        "valid": final[sel],
    }
