"""Anchor generation, target assignment, and box decoding (jnp, static shapes).

Behavioral parity targets in the reference:
  - single-class anchors / labels: data_utils/post_processor/voxel_postprocessor.py:30-209
  - multi-class (per-class sizes/rotations/thresholds):
    voxel_postprocessor_3heads.py:63-280
  - delta decode: voxel_postprocessor.py delta_to_boxes3d:409-457

TPU-first deviations (documented, not accidental):
  - label assignment runs ON DEVICE inside the jitted step over padded GT
    boxes, instead of in CPU dataloader workers + Cython bbox_overlaps;
  - when an anchor clears the matched threshold for several GTs, it is
    assigned to its argmax-IoU GT (the reference keeps the first pair emitted
    by np.where + np.unique — argmax is deterministic and at least as good);
  - anchors for all classes share one (H, W, S=C*A, 7) array, slot-major by
    class (slot = class_idx * A + rot_idx), matching the reference's
    concat layout of labels (axis=-1) and targets (axis=-2).

Boxes here are hwl order [x, y, z, h, w, l, yaw] (the reference's PointPillars
convention); class ids are 1-based in GT (0 = background / padding).
"""

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from quantv2x_tpu.utils import box_utils as bu


@dataclasses.dataclass(frozen=True)
class AnchorClassCfg:
    """Per-class anchor spec (mirrors one anchor_generator_config entry in the
    reference YAML, e.g. hypes_yaml/v2x_real/LiDAROnly/lidar_pyramid.yaml:68-92)."""
    name: str
    size_lwh: tuple  # (l, w, h)
    rotations: tuple  # radians
    bottom_height: float
    matched_threshold: float
    unmatched_threshold: float


@dataclasses.dataclass(frozen=True)
class AnchorGridCfg:
    lidar_range: tuple  # (x1, y1, z1, x2, y2, z2)
    voxel_size: tuple   # (vx, vy, vz)
    feature_stride: int = 2
    align_center: bool = True
    classes: Sequence[AnchorClassCfg] = ()

    @property
    def grid_size(self):
        """Full-resolution BEV grid (W=x cells, H=y cells)."""
        W = int(round((self.lidar_range[3] - self.lidar_range[0]) / self.voxel_size[0]))
        H = int(round((self.lidar_range[4] - self.lidar_range[1]) / self.voxel_size[1]))
        return W, H

    @property
    def feature_size(self):
        W, H = self.grid_size
        return W // self.feature_stride, H // self.feature_stride

    @property
    def num_anchors_per_loc(self):
        """Total anchor slots per feature-map cell (sum over classes)."""
        return sum(len(c.rotations) for c in self.classes)


VEHICLE = AnchorClassCfg("vehicle", (3.9, 1.6, 1.56), (0.0, 1.57), -1.78, 0.6, 0.45)
PEDESTRIAN = AnchorClassCfg("pedestrian", (0.8, 0.6, 1.73), (0.0, 1.57), -0.6, 0.5, 0.35)
TRUCK = AnchorClassCfg("truck", (8.0, 3.0, 3.0), (0.0, 1.57), -1.78, 0.6, 0.45)

V2XREAL_CLASSES = (VEHICLE, PEDESTRIAN, TRUCK)


def generate_anchors(cfg: AnchorGridCfg):
    """Build the anchor stack.

    Returns:
      anchors: (H, W, S, 7) float32, hwl order — rows index y, cols index x
               (same orientation as the BEV feature canvas);
      slot_class: (S,) int32, 1-based class id per anchor slot;
      matched_thr / unmatched_thr: (S,) float32 per-slot IoU thresholds.
    Parity: voxel_postprocessor_3heads.generate_anchor_box:63-126 (align_center
    grid with half-stride offset; bottom height used directly as anchor z).
    """
    x1, y1, _, x2, y2, _ = cfg.lidar_range
    Wf, Hf = cfg.feature_size
    per_class, slot_cls, m_thr, u_thr = [], [], [], []
    for ci, c in enumerate(cfg.classes):
        if cfg.align_center:
            xs = x1 + (x2 - x1) / Wf * (np.arange(Wf) + 0.5)
            ys = y1 + (y2 - y1) / Hf * (np.arange(Hf) + 0.5)
        else:
            xs = np.linspace(x1, x2, Wf)
            ys = np.linspace(y1, y2, Hf)
        cx, cy = np.meshgrid(xs, ys)  # (Hf, Wf)
        l, w, h = c.size_lwh
        for rot in c.rotations:
            a = np.stack(
                [
                    cx,
                    cy,
                    np.full_like(cx, c.bottom_height),
                    np.full_like(cx, h),
                    np.full_like(cx, w),
                    np.full_like(cx, l),
                    np.full_like(cx, rot),
                ],
                axis=-1,
            )  # (Hf, Wf, 7) hwl
            per_class.append(a)
            slot_cls.append(ci + 1)
            m_thr.append(c.matched_threshold)
            u_thr.append(c.unmatched_threshold)
    anchors = np.stack(per_class, axis=2).astype(np.float32)  # (Hf, Wf, S, 7)
    # returned as NUMPY: these are trace-time constants closed over by
    # every jitted program (train step, e2e, decode). A committed device
    # array here costs a device->host fetch per lowering — on the
    # tunneled-TPU backend that is seconds per program (BENCH r3's
    # "544 s compile" was mostly this class of trace-time traffic); numpy
    # constants embed for free.
    return (
        anchors,
        np.array(slot_cls, np.int32),
        np.array(m_thr, np.float32),
        np.array(u_thr, np.float32),
    )


def assign_targets(gt_boxes, gt_classes, gt_mask, anchors, slot_class,
                   matched_thr, unmatched_thr):
    """Anchor-to-GT assignment + regression-target encoding. Fully jnp/jit-safe.

    Args:
      gt_boxes: (M, 7) hwl-order padded GT boxes.
      gt_classes: (M,) int, 1-based class ids (anything for padded rows).
      gt_mask: (M,) bool validity.
      anchors: (H, W, S, 7); slot_class/matched_thr/unmatched_thr: (S,).

    Returns dict:
      labels: (H, W, S) int32 — -1 ignore, 0 negative, >0 class id (parity
              with the 3heads 'pos_equal_one' which stores labels);
      targets: (H, W, S, 7) float32 regression deltas (nonzero only at pos);
      pos_mask / neg_mask: (H, W, S) bool.
    """
    H, W, S, _ = anchors.shape
    flat = anchors.reshape(-1, 7)                      # (N, 7), N = H*W*S
    N = flat.shape[0]
    a_standup = bu.boxes_to_standup_2d(flat, "hwl")    # (N, 4)
    g_standup = bu.boxes_to_standup_2d(gt_boxes, "hwl")  # (M, 4)
    iou = bu.iou_matrix_axis_aligned(a_standup, g_standup)  # (N, M)

    slot_of_anchor = jnp.tile(slot_class, H * W)       # (N,)
    class_ok = slot_of_anchor[:, None] == gt_classes[None, :]
    valid = gt_mask[None, :] & class_ok
    iou = jnp.where(valid, iou, 0.0)

    m_thr_n = jnp.tile(matched_thr, H * W)
    u_thr_n = jnp.tile(unmatched_thr, H * W)

    best_gt = jnp.argmax(iou, axis=1)                  # (N,)
    best_iou = jnp.max(iou, axis=1)

    pos_by_thr = best_iou > m_thr_n

    # force-match: each valid GT claims its best same-class anchor (iou > 0).
    # Invalid claims scatter out-of-range so they can't clobber valid ones.
    best_anchor_per_gt = jnp.argmax(iou, axis=0)       # (M,)
    gt_best_iou = jnp.max(iou, axis=0)
    claim = gt_mask & (gt_best_iou > 0)
    claim_idx = jnp.where(claim, best_anchor_per_gt, N)
    force = jnp.zeros((N,), bool).at[claim_idx].set(True, mode="drop")
    # forced anchors point at the GT that claimed them (overrides argmax)
    forced_gt = jnp.zeros((N,), jnp.int32).at[claim_idx].set(
        jnp.arange(gt_boxes.shape[0], dtype=jnp.int32), mode="drop"
    )
    pos = pos_by_thr | force
    assigned_gt = jnp.where(force & ~pos_by_thr, forced_gt, best_gt)

    # negative: every (valid, same-class) gt IoU below the unmatched threshold
    below = jnp.where(valid, iou < u_thr_n[:, None], True)
    neg = jnp.all(below, axis=1) & ~pos

    # encode regression deltas against the assigned GT
    g = gt_boxes[assigned_gt]                          # (N, 7)
    a = flat
    d = jnp.sqrt(a[:, 4] ** 2 + a[:, 5] ** 2)          # diag of (w, l)
    eps = 1e-6
    targets = jnp.stack(
        [
            (g[:, 0] - a[:, 0]) / d,
            (g[:, 1] - a[:, 1]) / d,
            (g[:, 2] - a[:, 2]) / a[:, 3],
            jnp.log(jnp.maximum(g[:, 3], eps) / a[:, 3]),
            jnp.log(jnp.maximum(g[:, 4], eps) / a[:, 4]),
            jnp.log(jnp.maximum(g[:, 5], eps) / a[:, 5]),
            g[:, 6] - a[:, 6],
        ],
        axis=-1,
    )
    targets = jnp.where(pos[:, None], targets, 0.0)

    labels = jnp.where(
        pos, gt_classes[assigned_gt].astype(jnp.int32),
        jnp.where(neg, 0, -1),
    )
    return {
        "labels": labels.reshape(H, W, S),
        "targets": targets.reshape(H, W, S, 7),
        "pos_mask": pos.reshape(H, W, S),
        "neg_mask": neg.reshape(H, W, S),
    }


def decode_deltas(deltas, anchors):
    """Regression deltas -> hwl boxes. Inverse of the target encoding.

    deltas: (..., S, 7) aligned with anchors (..., S, 7). Parity:
    voxel_postprocessor.delta_to_boxes3d:409-457.
    """
    a = anchors
    d = jnp.sqrt(a[..., 4] ** 2 + a[..., 5] ** 2)
    x = deltas[..., 0] * d + a[..., 0]
    y = deltas[..., 1] * d + a[..., 1]
    z = deltas[..., 2] * a[..., 3] + a[..., 2]
    h = jnp.exp(deltas[..., 3]) * a[..., 3]
    w = jnp.exp(deltas[..., 4]) * a[..., 4]
    l = jnp.exp(deltas[..., 5]) * a[..., 5]
    yaw = deltas[..., 6] + a[..., 6]
    return jnp.stack([x, y, z, h, w, l, yaw], axis=-1)
