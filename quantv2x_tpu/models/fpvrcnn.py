"""FPV-RCNN: two-stage cooperative detector (keypoint second stage).

TPU-native re-design of:
  - models/fpvrcnn.py:20-89 (SECOND/SSFA stage 1 -> VSA keypoints ->
    cross-agent Matcher -> RoIHead refinement);
  - models/sub_modules/vsa.py:45-273 (VoxelSetAbstraction: FPS keypoint
    sampling, stage-1-box masking, BEV bilinear + multi-radius pointnet
    set-abstraction features, linear+BN fusion);
  - models/sub_modules/matcher.py:16-181 (IoU clustering of per-agent
    stage-1 boxes + score-weighted box fusion with direction voting);
  - models/sub_modules/roi_head.py:13-285 (RoI grid pooling via set
    abstraction at 6^3 grid points + shared FC -> cls/iou/reg heads).

All dynamic structures (per-agent detection counts, cluster counts,
keypoint counts) are fixed-capacity pad-and-mask so every stage jits.
Stage 1 reuses the CIA-SSD encoder/neck/head (models/ciassd.py).
"""

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from quantv2x_tpu.models.layers import BN_EPS, BN_MOMENTUM
from quantv2x_tpu.ops.pointops import (
    ball_query_group,
    bilinear_from_bev,
    farthest_point_sample,
    group_points,
    points_in_boxes_index,
)
from quantv2x_tpu.utils.box_utils import iou_matrix_rotated_bev


class StackSAModule(nn.Module):
    """Multi-radius set abstraction: ball-query group -> shared MLP ->
    masked max-pool (pointnet2_stack StackSAModuleMSG parity)."""
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]       # one channel list per radius
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, xyz_mask, feats, new_xyz, new_mask,
                 train: bool = False):
        outs = []
        for ri, (radius, ns, chans) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            idx, gmask = ball_query_group(
                new_xyz, new_mask, xyz, xyz_mask, radius, ns)
            g = group_points(xyz, feats, idx, gmask, new_xyz)  # (M,K,3+C)
            h = g.astype(self.dtype)
            for ci, c in enumerate(chans):
                h = nn.Dense(c, use_bias=False, dtype=self.dtype,
                             name=f"mlp{ri}_{ci}")(h)
                h = nn.BatchNorm(use_running_average=not train,
                                 momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                 dtype=self.dtype, name=f"bn{ri}_{ci}")(h)
                h = nn.relu(h)
            h = jnp.where(gmask[..., None], h, -1e9)
            pooled = h.max(axis=1)
            pooled = jnp.where(new_mask[:, None] & gmask.any(1)[:, None],
                               pooled, 0.0)
            outs.append(pooled)
        return jnp.concatenate(outs, axis=-1)


@dataclasses.dataclass(frozen=True)
class VsaCfg:
    num_keypoints: int = 1024
    radii: Tuple[float, ...] = (0.4, 0.8)
    nsamples: Tuple[int, ...] = (16, 32)
    mlp_channels: Tuple[int, ...] = (16, 16)
    out_features: int = 32
    enlarge_boxes: float = 0.5
    bev_stride: int = 2
    z_range: Tuple[float, float] = (-2.8, 1.0)


class VoxelSetAbstraction(nn.Module):
    """FPS keypoints + (BEV bilinear ++ raw-point SA) features (vsa.py)."""
    cfg: VsaCfg
    lidar_range: Tuple[float, ...]
    voxel_size: Tuple[float, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, point_mask, bev, det_boxes, det_mask,
                 train: bool = False):
        """points (N,4) one agent's cloud; bev (H,W,C) its stage-1
        features; det_boxes (K,7) lwh decoded stage-1 boxes.

        Returns keypoints (M,3), kp_mask (M,), features (M,F)."""
        c = self.cfg
        kp_idx = farthest_point_sample(points[:, :3], point_mask,
                                       c.num_keypoints)
        kp = points[kp_idx, :3]
        kp_mask = point_mask[kp_idx]
        # height gate (vsa.py:190) + keep only keypoints inside (enlarged)
        # stage-1 boxes (vsa.py:194-209)
        kp_mask &= (kp[:, 2] > c.z_range[0]) & (kp[:, 2] < c.z_range[1])
        grown = det_boxes.at[:, 3:6].add(c.enlarge_boxes)
        owner = points_in_boxes_index(kp, grown, det_mask)
        kp_mask &= owner >= 0

        feats = []
        stride_m = (self.voxel_size[0] * c.bev_stride,
                    self.voxel_size[1] * c.bev_stride)
        feats.append(bilinear_from_bev(bev, kp[:, :2], self.lidar_range,
                                       stride_m))
        sa = StackSAModule(
            c.radii, c.nsamples,
            [list(c.mlp_channels)] * len(c.radii),
            dtype=self.dtype, name="sa_rawpoints",
        )(points[:, :3], point_mask, points[:, 3:], kp, kp_mask, train)
        feats.append(sa)
        h = jnp.concatenate(feats, axis=-1).astype(self.dtype)
        h = nn.Dense(c.out_features, use_bias=False, dtype=self.dtype,
                     name="fusion")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="fusion_bn")(h)
        h = nn.relu(h)
        h = jnp.where(kp_mask[:, None], h, 0.0)
        return kp, kp_mask, h


def limit_period(val, offset: float = 0.5, period: float = 2 * jnp.pi):
    return val - jnp.floor(val / period + offset) * period


def cluster_fuse_boxes(boxes, scores, mask, iou_thresh: float = 0.1):
    """Cross-agent box clustering + score-weighted fusion (matcher.py:33-147).

    boxes (N,7) lwh in ego frame (all agents' stage-1 boxes stacked),
    scores (N,), mask (N,). Returns fused (N,7), fused scores (N,),
    fused mask (N,) — slot i survives iff box i is its cluster's seed.
    """
    n = boxes.shape[0]
    iou = iou_matrix_rotated_bev(boxes, boxes)
    linked = (iou > iou_thresh) & mask[None, :] & mask[:, None]

    # greedy first-unassigned clustering, identical order to the reference
    def body(i, cluster_id):
        unassigned = cluster_id < 0
        take = unassigned[i] & mask[i]
        newly = linked[i] & unassigned
        return jnp.where(take & newly, i, cluster_id)

    cluster_id = jax.lax.fori_loop(
        0, n, body, jnp.full((n,), -1, jnp.int32))
    is_seed = (cluster_id == jnp.arange(n)) & mask

    member = (cluster_id[None, :] == jnp.arange(n)[:, None]) & mask[None, :]
    w = jnp.where(member, scores[None, :], 0.0)
    wsum = jnp.maximum(w.sum(axis=1, keepdims=True), 1e-8)
    wn = w / wsum

    # direction voting (matcher.py:95-112): flip members >pi/2 away from
    # the cluster's max-score direction, unless the flipped group carries
    # more score
    best = jnp.argmax(w, axis=1)
    dirs = limit_period(boxes[:, 6])
    diff = jnp.abs(dirs[None, :] - dirs[best][:, None])
    diff = jnp.where(diff > jnp.pi, 2 * jnp.pi - diff, diff)
    far = diff > jnp.pi / 2
    score_far = jnp.where(member & far, scores[None, :], 0.0).sum(1)
    score_near = jnp.where(member & ~far, scores[None, :], 0.0).sum(1)
    flip_far = score_far <= score_near
    d = jnp.where(far == flip_far[:, None], dirs[None, :] + jnp.pi,
                  dirs[None, :])
    sint = (jnp.sin(d) * wn).sum(1)
    cost = (jnp.cos(d) * wn).sum(1)
    yaw = jnp.arctan2(sint, cost)

    center_dim = (boxes[None, :, :6] * wn[..., None]).sum(1)
    fused = jnp.concatenate([center_dim, yaw[:, None]], axis=-1)

    # fused score: sum of s_k^(k+1) over descending member scores, capped 1
    s_sorted = jnp.sort(w, axis=1)[:, ::-1]
    powers = jnp.arange(1, n + 1, dtype=jnp.float32)[None, :]
    s_fused = jnp.minimum((s_sorted ** powers).sum(1), 1.0)
    return fused, s_fused, is_seed


@dataclasses.dataclass(frozen=True)
class RoiHeadCfg:
    grid_size: int = 6
    radii: Tuple[float, ...] = (0.8,)
    nsamples: Tuple[int, ...] = (16,)
    mlp_channels: Tuple[int, ...] = (32, 32)
    fc_neurons: int = 256
    num_cls: int = 1


class RoIHead(nn.Module):
    """RoI grid pooling + FC refinement heads (roi_head.py:94-285)."""
    cfg: RoiHeadCfg
    dtype: jnp.dtype = jnp.float32

    def _grid_points(self, rois):
        """(R,7) lwh rois -> (R, G^3, 3) global grid point coords
        (roi_head.get_global_grid_points_of_roi:94-127)."""
        G = self.cfg.grid_size
        R = rois.shape[0]
        idx = jnp.stack(jnp.meshgrid(*([jnp.arange(G)] * 3),
                                     indexing="ij"), axis=-1).reshape(-1, 3)
        local = (idx + 0.5) / G - 0.5                       # in [-.5, .5)
        local = local[None] * rois[:, None, 3:6]            # scale by lwh
        yaw = rois[:, 6]
        ca, sa = jnp.cos(yaw), jnp.sin(yaw)
        gx = local[..., 0] * ca[:, None] - local[..., 1] * sa[:, None]
        gy = local[..., 0] * sa[:, None] + local[..., 1] * ca[:, None]
        pts = jnp.stack([gx, gy, local[..., 2]], axis=-1)
        return pts + rois[:, None, :3]

    @nn.compact
    def __call__(self, rois, roi_mask, kp, kp_mask, kp_feats,
                 train: bool = False):
        c = self.cfg
        G = c.grid_size
        R = rois.shape[0]
        grid = self._grid_points(rois).reshape(-1, 3)       # (R*G^3, 3)
        gmask = jnp.repeat(roi_mask, G ** 3)
        pooled = StackSAModule(
            c.radii, c.nsamples, [list(c.mlp_channels)] * len(c.radii),
            dtype=self.dtype, name="roi_grid_pool",
        )(kp, kp_mask, kp_feats, grid, gmask, train)
        h = pooled.reshape(R, -1).astype(self.dtype)        # (R, G^3 * C)

        def fc_stack(h, name, out=None):
            for i in range(2):
                h = nn.Dense(c.fc_neurons, use_bias=False, dtype=self.dtype,
                             name=f"{name}_fc{i}")(h)
                h = nn.BatchNorm(use_running_average=not train,
                                 momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                 dtype=self.dtype, name=f"{name}_bn{i}")(h)
                h = nn.relu(h)
            if out is not None:
                h = nn.Dense(out, dtype=self.dtype, name=f"{name}_out")(h)
            return h

        shared = fc_stack(h, "shared")
        return {
            "rcnn_cls": fc_stack(shared, "cls", c.num_cls).astype(
                jnp.float32),
            "rcnn_iou": fc_stack(shared, "iou", c.num_cls).astype(
                jnp.float32),
            "rcnn_reg": fc_stack(shared, "reg", c.num_cls * 7).astype(
                jnp.float32),
        }


def roi_refine_loss(stage2_out, rois, roi_mask, gt_boxes, gt_mask,
                    cls_weight: float = 1.0, iou_weight: float = 1.0,
                    reg_weight: float = 1.0):
    """Second-stage loss (parity: loss/fpvrcnn_loss.py semantics):
    BCE(cls, iou>0.5 target) + L1(iou head, roi-gt IoU) + smooth-L1 on
    the roi->gt residual for fg rois (IoU > 0.55)."""
    iou_rg = iou_matrix_rotated_bev(rois, gt_boxes)
    iou_rg = jnp.where(gt_mask[None, :], iou_rg, 0.0)
    best_iou = iou_rg.max(axis=1)
    best_gt = gt_boxes[jnp.argmax(iou_rg, axis=1)]

    valid = roi_mask.astype(jnp.float32)
    nv = jnp.maximum(valid.sum(), 1.0)

    cls_t = (best_iou > 0.5).astype(jnp.float32)
    logits = stage2_out["rcnn_cls"][:, 0]
    cls_loss = (valid * (jnp.maximum(logits, 0) - logits * cls_t
                         + jnp.log1p(jnp.exp(-jnp.abs(logits))))).sum() / nv

    iou_loss = (valid * jnp.abs(
        stage2_out["rcnn_iou"][:, 0] - best_iou)).sum() / nv

    fg = valid * (best_iou > 0.55)
    nfg = jnp.maximum(fg.sum(), 1.0)
    res_t = jnp.concatenate([
        best_gt[:, :6] - rois[:, :6],
        limit_period(best_gt[:, 6] - rois[:, 6])[:, None]], axis=-1)
    diff = stage2_out["rcnn_reg"][:, :7] - res_t
    ad = jnp.abs(diff)
    sl1 = jnp.where(ad < 1.0, 0.5 * diff ** 2, ad - 0.5).sum(-1)
    reg_loss = (fg * sl1).sum() / nfg

    total = (cls_weight * cls_loss + iou_weight * iou_loss
             + reg_weight * reg_loss)
    return total, {"rcnn_cls_loss": cls_loss, "rcnn_iou_loss": iou_loss,
                   "rcnn_reg_loss": reg_loss}


def apply_roi_refinement(rois, stage2_out):
    """rois + predicted residuals -> refined boxes (lwh)."""
    res = stage2_out["rcnn_reg"][:, :7]
    refined = rois.at[:, :6].add(res[:, :6])
    return refined.at[:, 6].add(res[:, 6])


@dataclasses.dataclass(frozen=True)
class FpvrcnnCfg:
    ciassd: "CiassdCfg"                  # stage-1 config
    vsa: VsaCfg = VsaCfg()
    roi: RoiHeadCfg = RoiHeadCfg()
    stage1_top_k: int = 64               # per-agent stage-1 detections
    score_thresh: float = 0.3
    cluster_iou: float = 0.1
    dtype: str = "float32"


class FPVRCNN(nn.Module):
    """Two-stage cooperative pipeline (fpvrcnn.py:20-89), proj-first form:
    every agent's voxels/points arrive pre-projected into the ego frame
    (the reference's proj_first=True path; per-agent-frame detection plus
    matcher-side projection is handled by the caller via box transforms).

    frame dict (A = agent axis):
      voxel_features (A,V,P,4), voxel_coords (A,V,3),
      voxel_num_points (A,V), voxel_mask (A,V),
      points (A,N,4), point_mask (A,N), agent_mask (A,)
    anchors: (h, w, S, 7) stage-1 anchor grid.
    """
    cfg: FpvrcnnCfg

    @nn.compact
    def __call__(self, frame, anchors, train: bool = False):
        from quantv2x_tpu.data.anchors import decode_deltas
        from quantv2x_tpu.models.ciassd import CIASSD
        from quantv2x_tpu.utils.box_utils import to_lwh

        c = self.cfg
        dt = jnp.dtype(c.dtype)
        A = frame["points"].shape[0]
        stage1 = CIASSD(c.ciassd, name="stage1")
        vsa = VoxelSetAbstraction(
            c.vsa, c.ciassd.second.lidar_range, c.ciassd.second.voxel_size,
            dtype=dt, name="vsa")
        roi_head = RoIHead(c.roi, dtype=dt, name="roi_head")

        det_boxes, det_scores, det_masks = [], [], []
        kps, kp_masks, kp_feats = [], [], []
        s1_outs = []
        anchors_flat = jnp.asarray(anchors).reshape(-1, 7)
        for a in range(A):                      # static agent loop (shared
            vox = {k: frame[k][a] for k in     # params across agents)
                   ("voxel_features", "voxel_coords", "voxel_num_points",
                    "voxel_mask")}
            out, neck = stage1(vox, train, return_feat=True)
            s1_outs.append(out)
            scores = jax.nn.sigmoid(out["cls_preds"].reshape(-1))
            top_s, top_i = jax.lax.top_k(scores, c.stage1_top_k)
            deltas = out["reg_preds"].reshape(-1, 7)[top_i]
            boxes = to_lwh(decode_deltas(deltas, anchors_flat[top_i]),
                           "hwl")
            valid = (top_s > c.score_thresh) & frame["agent_mask"][a]
            det_boxes.append(boxes)
            det_scores.append(jnp.where(valid, top_s, 0.0))
            det_masks.append(valid)
            kp, km, kf = vsa(
                frame["points"][a],
                frame["point_mask"][a] & frame["agent_mask"][a],
                neck[0], boxes, valid, train)
            kps.append(kp)
            kp_masks.append(km)
            kp_feats.append(kf)

        all_boxes = jnp.concatenate(det_boxes)
        all_scores = jnp.concatenate(det_scores)
        all_mask = jnp.concatenate(det_masks)
        fused, fused_scores, fused_mask = cluster_fuse_boxes(
            all_boxes, all_scores, all_mask, c.cluster_iou)

        kp = jnp.concatenate(kps)
        km = jnp.concatenate(kp_masks)
        kf = jnp.concatenate(kp_feats)
        stage2 = roi_head(fused, fused_mask, kp, km, kf, train)
        return {
            "stage1_out": s1_outs,
            "det_boxes": all_boxes, "det_scores": all_scores,
            "det_mask": all_mask,
            "boxes_fused": fused, "scores_fused": fused_scores,
            "mask_fused": fused_mask,
            "stage2_out": stage2,
            "boxes_refined": apply_roi_refinement(fused, stage2),
        }
