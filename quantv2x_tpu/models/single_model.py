"""Single-agent detection model + early/late fusion paths.

Parity:
  - HeterPyramidSingle (models/heter_pyramid_single.py): encoder ->
    backbone -> pyramid.forward_single -> shrink -> heads;
  - early fusion (data_utils early-fusion datasets): every agent's points
    projected into the ego frame and merged BEFORE voxelization, then the
    single-agent model runs on the merged cloud;
  - late fusion (late-fusion datasets + base post_process): the single
    model runs per agent, per-agent detections are projected into the ego
    frame and merged by one rotated NMS.
"""

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from quantv2x_tpu.models.collab_model import (
    DetectionHeads,
    ModelCfg,
    ShrinkConv,
)
from quantv2x_tpu.models.bev_backbone import ResNetBEVBackbone
from quantv2x_tpu.models.pillar_encoder import PillarVFE, scatter_to_bev
from quantv2x_tpu.models.pyramid_fusion import PyramidFusion


class PyramidSingleModel(nn.Module):
    """Single-agent pyramid detector (heter_pyramid_single.py parity)."""
    cfg: ModelCfg

    def setup(self):
        c = self.cfg
        dt = c.jnp_dtype
        self.vfe = PillarVFE(c.voxel, c.pillar_filters, dtype=dt)
        self.backbone = ResNetBEVBackbone(
            c.backbone_layers, c.backbone_strides, c.backbone_filters,
            dtype=dt,
        )
        self.pyramid = PyramidFusion(
            layer_nums=c.pyramid_layers, layer_strides=c.pyramid_strides,
            num_filters=c.pyramid_filters,
            upsample_strides=c.pyramid_up_strides,
            num_upsample_filters=c.pyramid_up_filters, dtype=dt,
        )
        self.shrink = ShrinkConv(c.shrink_dim, dtype=dt)
        self.heads = DetectionHeads(
            c.num_class, c.anchor_num, c.num_dir_bins,
            uncertainty_dim=c.uncertainty_dim, dtype=dt
        )

    def __call__(self, voxels, train: bool = False):
        """voxels: single-agent voxel dict (V, P, F) etc. (no batch axis)."""
        c = self.cfg
        feats = self.vfe(voxels["voxel_features"], voxels["voxel_coords"],
                         voxels["voxel_num_points"], train)
        nx, ny, _ = c.voxel.grid_size
        bev = scatter_to_bev(feats, voxels["voxel_coords"],
                             voxels["voxel_mask"], (ny, nx))[None]
        feat = self.backbone(bev, train)
        fused, occ = self.pyramid.forward_single(feat, train)
        fused = self.shrink(fused)
        preds = self.heads(fused)
        out = {
            "cls_preds": preds[0], "reg_preds": preds[1],
            "dir_preds": preds[2], "occ_maps": occ,
        }
        if c.uncertainty_dim:
            out["unc_preds"] = preds[3]
        return out


def merge_points_to_ego(frame, max_points: Optional[int] = None):
    """Early fusion: project every agent's points into the ego frame and
    merge into one padded cloud (numpy, host-side)."""
    from quantv2x_tpu.utils.transformation import np_pose_to_world

    pts_out, mask_out = [], []
    T_we = np_pose_to_world(frame["agent_poses"][0])
    T_ew = np.linalg.inv(T_we)
    for a in range(frame["agent_points"].shape[0]):
        if not frame["agent_mask"][a]:
            continue
        valid = frame["agent_points_mask"][a]
        pts = frame["agent_points"][a][valid]
        T = T_ew @ np_pose_to_world(frame["agent_poses"][a])
        xyz = pts[:, :3] @ T[:3, :3].T + T[:3, 3]
        pts_out.append(np.concatenate([xyz, pts[:, 3:4]], axis=1))
    merged = np.concatenate(pts_out, axis=0).astype(np.float32)
    P = max_points or frame["agent_points"].shape[1] * frame["agent_points"].shape[0]
    out = np.zeros((P, 4), np.float32)
    m = np.zeros((P,), bool)
    k = min(len(merged), P)
    out[:k] = merged[:k]
    m[:k] = True
    new = dict(frame)
    new["agent_points"] = out[None]
    new["agent_points_mask"] = m[None]
    new["agent_poses"] = frame["agent_poses"][:1]
    new["agent_mask"] = frame["agent_mask"][:1]
    return new


def late_fuse_detections(per_agent_dets, transforms, nms_threshold=0.15,
                         max_out=150):
    """Merge per-agent decoded detections in the ego frame by one NMS.

    per_agent_dets: list of decode_detections dicts (corners in each agent's
    own frame); transforms: list of (4, 4) T_ego<-agent. Jit-safe given
    fixed list length.
    """
    from quantv2x_tpu.utils import box_utils as bu

    corners = jnp.concatenate([
        bu.project_corners(d["corners"], T)
        for d, T in zip(per_agent_dets, transforms)
    ])
    scores = jnp.concatenate([d["scores"] for d in per_agent_dets])
    labels = jnp.concatenate([d["labels"] for d in per_agent_dets])
    valid = jnp.concatenate([d["valid"] for d in per_agent_dets])
    keep = bu.nms_corners(corners, scores, valid, nms_threshold)
    order = jnp.argsort(jnp.where(keep, -scores, jnp.inf), stable=True)[:max_out]
    return {
        "corners": corners[order],
        "scores": scores[order],
        "labels": labels[order],
        "valid": keep[order],
    }
