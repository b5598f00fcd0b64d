"""CenterPoint-style anchor-free detection head (alternative to the anchor
heads).

Parity: the reference's center_point_* model family (models/center_point*.py
+ loss/center_point_loss.py): per-class center heatmap with gaussian
targets + focal loss, sub-pixel offset, z, dims (log), and (sin, cos) yaw
regression; decode = local-max peak picking + top-K.

All target assignment and decoding is jit-safe with static shapes.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CenterHeadCfg:
    num_classes: int = 3
    lidar_range: tuple = (-140.8, -40.0, -3.0, 140.8, 40.0, 1.0)
    stride_m: float = 0.8            # metres per feature cell
    min_radius: int = 2
    gaussian_overlap: float = 0.1
    max_detections: int = 150
    score_threshold: float = 0.2


class CenterHead(nn.Module):
    cfg: CenterHeadCfg
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> dict of dense maps."""
        C = self.cfg.num_classes
        def head(ch, name):
            h = nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"{name}_c1")(x)
            h = nn.relu(h)
            return nn.Conv(ch, (1, 1), dtype=self.dtype, name=f"{name}_c2")(h)
        return {
            "heatmap": head(C, "hm"),            # logits
            "offset": head(2, "offset"),
            "z": head(1, "z"),
            "dim": head(3, "dim"),               # log(l, w, h)
            "rot": head(2, "rot"),               # (sin, cos)
        }


def gaussian_radius(l_cells, w_cells, overlap=0.1):
    """CenterNet radius heuristic (simplified min-of-three)."""
    a = (l_cells + w_cells) * (1 - overlap) / (1 + overlap) / 2
    return jnp.maximum(a, 1.0)


def make_center_targets(gt_boxes, gt_classes, gt_mask, cfg: CenterHeadCfg,
                        hw):
    """Dense gaussian heatmap + per-object regression targets.

    gt_boxes: (M, 7) hwl; returns dict with heatmap (H, W, C),
    reg targets gathered per gt (M, 7-ish) and index maps.
    """
    H, W = hw
    x1, y1 = cfg.lidar_range[0], cfg.lidar_range[1]
    cx = (gt_boxes[:, 0] - x1) / cfg.stride_m
    cy = (gt_boxes[:, 1] - y1) / cfg.stride_m
    gx = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, W - 1)
    gy = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, H - 1)

    l_cells = gt_boxes[:, 5] / cfg.stride_m
    w_cells = gt_boxes[:, 4] / cfg.stride_m
    radius = jnp.maximum(
        gaussian_radius(l_cells, w_cells, cfg.gaussian_overlap),
        cfg.min_radius,
    )

    # gaussian centered at the INTEGER cell (CenterNet convention) so the
    # peak sample is exactly 1; the fractional part goes to the offset head
    ys = jnp.arange(H)[:, None, None]
    xs = jnp.arange(W)[None, :, None]
    d2 = (ys - gy[None, None, :]) ** 2 + (xs - gx[None, None, :]) ** 2
    g = jnp.exp(-d2 / (2 * (radius[None, None, :] / 3) ** 2))   # (H, W, M)
    g = jnp.where(gt_mask[None, None, :], g, 0.0)

    C = cfg.num_classes
    onehot = jax.nn.one_hot(gt_classes - 1, C)                  # (M, C)
    heatmap = jnp.einsum("hwm,mc->hwc", g, onehot)
    heatmap = jnp.clip(heatmap, 0.0, 1.0)

    return {
        "heatmap": heatmap,
        "center_idx": gy * W + gx,                              # (M,)
        "offset": jnp.stack([cx - gx, cy - gy], axis=-1),
        "z": gt_boxes[:, 2:3],
        "dim": jnp.log(jnp.maximum(
            gt_boxes[:, jnp.array([5, 4, 3])], 1e-3)),          # l, w, h
        "rot": jnp.stack([jnp.sin(gt_boxes[:, 6]),
                          jnp.cos(gt_boxes[:, 6])], axis=-1),
    }


def center_loss(outputs, targets, gt_mask):
    """Gaussian focal heatmap loss + L1 regression at centers."""
    hm_pred = jax.nn.sigmoid(outputs["heatmap"].astype(jnp.float32))
    hm_pred = jnp.clip(hm_pred, 1e-4, 1 - 1e-4)
    hm_gt = targets["heatmap"]
    pos = hm_gt >= 0.99
    pos_loss = -jnp.log(hm_pred) * (1 - hm_pred) ** 2 * pos
    neg_loss = -jnp.log(1 - hm_pred) * hm_pred ** 2 * (1 - hm_gt) ** 4 * ~pos
    n_pos = jnp.maximum(pos.sum(), 1.0)
    hm_loss = (pos_loss.sum() + neg_loss.sum()) / n_pos

    H, W = outputs["heatmap"].shape[:2]
    idx = targets["center_idx"]
    def gather(maps):
        return maps.reshape(H * W, -1)[idx]
    m = gt_mask[:, None].astype(jnp.float32)
    n = jnp.maximum(m.sum(), 1.0)
    reg_loss = 0.0
    for k in ("offset", "z", "dim", "rot"):
        pred = gather(outputs[k].astype(jnp.float32))
        reg_loss = reg_loss + (jnp.abs(pred - targets[k]) * m).sum() / n
    return hm_loss + reg_loss, {"hm_loss": hm_loss, "reg_loss": reg_loss}


def decode_centers(outputs, cfg: CenterHeadCfg):
    """Peak-pick the heatmap -> padded detections (hwl boxes)."""
    hm = jax.nn.sigmoid(outputs["heatmap"].astype(jnp.float32))
    H, W, C = hm.shape
    # 3x3 local max suppression
    pooled = jax.lax.reduce_window(hm, -jnp.inf, jax.lax.max,
                                   (3, 3, 1), (1, 1, 1), "SAME")
    peaks = jnp.where(hm == pooled, hm, 0.0)
    flat = peaks.reshape(-1)                       # (H*W*C,)
    K = cfg.max_detections
    scores, flat_idx = jax.lax.top_k(flat, K)
    cell = flat_idx // C
    cls = (flat_idx % C).astype(jnp.int32) + 1
    gy = cell // W
    gx = cell % W

    def gather(maps):
        return maps.reshape(H * W, -1)[cell]
    off = gather(outputs["offset"])
    z = gather(outputs["z"])[:, 0]
    dim = jnp.exp(gather(outputs["dim"]))
    rot = gather(outputs["rot"])
    yaw = jnp.arctan2(rot[:, 0], rot[:, 1])
    x = (gx + off[:, 0]) * cfg.stride_m + cfg.lidar_range[0]
    y = (gy + off[:, 1]) * cfg.stride_m + cfg.lidar_range[1]
    boxes = jnp.stack([x, y, z, dim[:, 2], dim[:, 1], dim[:, 0], yaw],
                      axis=-1)                      # hwl
    return {
        "boxes": boxes,
        "scores": scores,
        "labels": cls,
        "valid": scores > cfg.score_threshold,
    }


class CenterPointCollabModel(nn.Module):
    """Cooperative CenterPoint: the pyramid collab trunk (encode agents ->
    pyramid fuse -> shrink) with the anchor-free CenterHead in place of the
    anchor heads (parity: models/center_point*.py over the same BEV trunk).
    Takes the standard collab batch dict."""
    model_cfg: "ModelCfg"            # quantv2x_tpu.models.collab_model
    head_cfg: CenterHeadCfg = None

    def setup(self):
        from quantv2x_tpu.models.collab_model import PyramidCollabModel
        import dataclasses as _dc
        self.trunk = PyramidCollabModel(self.model_cfg, name="trunk")
        hc = self.head_cfg or CenterHeadCfg(
            num_classes=self.model_cfg.num_class,
            lidar_range=self.model_cfg.voxel.lidar_range,
            stride_m=self.model_cfg.voxel.voxel_size[0] * 2,
        )
        self.head = CenterHead(hc, dtype=self.model_cfg.jnp_dtype,
                               name="center_head")

    def __call__(self, batch, train: bool = False):
        feats = self.trunk.encode_agents(batch, train)
        from quantv2x_tpu.utils.transformation import normalize_pairwise_tfm
        c = self.model_cfg
        H, W = c.bev_hw
        affine = normalize_pairwise_tfm(
            batch["pairwise_t_matrix"], H, W, c.voxel.voxel_size[0])
        fov_mask = None
        if c.proj_first:
            from quantv2x_tpu.models.pyramid_fusion import project_to_ego
            feats, fov_mask = project_to_ego(
                feats, affine[:, 0], self.trunk.pyramid.align_corners)
        fused, occ_maps = self.trunk.pyramid.forward_collab(
            feats, batch["agent_mask"], affine, train, fov_mask=fov_mask)
        fused = self.trunk.shrink(fused)
        out = self.head(fused)
        out["occ_maps"] = occ_maps
        return out
