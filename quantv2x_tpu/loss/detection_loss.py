"""Detection losses: sigmoid focal cls + smooth-L1(sin) reg + direction bins
+ pyramid occupancy supervision.

Parity targets:
  - multi-class loss: loss/point_pillar_loss_mc.py:76-373 (focal alpha 0.25 /
    gamma 2.0 over per-slot class logits, one-hot minus background; sin
    difference angle encoding; per-slot direction softmax CE);
  - pyramid occupancy: loss/point_pillar_pyramid_loss_mc.py:11-102
    (per-level max-pooled fg/bg maps, focal loss, level weights).

All functions take the on-device label dict from anchors.assign_targets
(labels: -1 ignore / 0 neg / >0 class id; targets: (…, S, 7) deltas).
"""

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossCfg:
    num_class: int = 3
    alpha: float = 0.25
    gamma: float = 2.0
    cls_weight: float = 1.0
    reg_weight: float = 2.0
    reg_sigma: float = 3.0
    dir_weight: float = 0.2
    dir_offset: float = 0.7853
    num_dir_bins: int = 2
    anchor_yaws: tuple = (0.0, 1.5707963)   # radians, per anchor rotation
    anchor_num: int = 2                      # rotations per class
    pos_cls_weight: float = 2.0              # occupancy loss pos weight
    pyramid_downsample: tuple = (1, 2, 4)
    pyramid_weight: tuple = (0.4, 0.2, 0.1)


def sigmoid_focal_loss(logits, targets, weights, alpha, gamma):
    """Per-element focal loss (parity: point_pillar_loss_mc.cls_loss_func:225-258)."""
    p = jax.nn.sigmoid(logits)
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1 - p) + (1 - targets) * p
    focal = alpha_w * jnp.power(pt, gamma)
    bce = jnp.clip(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = focal * bce
    return loss * weights


def weighted_smooth_l1(preds, targets, weights, sigma):
    """Huber with sigma^2 switch point (parity: WeightedSmoothL1Loss)."""
    diff = preds - targets
    abs_diff = jnp.abs(diff)
    s2 = sigma ** 2
    loss = jnp.where(
        abs_diff < 1.0 / s2,
        0.5 * s2 * diff ** 2,
        abs_diff - 0.5 / s2,
    )
    return loss * weights


def add_sin_difference(preds, targets):
    """Encode yaw channel as sin(a-b) split (parity: add_sin_difference:128-140)."""
    pr = jnp.sin(preds[..., 6:7]) * jnp.cos(targets[..., 6:7])
    tr = jnp.cos(preds[..., 6:7]) * jnp.sin(targets[..., 6:7])
    return (
        jnp.concatenate([preds[..., :6], pr], axis=-1),
        jnp.concatenate([targets[..., :6], tr], axis=-1),
    )


def detection_loss(outputs, label_dict, cfg: LossCfg):
    """Main multi-class detection loss.

    outputs: dict with cls_preds (B,h,w,S*C), reg_preds (B,h,w,S*7),
             dir_preds (B,h,w,S*bins).
    label_dict: labels (B,h,w,S), targets (B,h,w,S,7).
    Returns (total, metrics dict).
    """
    C = cfg.num_class
    labels = label_dict["labels"]
    B = labels.shape[0]
    lab = labels.reshape(B, -1)                    # (B, N) N=h*w*S
    targets = label_dict["targets"].reshape(B, -1, 7)

    cared = lab >= 0
    positives = lab > 0
    negatives = lab == 0
    pos_norm = jnp.clip(positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0)
    reg_w = positives.astype(jnp.float32) / pos_norm
    cls_w = (negatives.astype(jnp.float32) + positives.astype(jnp.float32)) / pos_norm

    cls_preds = outputs["cls_preds"].astype(jnp.float32).reshape(B, -1, C)
    one_hot = jax.nn.one_hot(lab * cared, C + 1, dtype=jnp.float32)[..., 1:]
    cls_loss = sigmoid_focal_loss(
        cls_preds, one_hot, cls_w[..., None], cfg.alpha, cfg.gamma
    ).sum() / B * cfg.cls_weight

    reg_preds = outputs["reg_preds"].astype(jnp.float32).reshape(B, -1, 7)
    rp, rt = add_sin_difference(reg_preds, targets)
    reg_loss = weighted_smooth_l1(
        rp, rt, reg_w[..., None], cfg.reg_sigma
    ).sum() / B * cfg.reg_weight

    # direction bins: rot_gt = delta_yaw + anchor_yaw (slot-wise)
    S = labels.shape[-1]
    yaw_per_slot = jnp.tile(
        jnp.asarray(cfg.anchor_yaws, jnp.float32), S // cfg.anchor_num
    )  # slot-major layout: class blocks of anchor rotations
    rot_gt = targets[..., 6] + jnp.tile(yaw_per_slot[None, None, :],
                                        (1, targets.shape[1] // S, 1)).reshape(1, -1)
    period = 2 * jnp.pi / cfg.num_dir_bins
    offset_rot = rot_gt - cfg.dir_offset
    offset_rot = offset_rot - jnp.floor(offset_rot / (2 * jnp.pi)) * (2 * jnp.pi)
    dir_targets = jnp.clip(
        jnp.floor(offset_rot / period).astype(jnp.int32), 0, cfg.num_dir_bins - 1
    )
    dir_logits = outputs["dir_preds"].astype(jnp.float32).reshape(
        B, -1, cfg.num_dir_bins
    )
    dir_ce = -jax.nn.log_softmax(dir_logits)[
        jnp.arange(B)[:, None],
        jnp.arange(dir_logits.shape[1])[None, :],
        dir_targets,
    ]
    dir_loss = (dir_ce * reg_w).sum() / B * cfg.dir_weight

    total = cls_loss + reg_loss + dir_loss
    return total, {
        "cls_loss": cls_loss,
        "reg_loss": reg_loss,
        "dir_loss": dir_loss,
        "num_pos": positives.sum(),
    }


def _maxpool2d(x, k):
    """(B, H, W, 1) max pool with stride k."""
    if k == 1:
        return x
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, k, k, 1), "VALID"
    )


def pyramid_occupancy_loss(occ_maps, label_dict, cfg: LossCfg):
    """Per-level occupancy supervision on the EGO agent's pre-fusion maps.

    occ_maps: list of (B, L, hi, wi, 1) (per-agent); we supervise the ego
    slot (index 0) with the ego-frame labels. (The reference supervises all
    agents with per-agent labels; extending to that needs per-agent GT which
    the trainer provides when available via labels_per_agent.)
    """
    labels = label_dict["labels"]                   # (B, h, w, S)
    pos = (labels > 0).any(axis=-1, keepdims=True).astype(jnp.float32)
    neg = (labels == 0).all(axis=-1, keepdims=True).astype(jnp.float32)
    B = labels.shape[0]
    total = 0.0
    for i, occ in enumerate(occ_maps):
        k = cfg.pyramid_downsample[i]
        pos_l = _maxpool2d(pos, k)
        neg_l = 1.0 - _maxpool2d(1.0 - neg, k)
        occ_ego = occ[:, 0].astype(jnp.float32)      # (B, hi, wi, 1)
        pos_norm = jnp.clip(pos_l.reshape(B, -1).sum(axis=1), 1.0)[:, None, None, None]
        w = (pos_l * cfg.pos_cls_weight + neg_l) / pos_norm
        loss = sigmoid_focal_loss(occ_ego, pos_l, w, cfg.alpha, cfg.gamma)
        total = total + loss.sum() / B * cfg.pyramid_weight[i]
    return total
