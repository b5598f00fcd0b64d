"""Auxiliary loss family: uncertainty (KL), DiscoNet KD, LSS depth.

Parity targets:
  - loss/point_pillar_uncertainty_loss.py:195-290 (KLLoss: l1/l2 xy terms
    0.5·e^{-s}·d(+²) + s, von-Mises angular term with i0e, dims 2/3/7);
  - loss/point_pillar_disconet_loss.py:16-70 (channel-softmax KL divergence
    between student and teacher BEV features, optional decoder KD);
  - loss/point_pillar_depth_loss.py:27-53 (focal loss on depth-bin logits
    against gt bin indices, optional foreground mask).

All functions use this codebase's channel-last layouts and the label dict
from anchors.assign_targets.
"""

import dataclasses

import jax
import jax.numpy as jnp

from quantv2x_tpu.loss.detection_loss import add_sin_difference


@dataclasses.dataclass(frozen=True)
class UncertaintyCfg:
    dim: int = 3                 # 2 = x,y; 3 = x,y,yaw; 7 = full box
    weight: float = 1.0
    angle_weight: float = 1.0
    xy_loss_type: str = "l1"     # "l1" | "l2"
    angle_loss_type: str = "von-mise"   # "l2" | "von-mise"
    lambda_v: float = 0.001
    s0: float = 1.0


def _kl_l2(diff, s):
    return 0.5 * (jnp.exp(-s) * diff ** 2 + s)


def _kl_l1(diff, s):
    return 0.5 * jnp.exp(-s) * jnp.abs(diff) + s


def _kl_angular(diff, s, lambda_v, s0):
    """von-Mises NLL with concentration kappa = e^{-s}
    (kl_loss_angular:243-260; i0e(k)·e^k = I0(k) numerically stable)."""
    kappa = jnp.exp(-s)
    log_i0 = jnp.log(jax.scipy.special.i0e(kappa)) + kappa
    return log_i0 - kappa * jnp.cos(diff) + lambda_v * jax.nn.elu(s - s0)


def uncertainty_loss(outputs, label_dict, cfg: UncertaintyCfg):
    """KL regression-uncertainty loss on the unc_preds log-variance head.

    outputs: reg_preds (B,h,w,S*7), unc_preds (B,h,w,S*dim);
    label_dict: labels (B,h,w,S), targets (B,h,w,S,7).
    """
    labels = label_dict["labels"]
    B = labels.shape[0]
    lab = labels.reshape(B, -1)
    targets = label_dict["targets"].reshape(B, -1, 7)
    positives = lab > 0
    pos_norm = jnp.clip(
        positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0)
    reg_w = positives.astype(jnp.float32) / pos_norm

    reg_preds = outputs["reg_preds"].astype(jnp.float32).reshape(B, -1, 7)
    s = outputs["unc_preds"].astype(jnp.float32).reshape(B, -1, cfg.dim)
    rp, rt = add_sin_difference(reg_preds, targets)

    xy_fn = _kl_l2 if cfg.xy_loss_type == "l2" else _kl_l1
    if cfg.angle_loss_type == "l2":
        ang_fn = lambda d, sv: _kl_l2(d, sv)
    else:
        ang_fn = lambda d, sv: _kl_angular(d, sv, cfg.lambda_v, cfg.s0)

    if cfg.dim == 2:
        loss = xy_fn(rp[..., :2] - rt[..., :2], s)
    elif cfg.dim == 3:
        l_xy = xy_fn(rp[..., :2] - rt[..., :2], s[..., :2])
        # raw yaw difference for the angular term (reference keeps channel 7
        # pre-sin-encoding: reg_preds_w_angle[...,7:8])
        d_yaw = reg_preds[..., 6:7] - targets[..., 6:7]
        l_ang = cfg.angle_weight * ang_fn(d_yaw, s[..., 2:3])
        loss = jnp.concatenate([l_xy, l_ang], axis=-1)
    else:  # 7
        d = jnp.concatenate(
            [rp[..., :6] - rt[..., :6],
             reg_preds[..., 6:7] - targets[..., 6:7]], axis=-1)
        loss = xy_fn(d, s)
    return (loss * reg_w[..., None]).sum() / B * cfg.weight


def disconet_kd_loss(student_feature, teacher_feature, weight: float = 1.0,
                     student_heads=None, teacher_heads=None):
    """Channel-softmax KL(teacher ‖ student) averaged over pixels
    (point_pillar_disconet_loss.py:35-66).

    features: (..., C) channel-last BEV maps; optional head pairs add the
    decoder_kd terms (each a (student, teacher) logits tuple).
    """
    def kl_mean_elements(stu, tea):
        # KLDivLoss(size_average=True) parity: mean over ALL elements
        C = tea.shape[-1]
        p = jax.nn.softmax(tea.reshape(-1, C).astype(jnp.float32), axis=-1)
        logq = jax.nn.log_softmax(stu.reshape(-1, C).astype(jnp.float32),
                                  axis=-1)
        logp = jax.nn.log_softmax(tea.reshape(-1, C).astype(jnp.float32),
                                  axis=-1)
        return (p * (logp - logq)).mean()

    total = kl_mean_elements(student_feature, teacher_feature)
    if student_heads is not None:
        for stu, tea in zip(student_heads, teacher_heads):
            total = total + kl_mean_elements(stu, tea)
    return total * weight


def depth_focal_loss(depth_logits, depth_gt_indices, weight: float = 1.0,
                     fg_mask=None, alpha: float = 0.25, gamma: float = 2.0):
    """Focal CE over depth bins (point_pillar_depth_loss.py:39-53).

    depth_logits: (N, H, W, D) channel-last bin logits;
    depth_gt_indices: (N, H, W) int gt bin per pixel;
    fg_mask: optional (N, H, W) weighting (use_fg_mask path).
    """
    logp = jax.nn.log_softmax(depth_logits.astype(jnp.float32), axis=-1)
    gt = jnp.take_along_axis(
        logp, depth_gt_indices[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    pt = jnp.exp(gt)
    loss = -alpha * (1.0 - pt) ** gamma * gt
    if fg_mask is not None:
        loss = loss * fg_mask
    return loss.mean() * weight


def clip_loss(emb1, emb2, logit_scale, weight: float = 1.0):
    """Symmetric InfoNCE between two modality embedding sets
    (loss/clip_loss.py:7-31: L2-normalize, scaled similarity logits,
    cross-entropy against the diagonal matching, averaged both ways).

    emb1/emb2: (N, D); logit_scale: scalar log-temperature parameter.
    """
    e1 = emb1 / jnp.maximum(
        jnp.linalg.norm(emb1, axis=1, keepdims=True), 1e-8)
    e2 = emb2 / jnp.maximum(
        jnp.linalg.norm(emb2, axis=1, keepdims=True), 1e-8)
    logits = jnp.exp(logit_scale) * (
        e1.astype(jnp.float32) @ e2.astype(jnp.float32).T)
    n = logits.shape[0]
    targets = jnp.arange(n)
    lp1 = jax.nn.log_softmax(logits, axis=-1)
    lp2 = jax.nn.log_softmax(logits.T, axis=-1)
    ce = -(lp1[targets, targets].mean() + lp2[targets, targets].mean()) / 2
    return ce * weight
