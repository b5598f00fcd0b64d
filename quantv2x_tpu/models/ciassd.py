"""CIA-SSD: single-stage detector with IoU-aware confidence rectification.

TPU-native re-design of:
  - models/ciassd.py:11-46 (MeanVFE -> sparse 3D backbone -> height
    compression -> SSFA -> Head) — the sparse conv stack is replaced by
    this repo's dense-on-capped-grid SECONDEncoder;
  - models/sub_modules/cia_ssd_utils.py:6-60 (SSFA: two bottom-up blocks,
    spatial/channel attention-weighted fusion of the two scales);
  - models/sub_modules/cia_ssd_utils.py:81-100 (Head: 1x1 box/cls/iou
    (+dir) convs);
  - loss/ciassd_loss.py:24-110 (focal cls + sin smooth-L1 reg + dir CE +
    IoU head regressed to 2*IoU(pred, gt)-1 on positives). The reference
    gathers a dynamic positive set; here positives are gathered into a
    fixed top-K slot buffer so the whole loss jits.

Confidence rectification at decode (the CIA-SSD trick): the exported
score is cls^(1-beta) * iou^beta, suppressing overconfident
badly-localized boxes.
"""

import dataclasses


import flax.linen as nn
import jax
import jax.numpy as jnp

from quantv2x_tpu.data.anchors import decode_deltas
from quantv2x_tpu.loss.detection_loss import weighted_smooth_l1
from quantv2x_tpu.models.layers import ConvBNReLU, DeconvBNReLU
from quantv2x_tpu.models.second_encoder import SECONDEncoder, SecondCfg
from quantv2x_tpu.utils.box_utils import iou_matrix_3d


class SSFA(nn.Module):
    """Spatial-semantic feature aggregation (cia_ssd_utils.py:6-60).

    Bottom-up 128-ch (spatial) and stride-2 256-ch (semantic) groups;
    the semantic group is deconvolved back and the two are blended by a
    per-pixel 2-way softmax attention.
    """
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        h = x
        for i in range(3):
            h = ConvBNReLU(128, 3, dtype=dt, name=f"bottom0_{i}")(h, train)
        x0 = h
        h = ConvBNReLU(128, 3, strides=2, dtype=dt, name="bottom1_0")(
            x0, train)
        for i in range(1, 3):
            h = ConvBNReLU(256, 3, dtype=dt, name=f"bottom1_{i}")(h, train)
        x1 = h
        t0 = ConvBNReLU(128, 1, dtype=dt, name="trans0")(x0, train)
        t1 = ConvBNReLU(256, 1, dtype=dt, name="trans1")(x1, train)
        up0 = DeconvBNReLU(128, 2, dtype=dt, name="deconv0")(t1, train)
        mid0 = up0 + t0
        mid1 = DeconvBNReLU(128, 2, dtype=dt, name="deconv1")(t1, train)
        out0 = ConvBNReLU(128, 3, dtype=dt, name="conv0")(mid0, train)
        out1 = ConvBNReLU(128, 3, dtype=dt, name="conv1")(mid1, train)
        w0 = ConvBNReLU(1, 1, act=False, dtype=dt, name="w0")(out0, train)
        w1 = ConvBNReLU(1, 1, act=False, dtype=dt, name="w1")(out1, train)
        w = jax.nn.softmax(jnp.concatenate([w0, w1], axis=-1), axis=-1)
        return out0 * w[..., :1] + out1 * w[..., 1:]


class CIASSDHead(nn.Module):
    """1x1 box/cls/iou (+dir) heads (cia_ssd_utils.py:81-100)."""
    anchor_num: int = 2
    num_class: int = 1
    num_dir_bins: int = 2
    use_dir: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        S = self.anchor_num * self.num_class
        reg = nn.Conv(S * 7, (1, 1), dtype=self.dtype, name="conv_box")(x)
        cls = nn.Conv(S, (1, 1), dtype=self.dtype, name="conv_cls")(x)
        iou = nn.Conv(S, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv_iou")(x)
        out = {"reg_preds": reg.astype(jnp.float32),
               "cls_preds": cls.astype(jnp.float32),
               "iou_preds": iou.astype(jnp.float32)}
        if self.use_dir:
            dirp = nn.Conv(S * self.num_dir_bins, (1, 1), dtype=self.dtype,
                           name="conv_dir")(x)
            out["dir_preds"] = dirp.astype(jnp.float32)
        return out


@dataclasses.dataclass(frozen=True)
class CiassdCfg:
    second: SecondCfg
    anchor_num: int = 2
    num_class: int = 1
    num_dir_bins: int = 2
    dtype: str = "float32"


class CIASSD(nn.Module):
    """Single-agent CIA-SSD (ciassd.py:11-46): voxels -> preds dict.

    ``return_feat=True`` also returns the SSFA neck BEV map (1,H,W,128)
    — FPV-RCNN's VSA keypoint stage conditions on it.
    """
    cfg: CiassdCfg

    @nn.compact
    def __call__(self, voxels, train: bool = False, return_feat: bool = False):
        dt = jnp.dtype(self.cfg.dtype)
        bev = SECONDEncoder(self.cfg.second, dtype=dt, name="encoder")(
            voxels, train)[None]                       # (1, H, W, C)
        feat = SSFA(dtype=dt, name="ssfa")(bev, train)
        out = CIASSDHead(
            self.cfg.anchor_num, self.cfg.num_class, self.cfg.num_dir_bins,
            dtype=dt, name="head")(feat)
        if return_feat:
            return out, feat
        return out


def _gather_topk_positives(weights, k):
    """Indices of the k largest-weight slots (the positives; padded slots
    carry weight 0 and are masked by the returned weights)."""
    w, idx = jax.lax.top_k(weights, k)
    return idx, w


def ciassd_iou_loss(outputs, label_dict, anchors, weight: float = 1.0,
                    sigma: float = 3.0, max_pos: int = 256):
    """IoU-head loss: smooth-L1(iou_pred, 2*IoU3D(dec(pred), dec(gt)) - 1)
    over positives (ciassd_loss.py:81-100), fixed top-K positive slots.

    anchors: (h, w, S, 7) grid from generate_anchors.
    """
    labels = label_dict["labels"]
    B = labels.shape[0]
    lab = labels.reshape(B, -1)
    positives = (lab > 0).astype(jnp.float32)
    pos_norm = jnp.clip(positives.sum(axis=1, keepdims=True), 1.0)
    reg_w = positives / pos_norm

    anchors_flat = jnp.asarray(anchors).reshape(-1, 7)
    reg_preds = outputs["reg_preds"].astype(jnp.float32).reshape(B, -1, 7)
    reg_tgts = label_dict["targets"].reshape(B, -1, 7)
    iou_preds = outputs["iou_preds"].astype(jnp.float32).reshape(B, -1)

    def per_sample(rp, rt, ip, w):
        idx, wk = _gather_topk_positives(w, max_pos)
        boxes_p = decode_deltas(rp[idx], anchors_flat[idx])
        boxes_t = decode_deltas(rt[idx], anchors_flat[idx])
        # aligned (diagonal) 3D IoU on the K matched pairs; decode_deltas
        # emits hwl-ordered boxes
        iou = jax.vmap(
            lambda a, b: iou_matrix_3d(a[None], b[None],
                                       order_a="hwl", order_b="hwl")[0, 0]
        )(jax.lax.stop_gradient(boxes_p), boxes_t)
        tgt = 2.0 * iou - 1.0
        return weighted_smooth_l1(
            ip[idx][:, None], tgt[:, None], wk[:, None], sigma).sum()

    loss = jax.vmap(per_sample)(reg_preds, reg_tgts, iou_preds, reg_w)
    return loss.sum() / B * weight


def rectify_scores(cls_scores, iou_preds, beta: float = 0.5):
    """CIA-SSD confidence rectification: score' = cls^(1-b) * iou^b,
    with the iou head output mapped back from [-1, 1] to [0, 1]."""
    iou = jnp.clip((iou_preds + 1.0) * 0.5, 1e-6, 1.0)
    return cls_scores ** (1.0 - beta) * iou ** beta
