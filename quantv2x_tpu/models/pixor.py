"""PIXOR: anchor-free single-shot BEV detector (dense per-pixel heads).

TPU-native re-design of the reference PIXOR family:
  - models/pixor.py:19-310 (Bottleneck FPN backbone [3,6,6,3] + 4-conv
    header with 1-ch cls / 6-ch reg maps at stride 4);
  - data_utils/pre_processor/bev_preprocessor.py:22-58 (height-slice
    occupancy raster + mean-intensity channel) — here a vectorized jnp
    scatter instead of the reference's per-point Python loop;
  - data_utils/post_processor/bev_postprocessor.py:34-193 (dense label
    map [cls, cos, sin, dx, dy, log_w, log_l], target normalization) —
    here a fixed-shape pixels x boxes containment test instead of a
    per-box Python loop;
  - loss/pixor_loss.py:40-65 (BCE cls + positive-masked smooth-L1 reg).

Everything is static-shape and jittable; the raster, label map, loss and
decode are pure functions so the training step fuses end to end.
"""

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from quantv2x_tpu.models.layers import ConvBNReLU


@dataclasses.dataclass(frozen=True)
class PixorCfg:
    lidar_range: Tuple[float, ...] = (-35.2, -35.2, -3.0, 35.2, 35.2, 1.0)
    res: float = 0.2                  # BEV cell size (geometry_param.res)
    downsample_rate: int = 4          # label map stride (stride-4 output)
    use_bn: bool = True
    # label-map target normalization (bev_postprocessor.py:24-29 defaults)
    target_mean: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    target_std: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    default_z: float = -1.0           # center z for decoded 2D boxes
    default_h: float = 1.7            # box height for decoded 2D boxes
    dtype: str = "float32"

    @property
    def bev_hw(self):
        H = int(round((self.lidar_range[3] - self.lidar_range[0]) / self.res))
        W = int(round((self.lidar_range[4] - self.lidar_range[1]) / self.res))
        return H, W

    @property
    def z_bins(self):
        return int(round(
            (self.lidar_range[5] - self.lidar_range[2]) / self.res))

    @property
    def label_hw(self):
        H, W = self.bev_hw
        return H // self.downsample_rate, W // self.downsample_rate


def bev_occupancy_raster(points, mask, cfg: PixorCfg):
    """Points (P,4) -> (H, W, z_bins+1) occupancy slices + mean intensity.

    Parity: bev_preprocessor.py:35-53; the per-point loop becomes two
    scatters (occupancy max, intensity sum/count).
    """
    H, W = cfg.bev_hw
    Z = cfg.z_bins
    xi = jnp.floor((points[:, 0] - cfg.lidar_range[0]) / cfg.res).astype(
        jnp.int32)
    yi = jnp.floor((points[:, 1] - cfg.lidar_range[1]) / cfg.res).astype(
        jnp.int32)
    zi = jnp.floor((points[:, 2] - cfg.lidar_range[2]) / cfg.res).astype(
        jnp.int32)
    inb = (mask & (xi >= 0) & (xi < H) & (yi >= 0) & (yi < W)
           & (zi >= 0) & (zi < Z))
    # out-of-range points scatter to a trash cell (H*W*Z) that is dropped
    flat_zyx = jnp.where(inb, (xi * W + yi) * Z + zi, H * W * Z)
    occ = jnp.zeros(H * W * Z + 1, jnp.float32).at[flat_zyx].max(
        inb.astype(jnp.float32))[:-1].reshape(H, W, Z)
    flat_xy = jnp.where(inb, xi * W + yi, H * W)
    inten_sum = jnp.zeros(H * W + 1, jnp.float32).at[flat_xy].add(
        jnp.where(inb, points[:, 3], 0.0))[:-1]
    counts = jnp.zeros(H * W + 1, jnp.float32).at[flat_xy].add(
        inb.astype(jnp.float32))[:-1]
    inten = (inten_sum / jnp.maximum(counts, 1.0)).reshape(H, W, 1)
    return jnp.concatenate([occ, inten], axis=-1)


class PixorBottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck, expansion 4 (pixor.py:51-103)."""
    planes: int
    strides: int = 1
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = 4 * self.planes
        residual = x
        y = ConvBNReLU(self.planes, 1, use_bn=self.use_bn,
                       use_bias=not self.use_bn, dtype=self.dtype,
                       name="conv1")(x, train)
        y = ConvBNReLU(self.planes, 3, strides=self.strides,
                       use_bn=self.use_bn, use_bias=not self.use_bn,
                       dtype=self.dtype, name="conv2")(y, train)
        y = ConvBNReLU(out_ch, 1, use_bn=self.use_bn,
                       use_bias=not self.use_bn, act=False,
                       dtype=self.dtype, name="conv3")(y, train)
        if self.strides != 1 or x.shape[-1] != out_ch:
            residual = ConvBNReLU(out_ch, 1, strides=self.strides,
                                  use_bn=self.use_bn,
                                  use_bias=not self.use_bn, act=False,
                                  dtype=self.dtype, name="down")(x, train)
        return nn.relu(residual + y)


class PixorBackbone(nn.Module):
    """Stem + 4 bottleneck stages + FPN top-down decode (pixor.py:107-212).

    Stages [3,6,6,3] blocks at planes [24,48,64,96] (x4 expansion), each
    stage stride 2; decode laterals c5/c4/c3 -> stride-4 p4 map (96 ch).
    """
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, fuse_cb=None):
        """fuse_cb(feat, level_name) -> feat, applied to c3/c4/c5 before
        the top-down decode — the intermediate-fusion insertion point
        (any submodule the callback calls nests under this backbone)."""
        if fuse_cb is None:
            fuse_cb = lambda f, _name: f  # noqa: E731
        bias = not self.use_bn
        x = ConvBNReLU(32, 3, use_bn=self.use_bn, use_bias=bias,
                       dtype=self.dtype, name="stem1")(x, train)
        c1 = ConvBNReLU(32, 3, use_bn=self.use_bn, use_bias=bias,
                        dtype=self.dtype, name="stem2")(x, train)

        def stage(h, planes, blocks, name):
            h = PixorBottleneck(planes, strides=2, use_bn=self.use_bn,
                                dtype=self.dtype, name=f"{name}_0")(h, train)
            for i in range(1, blocks):
                h = PixorBottleneck(planes, use_bn=self.use_bn,
                                    dtype=self.dtype,
                                    name=f"{name}_{i}")(h, train)
            return h

        c2 = stage(c1, 24, 3, "block2")
        c3 = stage(c2, 48, 6, "block3")
        c4 = stage(c3, 64, 6, "block4")
        c5 = stage(c4, 96, 3, "block5")
        # taps feed the LATERALS only; stages keep the per-agent stream
        f3 = fuse_cb(c3, "fusion3")
        f4 = fuse_cb(c4, "fusion4")
        f5 = fuse_cb(c5, "fusion5")

        l5 = nn.Conv(196, (1, 1), dtype=self.dtype, name="lat5")(f5)
        l4 = nn.Conv(128, (1, 1), dtype=self.dtype, name="lat4")(f4)
        p5 = l4 + nn.ConvTranspose(128, (2, 2), strides=(2, 2),
                                   dtype=self.dtype, name="deconv1")(l5)
        l3 = nn.Conv(96, (1, 1), dtype=self.dtype, name="lat3")(f3)
        p4 = l3 + nn.ConvTranspose(96, (2, 2), strides=(2, 2),
                                   dtype=self.dtype, name="deconv2")(p5)
        return p4


class PixorHeader(nn.Module):
    """4 shared 3x3 convs -> 1-ch cls + 6-ch reg (pixor.py:216-250)."""
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(4):
            x = ConvBNReLU(96, 3, use_bn=self.use_bn,
                           use_bias=not self.use_bn, act=False,
                           dtype=self.dtype, name=f"conv{i + 1}")(x, train)
        cls = nn.Conv(
            1, (3, 3), padding="SAME", dtype=self.dtype,
            bias_init=nn.initializers.constant(-4.595),  # focal prior 0.01
            name="cls_head")(x)
        reg = nn.Conv(6, (3, 3), padding="SAME", dtype=self.dtype,
                      kernel_init=nn.initializers.zeros, name="reg_head")(x)
        return cls, reg


class PIXOR(nn.Module):
    """bev_input (H, W, C) or (B, H, W, C) -> {'cls','reg'} stride-4 maps."""
    cfg: PixorCfg

    @nn.compact
    def __call__(self, bev_input, train: bool = False):
        dt = jnp.dtype(self.cfg.dtype)
        squeeze = bev_input.ndim == 3
        if squeeze:
            bev_input = bev_input[None]
        feat = PixorBackbone(self.cfg.use_bn, dtype=dt, name="backbone")(
            bev_input.astype(dt), train)
        cls, reg = PixorHeader(self.cfg.use_bn, dtype=dt, name="header")(
            feat, train)
        if squeeze:
            cls, reg = cls[0], reg[0]
        return {"cls": cls.astype(jnp.float32),
                "reg": reg.astype(jnp.float32)}


def pixor_label_map(boxes, box_mask, cfg: PixorCfg):
    """Dense (h, w, 7) label map from GT boxes (N,7 xyzlwh+yaw).

    Channels: [cls, cos, sin, dx, dy, log_w, log_l]; a pixel takes the
    targets of the first GT box containing it (bev_postprocessor.py:82-144).
    """
    h, w = cfg.label_hw
    stride = cfg.res * cfg.downsample_rate
    px = cfg.lidar_range[0] + (jnp.arange(h) + 0.0) * stride
    py = cfg.lidar_range[1] + (jnp.arange(w) + 0.0) * stride
    gx, gy = jnp.meshgrid(px, py, indexing="ij")       # (h, w)
    pts = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # (P, 2)

    cx, cy = boxes[:, 0], boxes[:, 1]
    length, width = boxes[:, 3], boxes[:, 4]
    yaw = boxes[:, 6]
    # rotate pixel into each box frame: (P, N)
    dx = pts[:, :1] - cx[None, :]
    dy = pts[:, 1:2] - cy[None, :]
    c, s = jnp.cos(yaw)[None, :], jnp.sin(yaw)[None, :]
    lx = dx * c + dy * s
    ly = -dx * s + dy * c
    inside = ((jnp.abs(lx) <= length[None, :] / 2)
              & (jnp.abs(ly) <= width[None, :] / 2)
              & box_mask[None, :])
    owner = jnp.argmax(inside, axis=1)                 # first containing box
    pos = inside.any(axis=1)

    ob = boxes[owner]                                  # (P, 7)
    oyaw = ob[:, 6]
    reg = jnp.stack([
        jnp.cos(oyaw), jnp.sin(oyaw),
        ob[:, 0] - pts[:, 0], ob[:, 1] - pts[:, 1],
        jnp.log(jnp.maximum(ob[:, 4], 1e-3)),
        jnp.log(jnp.maximum(ob[:, 3], 1e-3)),
    ], axis=-1)
    mean = jnp.asarray(cfg.target_mean)
    std = jnp.asarray(cfg.target_std)
    reg = (reg - mean) / std
    reg = jnp.where(pos[:, None], reg, 0.0)
    lm = jnp.concatenate([pos[:, None].astype(jnp.float32), reg], axis=-1)
    return lm.reshape(h, w, 7)


def _smooth_l1(diff):
    ad = jnp.abs(diff)
    return jnp.where(ad < 1.0, 0.5 * diff ** 2, ad - 0.5)


def pixor_loss(outputs, label_map, alpha: float = 1.0, beta: float = 1.0):
    """BCE-with-logits cls (mean) + positive-masked smooth-L1 reg
    (sum / #pos). Parity: pixor_loss.py:40-65."""
    cls_t = label_map[..., :1]
    reg_t = label_map[..., 1:]
    logits = outputs["cls"].astype(jnp.float32)
    cls_loss = jnp.mean(
        jnp.maximum(logits, 0) - logits * cls_t
        + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    pos = jnp.maximum(cls_t.sum(), 1.0)
    reg_loss = _smooth_l1(
        cls_t * (outputs["reg"].astype(jnp.float32) - reg_t)).sum() / pos
    total = alpha * cls_loss + beta * reg_loss
    return total, {"cls_loss": cls_loss, "reg_loss": reg_loss}


def decode_pixor(outputs, cfg: PixorCfg, top_k: int = 256):
    """Dense maps -> top-k candidate boxes (K,7) + scores (K,).

    Parity: bev_postprocessor.post_process:221-298 (denormalize, per-pixel
    box assembly, confidence sort); NMS is left to utils.box_utils so the
    caller composes with the shared eval path.
    """
    cls = jax.nn.sigmoid(outputs["cls"][..., 0].astype(jnp.float32))
    reg = outputs["reg"].astype(jnp.float32)
    mean = jnp.asarray(cfg.target_mean)
    std = jnp.asarray(cfg.target_std)
    reg = reg * std + mean
    h, w = cls.shape
    stride = cfg.res * cfg.downsample_rate
    px = cfg.lidar_range[0] + jnp.arange(h) * stride
    py = cfg.lidar_range[1] + jnp.arange(w) * stride
    gx, gy = jnp.meshgrid(px, py, indexing="ij")
    yaw = jnp.arctan2(reg[..., 1], reg[..., 0])
    boxes = jnp.stack([
        gx + reg[..., 2], gy + reg[..., 3],
        jnp.full_like(gx, cfg.default_z),
        jnp.exp(reg[..., 5]), jnp.exp(reg[..., 4]),
        jnp.full_like(gx, cfg.default_h), yaw,
    ], axis=-1).reshape(-1, 7)
    scores, idx = jax.lax.top_k(cls.ravel(), top_k)
    return boxes[idx], scores


class PIXORIntermediate(nn.Module):
    """Intermediate-fusion PIXOR (pixor_intermediate.py:20-95): the FPN
    levels c3/c4/c5 are fused across agents with per-level AttFusion
    before top-down decoding. Inputs are per-agent ego-frame BEV rasters
    (proj-first), so the fusion affine is identity.

    bev_inputs (B, L, H, W, C), agent_mask (B, L) -> {'cls','reg'}.
    """
    cfg: PixorCfg

    @nn.compact
    def __call__(self, bev_inputs, agent_mask, train: bool = False):
        from quantv2x_tpu.models.fusion_lib import AttFusion

        dt = jnp.dtype(self.cfg.dtype)
        B, L = bev_inputs.shape[:2]
        flat = bev_inputs.reshape((B * L,) + bev_inputs.shape[2:]).astype(dt)

        def fuse(feat, name):
            # (B*L, h, w, ch) per-agent lateral -> AttFusion across agents
            # (proj-first rasters: identity fusion affine)
            _, h, w, ch = feat.shape
            grouped = feat.reshape(B, L, h, w, ch)
            ident = jnp.tile(
                jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
                (B, L, L, 1, 1))
            return AttFusion(ch, dtype=dt, name=name)(
                grouped, agent_mask, ident, train)

        p4 = PixorBackbone(self.cfg.use_bn, dtype=dt, name="backbone")(
            flat, train, fuse_cb=fuse)
        cls, reg = PixorHeader(self.cfg.use_bn, dtype=dt, name="header")(
            p4, train)
        return {"cls": cls.astype(jnp.float32),
                "reg": reg.astype(jnp.float32)}
