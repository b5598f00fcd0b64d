"""Lift-Splat-Shoot camera encoder (flax, static-shape splat).

Parity: heter_encoders.LiftSplatShoot:83-300 + sub_modules/lss_submodule.py
(CamEncode): per-camera image -> conv backbone -> per-pixel depth
distribution (D bins, softmax) x feature vector; frustum points projected
into the ego frame and splatted onto the BEV grid.

TPU re-design: the reference's QuickCumsum (sort + cumsum trick over a
dynamic point list) becomes a fixed-shape scatter-add — every frustum cell
has a precomputable BEV index (out-of-range cells drop), so the splat is a
single `.at[idx].add(feats)` with static shapes, and XLA fuses the
depth-weighted outer product into the gather/scatter.
"""

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from quantv2x_tpu.models.layers import ConvBNReLU, ResNetModified


@dataclasses.dataclass(frozen=True)
class LSSCfg:
    lidar_range: tuple                      # BEV extent (x1,y1,z1,x2,y2,z2)
    bev_resolution: float = 0.8             # metres per BEV cell
    image_size: tuple = (128, 352)          # (H, W) after resize
    feat_stride: int = 8                    # backbone downsample
    depth_bins: tuple = (1.0, 60.0, 1.0)    # (min, max, step)
    out_channels: int = 64

    @property
    def num_depth(self):
        lo, hi, step = self.depth_bins
        return int((hi - lo) / step)

    @property
    def bev_size(self):
        x1, y1, _, x2, y2, _ = self.lidar_range
        W = int(round((x2 - x1) / self.bev_resolution))
        H = int(round((y2 - y1) / self.bev_resolution))
        return H, W

    @property
    def feat_hw(self):
        return (self.image_size[0] // self.feat_stride,
                self.image_size[1] // self.feat_stride)


def create_frustum(cfg: LSSCfg):
    """(D, fH, fW, 3) image-plane points (u, v, depth) — parity
    heter_encoders.py:110-123."""
    iH, iW = cfg.image_size
    fH, fW = cfg.feat_hw
    lo, hi, step = cfg.depth_bins
    ds = np.arange(lo, hi, step, dtype=np.float32)[:, None, None]
    D = ds.shape[0]
    xs = np.linspace(0, iW - 1, fW, dtype=np.float32)[None, None, :]
    ys = np.linspace(0, iH - 1, fH, dtype=np.float32)[None, :, None]
    frustum = np.stack(
        [np.broadcast_to(xs, (D, fH, fW)),
         np.broadcast_to(ys, (D, fH, fW)),
         np.broadcast_to(ds, (D, fH, fW))], axis=-1,
    )
    return jnp.asarray(frustum)


def frustum_to_ego(frustum, intrinsics, cam2ego_rot, cam2ego_trans):
    """Image-plane frustum -> 3D points in the ego frame
    (parity: get_geometry, heter_encoders.py:125-147).

    intrinsics: (3, 3); cam2ego_rot: (3, 3); cam2ego_trans: (3,).
    """
    u, v, d = frustum[..., 0], frustum[..., 1], frustum[..., 2]
    pts_cam = jnp.stack([u * d, v * d, d], axis=-1)     # unnormalize
    inv_k = jnp.linalg.inv(intrinsics)
    pts_cam = pts_cam @ inv_k.T
    return pts_cam @ cam2ego_rot.T + cam2ego_trans


class CamEncode(nn.Module):
    """Image backbone -> (D + C) maps; depth softmax x features
    (parity: lss_submodule.CamEncode)."""
    depth_bins: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False):
        """img: (H, W, 3) -> (D, fH, fW, C)."""
        x = img[None]
        x = ConvBNReLU(32, 7, 2, dtype=self.dtype, name="stem")(x, train)
        # stem /2 x trunk strides (2, 2, 2): the fused scale (stage 1) sits
        # at the frustum's feat_stride of 8
        feats = ResNetModified(
            (2, 2, 2), (2, 2, 2), (32, 64, 128), dtype=self.dtype,
            name="trunk",
        )(x, train)
        # fuse last two scales (upsample deepest)
        f2, f3 = feats[-2], feats[-1]
        f3u = jax.image.resize(f3, f2.shape[:3] + (f3.shape[-1],), "bilinear")
        x = jnp.concatenate([f2, f3u], axis=-1)
        x = ConvBNReLU(128, 3, dtype=self.dtype, name="neck")(x, train)
        head = nn.Conv(self.depth_bins + self.out_channels, (1, 1),
                       dtype=self.dtype, name="depth_head")(x)[0]
        depth = jax.nn.softmax(head[..., : self.depth_bins], axis=-1)
        feat = head[..., self.depth_bins:]
        # outer product: (fH, fW, D, 1) * (fH, fW, 1, C) -> (D, fH, fW, C)
        vol = depth[..., :, None] * feat[..., None, :]
        return vol.transpose(2, 0, 1, 3), depth


def voxel_pool(points_ego, volume, cfg: LSSCfg):
    """Splat frustum features onto the BEV grid (static scatter-add).

    points_ego: (D, fH, fW, 3); volume: (D, fH, fW, C) -> (H, W, C).
    """
    H, W = cfg.bev_size
    x1, y1, z1, x2, y2, z2 = cfg.lidar_range
    gx = jnp.floor((points_ego[..., 0] - x1) / cfg.bev_resolution).astype(jnp.int32)
    gy = jnp.floor((points_ego[..., 1] - y1) / cfg.bev_resolution).astype(jnp.int32)
    ok = (
        (points_ego[..., 0] >= x1) & (points_ego[..., 0] < x2)
        & (points_ego[..., 1] >= y1) & (points_ego[..., 1] < y2)
        & (points_ego[..., 2] >= z1) & (points_ego[..., 2] < z2)
    )
    gy = jnp.where(ok, gy, H)          # drop out-of-range
    gx = jnp.clip(gx, 0, W - 1)
    canvas = jnp.zeros((H, W, volume.shape[-1]), volume.dtype)
    return canvas.at[gy.reshape(-1), gx.reshape(-1)].add(
        jnp.where(ok[..., None], volume, 0.0).reshape(-1, volume.shape[-1]),
        mode="drop",
    )


class LSSEncoder(nn.Module):
    """Multi-camera LSS -> BEV features (H, W, out_channels)."""
    cfg: LSSCfg
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, intrinsics, cam2ego_rots, cam2ego_trans,
                 train: bool = False):
        """images: (N_cam, H, W, 3); intrinsics: (N_cam, 3, 3);
        cam2ego_rots: (N_cam, 3, 3); cam2ego_trans: (N_cam, 3)."""
        cfg = self.cfg
        frustum = create_frustum(cfg)
        cam_enc = CamEncode(cfg.num_depth, cfg.out_channels,
                            dtype=self.dtype, name="cam_encode")
        H, W = cfg.bev_size
        bev = jnp.zeros((H, W, cfg.out_channels), self.dtype)
        for n in range(images.shape[0]):
            vol, _ = cam_enc(images[n], train)
            pts = frustum_to_ego(frustum, intrinsics[n], cam2ego_rots[n],
                                 cam2ego_trans[n])
            bev = bev + voxel_pool(pts, vol, cfg)
        return ConvBNReLU(cfg.out_channels, 3, dtype=self.dtype,
                          name="bev_out")(bev[None], train)[0]
