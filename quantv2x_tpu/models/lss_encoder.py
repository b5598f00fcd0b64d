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
    # image trunk (parity: CamEncode_Resnet101, lss_submodule.py:140-202,
    # runs resnet101 layer1-3 bottleneck stages and fuses the last two
    # scales). Default mirrors that 3-stage bottleneck structure at
    # TPU-budget width; ("basic", (2, 2, 2), (32, 64, 128)) recovers the
    # small trunk for tests.
    trunk_block: str = "bottleneck"
    trunk_blocks: tuple = (3, 4, 6)
    trunk_filters: tuple = (64, 128, 256)

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
    (parity: lss_submodule.CamEncode_Resnet101:140-202 — bottleneck
    trunk, last-two-scale fusion 'Up' module, depthnet head). Batched:
    one conv pass for every camera of every agent."""
    depth_bins: int
    out_channels: int
    trunk_block: str = "bottleneck"
    trunk_blocks: tuple = (3, 4, 6)
    trunk_filters: tuple = (64, 128, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, imgs, train: bool = False):
        """imgs: (N, H, W, 3) -> ((N, D, fH, fW, C), depth)."""
        x = ConvBNReLU(32, 7, 2, dtype=self.dtype, name="stem")(imgs, train)
        # stem /2 x trunk strides (2, 2, 2): the fused scale (stage 1) sits
        # at the frustum's feat_stride of 8
        feats = ResNetModified(
            self.trunk_blocks, (2, 2, 2), self.trunk_filters,
            block=self.trunk_block, groups=1, base_width=64,
            dtype=self.dtype, name="trunk",
        )(x, train)
        # fuse last two scales (upsample deepest; parity: Up module)
        f2, f3 = feats[-2], feats[-1]
        f3u = jax.image.resize(f3, f2.shape[:3] + (f3.shape[-1],), "bilinear")
        x = jnp.concatenate([f2, f3u], axis=-1)
        x = ConvBNReLU(128, 3, dtype=self.dtype, name="neck")(x, train)
        head = nn.Conv(self.depth_bins + self.out_channels, (1, 1),
                       dtype=self.dtype, name="depth_head")(x)
        depth = jax.nn.softmax(head[..., : self.depth_bins], axis=-1)
        feat = head[..., self.depth_bins:]
        # outer product: (N, fH, fW, D, 1) * (N, fH, fW, 1, C)
        vol = depth[..., :, None] * feat[..., None, :]
        return vol.transpose(0, 3, 1, 2, 4), depth


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
    """Multi-camera LSS -> BEV features (H, W, out_channels).

    Accepts a single agent's rig ((N_cam, H, W, 3) images) or a batched
    one ((A, N_cam, H, W, 3)); batched input returns (A, H, W, C). All
    A*N_cam images run the trunk in ONE conv batch, the geometry/splat is
    vmapped — no per-agent or per-camera Python loops in the trace."""
    cfg: LSSCfg
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, intrinsics, cam2ego_rots, cam2ego_trans,
                 train: bool = False):
        """images: ([A,] N_cam, H, W, 3); intrinsics: ([A,] N_cam, 3, 3);
        cam2ego_rots: ([A,] N_cam, 3, 3); cam2ego_trans: ([A,] N_cam, 3)."""
        cfg = self.cfg
        batched = images.ndim == 5
        if not batched:
            images, intrinsics = images[None], intrinsics[None]
            cam2ego_rots, cam2ego_trans = cam2ego_rots[None], cam2ego_trans[None]
        A, Nc = images.shape[:2]
        frustum = create_frustum(cfg)
        cam_enc = CamEncode(cfg.num_depth, cfg.out_channels,
                            trunk_block=cfg.trunk_block,
                            trunk_blocks=cfg.trunk_blocks,
                            trunk_filters=cfg.trunk_filters,
                            dtype=self.dtype, name="cam_encode")
        vol, _ = cam_enc(images.reshape(A * Nc, *images.shape[2:]), train)
        pts = jax.vmap(frustum_to_ego, in_axes=(None, 0, 0, 0))(
            frustum, intrinsics.reshape(A * Nc, 3, 3),
            cam2ego_rots.reshape(A * Nc, 3, 3),
            cam2ego_trans.reshape(A * Nc, 3))
        bev = jax.vmap(lambda p, v: voxel_pool(p, v, cfg))(pts, vol)
        H, W = cfg.bev_size
        bev = bev.reshape(A, Nc, H, W, cfg.out_channels).sum(axis=1)
        out = ConvBNReLU(cfg.out_channels, 3, dtype=self.dtype,
                         name="bev_out")(bev, train)
        return out if batched else out[0]
