"""SECOND-style voxel encoder, TPU-native dense re-design.

Reference path (heter_encoders.py:52-81): MeanVFE -> spconv VoxelBackBone8x
(sparse 3D convs) -> HeightCompression. spconv has no TPU analogue; per the
design analysis (SURVEY.md §2.7) this implements the dense-on-capped-grid
option: voxel means scatter into a dense (D, H, W, C) grid and a Conv3D
stack (XLA lowers 3D convs onto the MXU) downsamples to the shared BEV
space; HeightCompression folds depth into channels.

Capacity parity with VoxelBackBone8x (sparse_backbone_3d.py:33-92): the
reference runs conv_input(16) -> conv1 (1x SubM 16) -> conv2 (stride +
2x SubM, 32) -> conv3 (stride + 2x SubM, 64) -> conv4 (stride + 2x SubM,
64) -> conv_out (128, z-stride). This dense twin keeps the same
stage/channel/conv-count schedule (11 3D convs, 16-16-32-64-64 + 128 out)
but spends its stride budget on Z (8 -> 4 -> 2 -> 1) and takes the single
XY/2 at the last stage, because the dense grid already sits at the shared
pillar XY resolution instead of spconv's 4x-finer sparse grid — same
receptive capacity, no dense-memory blowup.

At cooperative-perception voxel sizes (0.4 m XY, ~0.5 m Z over a 4 m band,
D = 8) the dense grid is small enough that dense conv beats a gather/scatter
submanifold emulation on TPU — occupancy is irrelevant to the MXU, which is
fed fixed tiles either way.

Batching discipline: `SECONDEncoder.__call__` natively accepts a leading
agent axis ((N, V, P, F) voxel dicts) — the scatter is vmapped and every
Conv3D runs on the (N, D, H, W, C) batch in one XLA op, matching the
pillar path's one-GEMM all-agent convention (no per-agent Python loops).
"""

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from quantv2x_tpu.models.layers import BN_EPS, BN_MOMENTUM


@dataclasses.dataclass(frozen=True)
class SecondCfg:
    lidar_range: tuple
    voxel_size: tuple            # (vx, vy, vz) with vz << z-extent (D > 1)
    # (stem, stage1, stage2, stage3, stage4) channels — parity with
    # VoxelBackBone8x's 16/16/32/64/64 schedule
    channels: Sequence[int] = (16, 16, 32, 64, 64)
    # extra convs per strided stage (reference: 2x SubMConv3d per stage)
    blocks_per_stage: int = 2
    conv_out_channels: int = 128  # conv_out width before HeightCompression
    out_channels: int = 64

    @property
    def grid_size(self):
        x1, y1, z1, x2, y2, z2 = self.lidar_range
        nx = int(round((x2 - x1) / self.voxel_size[0]))
        ny = int(round((y2 - y1) / self.voxel_size[1]))
        nz = int(round((z2 - z1) / self.voxel_size[2]))
        return nx, ny, nz


def mean_vfe(voxel_features, voxel_num_points):
    """Per-voxel mean of point features (parity: sub_modules/mean_vfe.py).

    Accepts (..., V, P, F) with counts (..., V)."""
    counts = jnp.maximum(voxel_num_points, 1).astype(voxel_features.dtype)
    return voxel_features.sum(axis=-2) / counts[..., None]


def scatter_to_grid3d(feats, voxel_coords, voxel_mask, grid_dhw):
    """(V, C) voxel means -> dense (D, H, W, C) grid.

    voxel_coords: (V, 3) as (z, y, x)."""
    D, H, W = grid_dhw
    z = jnp.where(voxel_mask, voxel_coords[:, 0], D)
    canvas = jnp.zeros((D, H, W, feats.shape[-1]), feats.dtype)
    return canvas.at[z, voxel_coords[:, 1], voxel_coords[:, 2]].add(
        jnp.where(voxel_mask[:, None], feats, 0.0), mode="drop"
    )


class ConvBNReLU3D(nn.Module):
    features: int
    kernel: int = 3
    strides: tuple = (1, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel,) * 3, strides=self.strides,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class SECONDEncoder(nn.Module):
    """Dense voxel backbone -> BEV features at (H/2, W/2, out_channels).

    Accepts a single-agent voxel dict ((V, P, F) features) or a batched one
    ((N, V, P, F)); batched input returns (N, H/2, W/2, out_channels)."""
    cfg: SecondCfg
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxels, train: bool = False):
        cfg = self.cfg
        nx, ny, nz = cfg.grid_size
        vf = voxels["voxel_features"]
        batched = vf.ndim == 4
        if not batched:
            voxels = {k: v[None] for k, v in voxels.items()}
            vf = vf[None]
        feats = mean_vfe(vf, voxels["voxel_num_points"])
        x = jax.vmap(scatter_to_grid3d, in_axes=(0, 0, 0, None))(
            feats.astype(self.dtype), voxels["voxel_coords"],
            voxels["voxel_mask"], (nz, ny, nx),
        )                                           # (N, D, H, W, C)
        ch = cfg.channels
        # stage schedule derives from the tuple length: stem + stage1 at
        # full res, middle entries are z-strided stages, the LAST entry is
        # the z/2+xy/2 stage down to the shared stride-2 BEV. The default
        # 5-tuple is VoxelBackBone8x parity (16/16/32/64 + 64); shorter
        # tuples give lighter trunks (CIA-SSD/FPV-RCNN test configs)
        x = ConvBNReLU3D(ch[0], dtype=self.dtype, name="stem")(x, train)
        x = ConvBNReLU3D(ch[min(1, len(ch) - 1)], dtype=self.dtype,
                         name="stage1_conv0")(x, train)
        # middle z-strided stages, 1 strided + blocks_per_stage convs each
        for i, c in enumerate(ch[2:-1], start=2):
            x = ConvBNReLU3D(c, strides=(2, 1, 1), dtype=self.dtype,
                             name=f"stage{i}_down")(x, train)
            for k in range(cfg.blocks_per_stage):
                x = ConvBNReLU3D(c, dtype=self.dtype,
                                 name=f"stage{i}_conv{k}")(x, train)
        # final stage: z/2 + the single xy/2 to the shared stride-2 BEV
        last = len(ch) - 1
        x = ConvBNReLU3D(ch[-1], strides=(2, 2, 2), dtype=self.dtype,
                         name=f"stage{max(last, 2)}_down")(x, train)
        for k in range(cfg.blocks_per_stage):
            x = ConvBNReLU3D(ch[-1], dtype=self.dtype,
                             name=f"stage{max(last, 2)}_conv{k}")(x, train)
        # conv_out (z-collapse widening) + HeightCompression: fold the
        # remaining depth into channels, project to the shared width
        x = ConvBNReLU3D(cfg.conv_out_channels, kernel=3,
                         dtype=self.dtype, name="conv_out")(x, train)
        N, D, H, W, C = x.shape
        x = x.transpose(0, 2, 3, 1, 4).reshape(N, H, W, D * C)
        x = nn.Conv(cfg.out_channels, (1, 1), dtype=self.dtype,
                    name="compress")(x)
        return x if batched else x[0]


class SecondIntermediate(nn.Module):
    """Cooperative SECOND: per-agent voxel trunk + per-level attention fusion.

    Parity: models/second_intermediate.py:15-62 — MeanVFE + VoxelBackBone8x +
    HeightCompression per agent, then sub_modules/att_bev_backbone.py
    (AttBEVBackbone): each 2D level keeps refining PER-AGENT features while a
    per-level AttFusion tap (warp-to-ego + per-pixel attention over agents)
    produces the fused copy that feeds that level's deconv; the deconv
    outputs concat into the head feature. The reference's record_len
    grouping becomes the padded agent axis + agent_mask.
    """
    cfg: "ModelCfg"                      # collab batch contract
    layer_nums: Sequence[int] = (4, 4)
    layer_strides: Sequence[int] = (1, 2)
    num_filters: Sequence[int] = (128, 256)
    upsample_strides: Sequence[int] = (1, 2)
    num_upsample_filters: Sequence[int] = (128, 128)

    def setup(self):
        from quantv2x_tpu.models.collab_model import DetectionHeads
        from quantv2x_tpu.models.fusion_lib import AttFusion
        from quantv2x_tpu.models.layers import ConvBNReLU, DeconvBNReLU
        c = self.cfg
        dt = c.jnp_dtype
        x1, y1, z1, x2, y2, z2 = c.voxel.lidar_range
        scfg = SecondCfg(
            lidar_range=c.voxel.lidar_range,
            voxel_size=(c.voxel.voxel_size[0], c.voxel.voxel_size[1],
                        (z2 - z1) / 8),
            out_channels=self.num_filters[0],
        )
        self.encoder = SECONDEncoder(scfg, dtype=dt)
        blocks, fusers, deblocks = [], [], []
        for i, n in enumerate(self.layer_nums):
            blocks.append([
                ConvBNReLU(self.num_filters[i], 3,
                           strides=self.layer_strides[i] if k == 0 else 1,
                           dtype=dt, name=f"block{i}_conv{k}")
                for k in range(n + 1)
            ])
            fusers.append(AttFusion(self.num_filters[i], dtype=dt,
                                    name=f"att_fuse{i}"))
            deblocks.append(DeconvBNReLU(self.num_upsample_filters[i],
                                         self.upsample_strides[i], dtype=dt,
                                         name=f"deblock{i}"))
        self.blocks = blocks
        self.fusers = fusers
        self.deblocks = deblocks
        self.heads = DetectionHeads(c.num_class, c.anchor_num,
                                    c.num_dir_bins, dtype=dt)

    def __call__(self, batch, train: bool = False):
        from quantv2x_tpu.utils.transformation import normalize_pairwise_tfm
        c = self.cfg
        vf = batch["voxel_features"]
        B, L = vf.shape[:2]
        # one batched trunk over all B*L agents (no per-agent Python loop)
        x = self.encoder(
            {"voxel_features": vf.reshape(B * L, *vf.shape[2:]),
             "voxel_coords": batch["voxel_coords"].reshape(
                 B * L, *batch["voxel_coords"].shape[2:]),
             "voxel_num_points": batch["voxel_num_points"].reshape(
                 B * L, *batch["voxel_num_points"].shape[2:]),
             "voxel_mask": batch["voxel_mask"].reshape(
                 B * L, *batch["voxel_mask"].shape[2:])}, train)
        H, W = c.bev_hw
        affine = normalize_pairwise_tfm(
            batch["pairwise_t_matrix"], H, W, c.voxel.voxel_size[0]
        )
        ups = []
        for i in range(len(self.blocks)):
            for conv in self.blocks[i]:
                x = conv(x, train)                   # per-agent trunk
            xa = x.reshape(B, L, *x.shape[1:])
            fused = self.fusers[i](xa, batch["agent_mask"], affine, train)
            ups.append(self.deblocks[i](fused, train))
        fused = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        cls_p, reg_p, dir_p = self.heads(fused)
        return {"cls_preds": cls_p, "reg_preds": reg_p, "dir_preds": dir_p,
                "occ_maps": []}
