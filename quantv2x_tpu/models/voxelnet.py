"""VoxelNet detector family, TPU-native.

Parity targets:
  - models/voxel_net.py — classic VoxelNet: stacked voxel feature encoding
    (SVFE: VFE(7,32) -> VFE(32,128) -> FCN, voxel_net.py:78-119), dense 4D
    scatter (voxel_indexing :197-206), convolutional middle layers
    (CML :120-132, three Conv3D stages striding depth), and the
    three-block / three-deconv region proposal network (RPN :135-175).
  - models/voxel_net_intermediate.py — cooperative variant: per-agent
    SVFE+CML, optional AutoEncoder channel compression (:85-89), AttFusion
    across agents (:77), shared RPN.

TPU redesign decisions:
  - Static shapes: voxels live in padded (V, P, 7) buffers; masked BN + max
    aggregation replace the reference's dynamic KK-stacked tensors.
  - The dense scatter is a jnp scatter-add onto (D, H, W, C) (the reference
    indexes a zeroed CUDA tensor); Conv3D runs NDHWC so XLA tiles it onto
    the MXU directly.
  - The reference's depth reduction via a VALID-z conv (CML conv3d_2,
    p=(0,1,1)) is kept; remaining depth folds into channels before the RPN
    exactly like voxel_net.py:228 (`.view(N, -1, H, W)`).
  - A direction-bin head is added (off in the reference RPN) so the model
    plugs into this framework's shared loss/decode path; set
    ``with_dir=False`` for strict reference output arity.
"""

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from quantv2x_tpu.data.voxelizer import VoxelCfg
from quantv2x_tpu.models.backbones_lib import AutoEncoder
from quantv2x_tpu.models.fusion_lib import AttFusion
from quantv2x_tpu.models.layers import BN_EPS, BN_MOMENTUM, MaskedBatchNorm
from quantv2x_tpu.models.second_encoder import ConvBNReLU3D, scatter_to_grid3d
from quantv2x_tpu.utils.transformation import normalize_pairwise_tfm


@dataclasses.dataclass(frozen=True)
class VoxelNetCfg:
    voxel: VoxelCfg                      # vz << z-extent so D > 1
    anchor_num: int = 2
    num_class: int = 1
    num_dir_bins: int = 2
    with_dir: bool = True
    vfe_units: Sequence[int] = (32, 128)  # VFE output widths (reference SVFE)
    cml_channels: int = 64
    rpn_channels: int = 128
    compression: int = 0                 # AutoEncoder bottleneck (0 = off)
    dtype: str = "float32"

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)


class VFELayer(nn.Module):
    """One voxel-feature-encoding layer (voxel_net.py:78-96).

    Point-wise FCN to units/2, then concat with the voxel-wise max so every
    point sees its voxel's aggregate. Masked so padded points contribute
    nothing to BN statistics or the max.
    """
    units: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, point_mask, train: bool = False):
        half = self.units // 2
        pwf = nn.Dense(half, use_bias=False, dtype=self.dtype,
                       name="fcn")(x)
        pwf = MaskedBatchNorm(dtype=self.dtype, name="bn")(
            pwf, point_mask, train)
        pwf = nn.relu(pwf)
        masked = jnp.where(point_mask[..., None], pwf, -jnp.inf)
        laf = jnp.max(masked, axis=1, keepdims=True)
        laf = jnp.where(jnp.isfinite(laf), laf, 0.0)
        out = jnp.concatenate(
            [pwf, jnp.broadcast_to(laf, pwf.shape)], axis=-1)
        return jnp.where(point_mask[..., None], out, 0.0)


class SVFE(nn.Module):
    """Stacked VFE (voxel_net.py:99-119): VFE stack -> FCN -> voxel max."""
    cfg: VoxelNetCfg

    @nn.compact
    def __call__(self, voxel_features, voxel_coords, voxel_num_points,
                 train: bool = False):
        """(V, P, 4) padded points -> (V, C) voxel features.

        Builds the classic 7-feature input: xyz, reflectance, and the offset
        from the voxel's masked centroid.
        """
        cfg = self.cfg
        dt = cfg.jnp_dtype
        P = voxel_features.shape[1]
        point_mask = jnp.arange(P)[None, :] < voxel_num_points[:, None]
        counts = jnp.maximum(voxel_num_points, 1).astype(dt)[:, None, None]
        xyz = voxel_features[..., :3].astype(dt)
        centroid = jnp.where(point_mask[..., None], xyz, 0.0).sum(
            axis=1, keepdims=True) / counts
        x = jnp.concatenate(
            [voxel_features.astype(dt), xyz - centroid], axis=-1)  # (V,P,7)
        for i, units in enumerate(cfg.vfe_units):
            x = VFELayer(units, dtype=dt, name=f"vfe_{i + 1}")(
                x, point_mask, train)
        x = nn.Dense(cfg.vfe_units[-1], use_bias=False, dtype=dt,
                     name="fcn")(x)
        x = MaskedBatchNorm(dtype=dt, name="fcn_bn")(x, point_mask, train)
        x = nn.relu(x)
        x = jnp.where(point_mask[..., None], x, -jnp.inf)
        out = jnp.max(x, axis=1)
        return jnp.where(jnp.isfinite(out), out, 0.0)


class CML(nn.Module):
    """Convolutional middle layers (voxel_net.py:120-132).

    Three Conv3D stages; stages 1/3 stride depth by 2, stage 2 runs VALID in
    z (depth -2). Returns (H, W, D'*C) with depth folded into channels
    (voxel_net.py:228).
    """
    channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (N, D, H, W, C) -> (N, H, W, D'*C)
        x = ConvBNReLU3D(self.channels, strides=(2, 1, 1), dtype=self.dtype,
                         name="conv3d_1")(x, train)
        x = nn.Conv(self.channels, (3, 3, 3),
                    padding=((0, 0), (1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv3d_2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn_2")(x)
        x = nn.relu(x)
        x = ConvBNReLU3D(self.channels, strides=(2, 1, 1), dtype=self.dtype,
                         name="conv3d_3")(x, train)
        N, D, H, W, C = x.shape
        return x.transpose(0, 2, 3, 1, 4).reshape(N, H, W, D * C)


class _ConvBNReLU2D(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class RPN(nn.Module):
    """VoxelNet region proposal network (voxel_net.py:135-175).

    Three stride-2 conv blocks (4/6/6 layers), three deconvs back to the
    stride-2 plane, concat -> 1x1 heads. Output spatial = input / 2.
    """
    cfg: VoxelNetCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = cfg.jnp_dtype
        ch = cfg.rpn_channels
        skips = []
        for b, (width, depth) in enumerate(
                [(ch, 4), (ch, 6), (ch * 2, 6)]):
            for i in range(depth):
                x = _ConvBNReLU2D(width, stride=2 if i == 0 else 1, dtype=dt,
                                  name=f"block_{b + 1}_{i}")(x, train)
            skips.append(x)
        outs = []
        for i, (feat, k) in enumerate(zip(skips[::-1], (4, 2, 1))):
            y = nn.ConvTranspose(ch * 2, (k, k), strides=(k, k), dtype=dt,
                                 name=f"deconv_{i + 1}")(feat)
            y = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=dt,
                             name=f"deconv_bn_{i + 1}")(y)
            outs.append(y)
        x = jnp.concatenate(outs, axis=-1)                 # (1, H/2, W/2, 768)
        # slot-major multi-class layout shared with DetectionHeads
        # (collab_model.py): S anchor slots, each scoring num_class classes
        S = cfg.anchor_num * cfg.num_class
        cls = nn.Conv(S * cfg.num_class, (1, 1), dtype=dt,
                      name="score_head")(x)
        reg = nn.Conv(S * 7, (1, 1), dtype=dt, name="reg_head")(x)
        dirp = None
        if cfg.with_dir:
            dirp = nn.Conv(S * cfg.num_dir_bins, (1, 1), dtype=dt,
                           name="dir_head")(x)
        return cls, reg, dirp


def _as_output(cls, reg, dirp):
    out = {"cls_preds": cls.astype(jnp.float32),
           "reg_preds": reg.astype(jnp.float32), "occ_maps": []}
    if dirp is not None:
        out["dir_preds"] = dirp.astype(jnp.float32)
    return out


class VoxelNet(nn.Module):
    """Single-agent VoxelNet (contract "voxels")."""
    cfg: VoxelNetCfg

    @nn.compact
    def __call__(self, voxels, train: bool = False):
        cfg = self.cfg
        dt = cfg.jnp_dtype
        nx, ny, nz = cfg.voxel.grid_size
        feats = SVFE(cfg, name="svfe")(
            voxels["voxel_features"], voxels["voxel_coords"],
            voxels["voxel_num_points"], train)
        grid = scatter_to_grid3d(
            feats, voxels["voxel_coords"], voxels["voxel_mask"],
            (nz, ny, nx))[None]
        bev = CML(cfg.cml_channels, dtype=dt, name="cml")(grid, train)
        cls, reg, dirp = RPN(cfg, name="rpn")(bev, train)
        return _as_output(cls, reg, dirp)


class VoxelNetIntermediate(nn.Module):
    """Cooperative VoxelNet (contract "collab").

    Per-agent SVFE + CML, optional AutoEncoder compression of the exchanged
    BEV map (voxel_net_intermediate.py:85-89), attention fusion across the
    padded agent axis in the ego frame, shared RPN.
    """
    cfg: VoxelNetCfg

    @nn.compact
    def __call__(self, batch, train: bool = False):
        cfg = self.cfg
        dt = cfg.jnp_dtype
        nx, ny, nz = cfg.voxel.grid_size
        vf = batch["voxel_features"]
        B, L, V, P, F = vf.shape
        feats = SVFE(cfg, name="svfe")(
            vf.reshape(B * L * V, P, F),
            batch["voxel_coords"].reshape(B * L * V, 3),
            batch["voxel_num_points"].reshape(B * L * V), train,
        ).reshape(B * L, V, -1)
        grid = jax.vmap(
            lambda f, co, m: scatter_to_grid3d(f, co, m, (nz, ny, nx))
        )(feats, batch["voxel_coords"].reshape(B * L, V, 3),
          batch["voxel_mask"].reshape(B * L, V))
        # all agents run the CML as one batched NDHWC conv (N = B*L)
        bev = CML(cfg.cml_channels, dtype=dt, name="cml")(grid, train)
        bev = bev.reshape(B, L, ny, nx, -1)
        if cfg.compression > 0:
            bev = AutoEncoder(bev.shape[-1], cfg.compression, dtype=dt,
                              name="compression")(bev, train)
        affine = normalize_pairwise_tfm(
            batch["pairwise_t_matrix"], ny, nx, cfg.voxel.voxel_size[0])
        fused = AttFusion(bev.shape[-1], dtype=dt, name="fusion")(
            bev, batch["agent_mask"], affine, train)
        cls, reg, dirp = RPN(cfg, name="rpn")(fused, train)
        return _as_output(cls, reg, dirp)
