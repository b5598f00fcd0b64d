"""Flagship cooperative detection model (the reference's HeterPyramidCollab line).

Parity: models/heter_pyramid_collab_mc.py:22-357 —
  per-agent encoder -> BEV backbone -> aligner, agents assembled on a padded
  axis, optional compressor/codebook at the communication point, pyramid
  weighted fusion, shrink conv, and 1x1 cls/reg/dir heads with the
  multi-class channel counts (cls: A*C*C, reg: 7*A*C, dir: bins*A*C,
  heter_pyramid_collab_mc.py:120-125).

TPU-first shape discipline: the batch is (B, L, ...) padded over agents; the
encoder runs as one (B*L)-batch GEMM/conv pipeline; communication (codebook)
slots in between encode and fusion, exactly where the ICI all-gather goes in
the multi-chip mapping (see parallel/).
"""

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from quantv2x_tpu.data.voxelizer import VoxelCfg
from quantv2x_tpu.models.bev_backbone import ResNetBEVBackbone
from quantv2x_tpu.models.layers import ConvBNReLU
from quantv2x_tpu.models.pillar_encoder import (
    PillarVFE,
    encode_pillar_bev,
    scatter_to_bev,
)
from quantv2x_tpu.models.pyramid_fusion import PyramidFusion, project_to_ego
from quantv2x_tpu.utils.transformation import normalize_pairwise_tfm


@dataclasses.dataclass(frozen=True)
class ModelCfg:
    voxel: VoxelCfg
    num_class: int = 3
    anchor_num: int = 2                      # rotations per class
    num_dir_bins: int = 2
    pillar_filters: tuple = (64,)
    backbone_layers: tuple = (3,)
    backbone_strides: tuple = (2,)
    backbone_filters: tuple = (64,)
    pyramid_layers: tuple = (3, 5, 8)
    pyramid_strides: tuple = (1, 2, 2)
    pyramid_filters: tuple = (64, 128, 256)
    pyramid_up_strides: tuple = (1, 2, 4)
    pyramid_up_filters: tuple = (128, 128, 128)
    shrink_dim: int = 256
    max_cav: int = 4
    uncertainty_dim: int = 0   # 0 = off; 2/3/7 = log-variance head dims
    dtype: str = "float32"
    # "bottleneck" = reference ResNeXt (32 groups x 4 wide) — faithful but
    # feeds the 128x128 MXU 4-channel groups; "basic" = dense 3x3 blocks
    # (the reference's resnext:false path) — much better MXU utilization
    pyramid_block: str = "bottleneck"
    # warp agent features into the ego frame once BEFORE the pyramid
    # (reference proj_first / pyramid_fuse_onnx deployment mode) instead of
    # per pyramid level: 3x fewer warp gather bytes; fusion keeps validity
    # via a warped FOV mask (see pyramid_fusion.project_to_ego)
    proj_first: bool = False

    @property
    def jnp_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def bev_hw(self):
        nx, ny, _ = self.voxel.grid_size
        return ny, nx


class ShrinkConv(nn.Module):
    """DownsampleConv/DoubleConv parity (sub_modules/downsample_conv.py:7-49)."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU(self.dim, 3, use_bn=False, use_bias=True,
                       dtype=self.dtype, name="conv1")(x)
        x = ConvBNReLU(self.dim, 3, use_bn=False, use_bias=True,
                       dtype=self.dtype, name="conv2")(x)
        return x


class DetectionHeads(nn.Module):
    """1x1 multi-class heads (heter_pyramid_collab_mc.py:120-125).

    ``uncertainty_dim`` > 0 adds the log-variance head of the uncertainty
    model family (point_pillar_uncertainty.py:32 unc_head; dim 2 = x,y,
    3 = x,y,yaw, 7 = full box) and the call returns a 4-tuple.
    """
    num_class: int
    anchor_num: int
    num_dir_bins: int
    uncertainty_dim: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        S = self.anchor_num * self.num_class  # anchor slots per location
        cls = nn.Conv(S * self.num_class, (1, 1), dtype=self.dtype,
                      name="cls_head")(x)
        reg = nn.Conv(S * 7, (1, 1), dtype=self.dtype, name="reg_head")(x)
        dirp = nn.Conv(S * self.num_dir_bins, (1, 1), dtype=self.dtype,
                       name="dir_head")(x)
        if self.uncertainty_dim:
            unc = nn.Conv(S * self.uncertainty_dim, (1, 1), dtype=self.dtype,
                          name="unc_head")(x)
            return cls, reg, dirp, unc
        return cls, reg, dirp


class PyramidCollabModel(nn.Module):
    """Encoder -> backbone -> [comm] -> pyramid fusion -> shrink -> heads."""
    cfg: ModelCfg
    compressor: Optional[nn.Module] = None  # codebook / naive compressor

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
            num_upsample_filters=c.pyramid_up_filters,
            block=c.pyramid_block,
            dtype=dt,
        )
        self.shrink = ShrinkConv(c.shrink_dim, dtype=dt)
        self.heads = DetectionHeads(
            c.num_class, c.anchor_num, c.num_dir_bins,
            uncertainty_dim=c.uncertainty_dim, dtype=dt,
        )

    def encode_agents(self, batch, train: bool = False):
        """Per-agent feature extraction up to the communication point.

        batch['voxel_features']: (B, L, V, P, 4), etc. Returns
        (B, L, H/2, W/2, C) agent BEV features.
        """
        c = self.cfg
        B, L = batch["voxel_features"].shape[:2]
        # all agents' pillars in ONE GEMM batch (the reference likewise
        # stacks every agent's voxels along dim 0) — MXU-friendly
        feat = encode_pillar_bev(self.vfe, self.backbone, batch,
                                 c.voxel.grid_size, train)
        return feat.reshape(B, L, *feat.shape[1:])

    def fuse_and_predict(self, agent_feats, batch, train: bool = False):
        """Fusion + heads from (possibly decompressed) agent features."""
        c = self.cfg
        H, W = c.bev_hw
        affine = normalize_pairwise_tfm(
            batch["pairwise_t_matrix"], H, W, c.voxel.voxel_size[0]
        )
        fov_mask = None
        if c.proj_first:
            agent_feats, fov_mask = project_to_ego(
                agent_feats, affine[:, 0], self.pyramid.align_corners
            )
        fused, occ_maps = self.pyramid.forward_collab(
            agent_feats, batch["agent_mask"], affine, train,
            fov_mask=fov_mask,
        )
        fused = self.shrink(fused)
        preds = self.heads(fused)
        cls, reg, dirp = preds[:3]
        out = {
            "cls_preds": cls,        # (B, h, w, S*C)
            "reg_preds": reg,        # (B, h, w, S*7)
            "dir_preds": dirp,       # (B, h, w, S*bins)
            "occ_maps": occ_maps,    # list of (B, L, hi, wi, 1)
        }
        if c.uncertainty_dim:
            out["unc_preds"] = preds[3]   # (B, h, w, S*unc_dim)
        return out

    def __call__(self, batch, train: bool = False,
                 compressor_train: bool = None):
        # compressor_train: codebook stage 2 trains ONLY the compressor
        # (gumbel soft path + aux loss) while the frozen detector runs in
        # eval mode — pass train=False, compressor_train=True
        feats = self.encode_agents(batch, train)
        aux = {}
        if self.compressor is not None:
            ct = train if compressor_train is None else compressor_train
            qfeats, aux = self.compressor(feats, ct)
            # Optional per-step wire bypass (batch["wire_bypass"] scalar
            # 0/1): stage-3 co-training on wire-only features makes the
            # detector wire-DEPENDENT (r4: bypassing the codebook dropped
            # mAP@0.5 0.721 -> 0.527). Mixing bypass steps keeps the
            # no-wire pipeline alive; the compressor still runs (its aux
            # loss keeps training the codebook) and only the fused input
            # is selected.
            bp = batch.get("wire_bypass")
            if bp is None:
                feats = qfeats
            else:
                feats = jnp.where(jnp.asarray(bp, bool), feats, qfeats)
        out = self.fuse_and_predict(feats, batch, train)
        out.update(aux)
        return out
