"""Heterogeneous multi-modality cooperative model.

Parity: models/heter_pyramid_collab_mc.py:22-357 — per-modality encoder ->
backbone -> aligner branches (encoder_m1, backbone_m1, aligner_m1, ...,
dispatched by agent_modality_list:179-185), camera-branch center-crop, then
the shared pyramid fusion + heads.

TPU re-design of the dynamic dispatch: the reference eval()'s per-modality
module names and runs each encoder on its agents' dynamic subset. Here each
modality branch runs on a COMPACTED agent axis (`encode_agents`): a stable
argsort groups that modality's live slots first, the branch encodes its
static per-modality `capacity` budget, and the features scatter back to
their original slots with OOB-drop masking. Static shapes throughout, and
encoder compute scales with sum(capacity) instead of
n_modalities x max_cav. (An earlier design ran every branch over the full
padded agent axis and jnp.where-selected — branchless but M x encoder
FLOPs; `tests/test_heter_model.py` keeps an oracle-equivalence test
against that semantics.)
"""

import dataclasses
from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from quantv2x_tpu.data.voxelizer import VoxelCfg
from quantv2x_tpu.models.bev_backbone import ResNetBEVBackbone
from quantv2x_tpu.models.collab_model import (
    DetectionHeads,
    ModelCfg,
    ShrinkConv,
)
from quantv2x_tpu.models.layers import ConvBNReLU
from quantv2x_tpu.models.pillar_encoder import (
    PillarVFE,
    encode_pillar_bev,
    scatter_to_bev,
)
from quantv2x_tpu.models.pyramid_fusion import PyramidFusion, project_to_ego
from quantv2x_tpu.models.second_encoder import SECONDEncoder, SecondCfg
from quantv2x_tpu.utils.transformation import normalize_pairwise_tfm


@dataclasses.dataclass(frozen=True)
class ModalityCfg:
    """One sensing modality branch (a YAML heter.modality_setting entry)."""
    name: str                      # "m1", "m2", ...
    core_method: str               # "point_pillar" | "second" | "lift_splat_shoot"
    aligner: str = "identity"      # "identity" | "conv" | "convnext"
    aligner_depth: int = 2         # convnext blocks (AlignNet 'convnext')
    # camera (lift_splat_shoot) branch knobs
    image_size: tuple = (64, 96)           # (H, W) input images
    depth_bins: tuple = (1.0, 40.0, 1.0)   # (min, max, step) metres
    # static per-frame agent-slot budget for this modality (0 = max_cav).
    # Encoder compute scales with the SUM of capacities, not
    # n_modalities x max_cav — set it to the modality assignment's true
    # per-frame maximum (e.g. 2 of each modality at max_cav=4) to halve
    # heter encode cost; slots beyond the budget fall back to zeros
    # (= agent dropped, like the reference's use_cav cap)
    capacity: int = 0


class ConvAligner(nn.Module):
    """Small conv aligner (feature_alignnet 'conv' variants)."""
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNReLU(self.channels, 3, dtype=self.dtype, name="c1")(x, train)
        y = ConvBNReLU(self.channels, 3, act=False, dtype=self.dtype,
                       name="c2")(y, train)
        return x + y


class ConvNextAligner(nn.Module):
    """ConvNeXt aligner (AlignNet 'convnext',
    feature_alignnet.py:27 / feature_alignnet_modules.py ConvEncoder):
    a stack of depthwise-7x7 + LayerNorm + pointwise-MLP residual blocks."""
    channels: int
    depth: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from quantv2x_tpu.models.stamp import ConvNextBlock
        for d in range(self.depth):
            x = ConvNextBlock(self.channels, dtype=self.dtype,
                              name=f"block{d}")(x)
        return x


class HeterCollabModel(nn.Module):
    """Multi-modality encoder branches + shared pyramid fusion."""
    cfg: ModelCfg
    modalities: Sequence[ModalityCfg] = (
        ModalityCfg("m1", "point_pillar"),
    )
    compressor: Optional[nn.Module] = None
    # "pyramid" = HeterPyramid* models (multiscale weighted fuse);
    # any FUSION_REGISTRY key = heter_model_baseline* single-scale fusion
    # (the reference selects it via model.args.fusion_method)
    fusion_method: str = "pyramid"

    def setup(self):
        c = self.cfg
        dt = c.jnp_dtype
        encs, backbones, aligners = {}, {}, {}
        for m in self.modalities:
            if m.core_method == "point_pillar":
                encs[m.name] = PillarVFE(c.voxel, c.pillar_filters, dtype=dt,
                                         name=f"vfe_{m.name}")
                backbones[m.name] = ResNetBEVBackbone(
                    c.backbone_layers, c.backbone_strides, c.backbone_filters,
                    dtype=dt, name=f"backbone_{m.name}",
                )
            elif m.core_method == "second":
                scfg = SecondCfg(
                    lidar_range=c.voxel.lidar_range,
                    voxel_size=(c.voxel.voxel_size[0], c.voxel.voxel_size[1],
                                (c.voxel.lidar_range[5] - c.voxel.lidar_range[2]) / 8),
                    out_channels=c.backbone_filters[-1],
                )
                encs[m.name] = SECONDEncoder(scfg, dtype=dt,
                                             name=f"second_{m.name}")
                backbones[m.name] = None
            elif m.core_method in ("lift_splat_shoot", "camera", "lss"):
                # TPU redesign of the reference camera branch
                # (heter_pyramid_collab_mc.py:190-204): instead of encoding
                # on the camera's own grid and center-cropping to the lidar
                # range, the LSS BEV grid IS the shared stride-2 lidar grid
                # (static shapes, no crop/resample stage).
                from quantv2x_tpu.models.lss_encoder import LSSCfg, LSSEncoder
                lcfg = LSSCfg(
                    lidar_range=c.voxel.lidar_range,
                    bev_resolution=c.voxel.voxel_size[0] * 2,
                    image_size=tuple(m.image_size),
                    depth_bins=tuple(m.depth_bins),
                    out_channels=c.backbone_filters[-1],
                )
                encs[m.name] = LSSEncoder(lcfg, dtype=dt,
                                          name=f"lss_{m.name}")
                backbones[m.name] = None
            else:
                raise ValueError(f"unknown modality encoder {m.core_method}")
            if m.aligner == "conv":
                aligners[m.name] = ConvAligner(
                    c.backbone_filters[-1], dtype=dt,
                    name=f"aligner_{m.name}")
            elif m.aligner == "convnext":
                aligners[m.name] = ConvNextAligner(
                    c.backbone_filters[-1], depth=m.aligner_depth, dtype=dt,
                    name=f"aligner_{m.name}")
            else:
                aligners[m.name] = None
        self.encoders = encs
        self.backbones = backbones
        self.aligners = aligners
        if self.fusion_method == "pyramid":
            self.pyramid = PyramidFusion(
                layer_nums=c.pyramid_layers, layer_strides=c.pyramid_strides,
                num_filters=c.pyramid_filters,
                upsample_strides=c.pyramid_up_strides,
                num_upsample_filters=c.pyramid_up_filters, dtype=dt,
            )
        else:
            from quantv2x_tpu.models.fusion_lib import FUSION_REGISTRY
            cls = FUSION_REGISTRY[self.fusion_method]
            try:
                self.fusion = cls(c.backbone_filters[-1], dtype=dt)
            except TypeError:
                self.fusion = cls()
        self.shrink = ShrinkConv(c.shrink_dim, dtype=dt)
        self.heads = DetectionHeads(c.num_class, c.anchor_num,
                                    c.num_dir_bins, dtype=dt)

    def _branch_features(self, mod: ModalityCfg, batch, train):
        """Run one modality branch over ALL agent slots -> (B*L, h, w, C)."""
        c = self.cfg
        vf = batch["voxel_features"]
        B, L, V, P, F = vf.shape
        if mod.core_method == "point_pillar":
            feat = encode_pillar_bev(self.encoders[mod.name],
                                     self.backbones[mod.name], batch,
                                     c.voxel.grid_size, train)
        elif mod.core_method in ("lift_splat_shoot", "camera", "lss"):
            imgs = batch["camera_imgs"]          # (B, L, N_cam, H, W, 3)
            feat = self.encoders[mod.name](
                imgs.reshape(B * L, *imgs.shape[2:]),
                batch["camera_intrinsics"].reshape(B * L, -1, 3, 3),
                batch["camera_rots"].reshape(B * L, -1, 3, 3),
                batch["camera_trans"].reshape(B * L, -1, 3), train,
            )                                    # (B*L, h, w, C)
        else:  # second — batched 3D path over all B*L agents
            # SECOND expects z-resolved coords; the shared voxelizer gives
            # z=0 pillars, so this path assumes a z-resolved voxel batch
            # (see SecondCfg). One traced branch for the whole agent axis.
            feat = self.encoders[mod.name](
                {"voxel_features": vf.reshape(B * L, *vf.shape[2:]),
                 "voxel_coords": batch["voxel_coords"].reshape(
                     B * L, *batch["voxel_coords"].shape[2:]),
                 "voxel_num_points": batch["voxel_num_points"].reshape(
                     B * L, *batch["voxel_num_points"].shape[2:]),
                 "voxel_mask": batch["voxel_mask"].reshape(
                     B * L, *batch["voxel_mask"].shape[2:])}, train)
        if self.aligners[mod.name] is not None:
            feat = self.aligners[mod.name](feat, train)
        return feat

    # per-agent batch leaves consumed by the modality branches (leading
    # dims (B, L)); everything else is frame-shared
    _AGENT_LEAVES = ("voxel_features", "voxel_coords", "voxel_num_points",
                     "voxel_mask", "camera_imgs", "camera_intrinsics",
                     "camera_rots", "camera_trans")

    def encode_agents(self, batch, train: bool = False):
        """Modality-routed agent features (B, L, h, w, C).

        TPU redesign of the reference's dynamic per-modality dispatch
        (heter_pyramid_collab_mc.py:179-185): each modality branch runs on
        a COMPACTED agent axis — a stable argsort groups that modality's
        slots first, the branch encodes its static `capacity` budget, and
        the features scatter back to their original slots (OOB-drop masks
        slots of other modalities). Static shapes, and encoder compute
        scales with sum(capacity) instead of n_modalities x max_cav (the
        previous run-all-and-jnp.where-select paid M x encoder FLOPs)."""
        vf = batch["voxel_features"]
        B, L = vf.shape[:2]
        mod_ids = batch.get("agent_modality")
        if mod_ids is None or len(self.modalities) == 1:
            feat = self._branch_features(self.modalities[0], batch, train)
            return feat.reshape(B, L, *feat.shape[1:])
        out = None
        amask = batch.get("agent_mask")
        live = (amask.astype(bool) if amask is not None
                else jnp.ones(mod_ids.shape, bool))
        for mi, mod in enumerate(self.modalities):
            cap = min(mod.capacity or L, L)
            # stable sort: this modality's LIVE slots first (padded slots
            # carry modality 0 and must not claim budget), original order
            idx = jnp.argsort(
                jnp.where((mod_ids == mi) & live, 0, 1), axis=1,
                stable=True,
            )[:, :cap]                                     # (B, cap)
            sub = dict(batch)
            for key in self._AGENT_LEAVES:
                if key in sub:
                    v = sub[key]
                    ix = idx.reshape(B, cap, *([1] * (v.ndim - 2)))
                    sub[key] = jnp.take_along_axis(v, ix, axis=1)
            feat = self._branch_features(mod, sub, train)
            feat = feat.reshape(B, cap, *feat.shape[1:])
            if out is None:
                out = jnp.zeros((B, L) + feat.shape[2:], feat.dtype)
            # scatter back; slots whose modality differs (argsort tail
            # garbage beyond this frame's true count) drop out of bounds
            valid = jnp.take_along_axis(mod_ids, idx, axis=1) == mi
            idx_w = jnp.where(valid, idx, L)
            out = out.at[jnp.arange(B)[:, None], idx_w].set(
                feat, mode="drop")
        return out

    def fuse_and_predict(self, agent_feats, batch, train: bool = False):
        c = self.cfg
        H, W = c.bev_hw
        affine = normalize_pairwise_tfm(
            batch["pairwise_t_matrix"], H, W, c.voxel.voxel_size[0]
        )
        if self.fusion_method == "pyramid":
            fov_mask = None
            if c.proj_first:
                agent_feats, fov_mask = project_to_ego(
                    agent_feats, affine[:, 0], self.pyramid.align_corners
                )
            fused, occ_maps = self.pyramid.forward_collab(
                agent_feats, batch["agent_mask"], affine, train,
                fov_mask=fov_mask,
            )
        else:
            fused = self.fusion(agent_feats, batch["agent_mask"], affine,
                                train)
            occ_maps = []
        fused = self.shrink(fused)
        cls, reg, dirp = self.heads(fused)
        return {"cls_preds": cls, "reg_preds": reg, "dir_preds": dirp,
                "occ_maps": occ_maps}

    def clip_embeddings(self, batch, train: bool = False):
        """Per-modality pooled BEV embeddings of the SAME scene.

        Parity: heter_pyramid_single_clip.py — every modality branch
        encodes the frame and a symmetric InfoNCE loss
        (loss/aux_losses.clip_loss) aligns the embedding spaces while the
        shared pyramid/heads stay frozen. Returns {modality: (B*L, C)}
        mean-pooled embeddings.
        """
        out = {}
        for mod in self.modalities:
            feat = self._branch_features(mod, batch, train)  # (B*L,h,w,C)
            out[mod.name] = feat.mean(axis=(1, 2))
        return out

    def __call__(self, batch, train: bool = False,
                 with_clip_embeddings: bool = False):
        feats = self.encode_agents(batch, train)
        aux = {}
        if self.compressor is not None:
            feats, aux = self.compressor(feats, train)
        out = self.fuse_and_predict(feats, batch, train)
        out.update(aux)
        if with_clip_embeddings:
            out["clip_embeddings"] = self.clip_embeddings(batch, train)
        return out
