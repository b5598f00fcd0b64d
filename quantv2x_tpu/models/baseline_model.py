"""Baseline cooperative models: single-scale fusion via the fusion registry.

Parity: the reference heter_model_baseline(_mc) family — per-agent encoder
-> full BEV backbone -> ONE single-scale fusion module (max / att / disconet
/ v2vnet / where2comm / who2com / v2xvit / cobevt, selected by
fusion_method) -> shrink -> heads. This is the harness the reference uses to
compare fusion algorithms under one training recipe.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from quantv2x_tpu.models.bev_backbone import ResNetBEVBackbone
from quantv2x_tpu.models.collab_model import (
    DetectionHeads,
    ModelCfg,
    ShrinkConv,
)
from quantv2x_tpu.models.fusion_lib import FUSION_REGISTRY
from quantv2x_tpu.models.pillar_encoder import (
    PillarVFE,
    encode_pillar_bev,
    scatter_to_bev,
)
from quantv2x_tpu.utils.transformation import normalize_pairwise_tfm


class BaselineFusionModel(nn.Module):
    """Encoder -> backbone -> registry fusion -> shrink -> heads.

    ``comm`` (a comm_mask.CommCfg) activates the Where2comm communication
    gate: per-agent confidence head, (request-gated) transmit masking,
    multi-round exchange — output gains a ``comm_rate`` scalar
    (where2comm_attn.py:174-341 parity)."""
    cfg: ModelCfg
    fusion_method: str = "att"
    compressor: Optional[nn.Module] = None
    comm: Optional[object] = None        # comm_mask.CommCfg

    def setup(self):
        c = self.cfg
        dt = c.jnp_dtype
        if self.comm is not None:
            from quantv2x_tpu.models.comm_mask import Where2commGate
            self.comm_gate = Where2commGate(self.comm, c.anchor_num,
                                            dtype=dt)
        self.vfe = PillarVFE(c.voxel, c.pillar_filters, dtype=dt)
        # full decode: every stage deconvs back to the FIRST stage's
        # resolution before the channel concat (reference PointPillar
        # baseline upsample_strides [1, 2, 4] for layer_strides [2, 2, 2],
        # base_bev_backbone_resnet.py) — stage i sits at
        # cumprod(strides)[i] of the input, so its deconv stride is
        # cumprod(strides)[i] / cumprod(strides)[0]
        cum = 1
        cums = []
        for s in c.backbone_strides:
            cum *= int(s)
            cums.append(cum)
        self.backbone = ResNetBEVBackbone(
            c.backbone_layers, c.backbone_strides, c.backbone_filters,
            upsample_strides=tuple(s // cums[0] for s in cums),
            num_upsample_filters=(c.backbone_filters[-1] * 2,)
            * len(c.backbone_layers),
            dtype=dt,
        )
        fdim = c.backbone_filters[-1] * 2 * len(c.backbone_layers)
        cls = FUSION_REGISTRY[self.fusion_method]
        try:
            self.fusion = cls(fdim, dtype=dt)
        except TypeError:
            self.fusion = cls()
        self.shrink = ShrinkConv(c.shrink_dim, dtype=dt)
        self.heads = DetectionHeads(c.num_class, c.anchor_num,
                                    c.num_dir_bins, dtype=dt)

    def __call__(self, batch, train: bool = False):
        c = self.cfg
        B, L = batch["voxel_features"].shape[:2]
        feat = encode_pillar_bev(self.vfe, self.backbone, batch,
                                 c.voxel.grid_size, train)
        feat = feat.reshape(B, L, *feat.shape[1:])
        if self.compressor is not None:
            feat, _ = self.compressor(feat, train)

        H, W = c.bev_hw
        affine = normalize_pairwise_tfm(
            batch["pairwise_t_matrix"], H, W, c.voxel.voxel_size[0]
        )
        out = {"occ_maps": []}
        if self.comm is not None:
            fused, rate, _ = self.comm_gate(
                feat, batch["agent_mask"], affine,
                lambda f, m, a, t: self.fusion(f, m, a, t), train)
            out["comm_rate"] = rate
        else:
            fused = self.fusion(feat, batch["agent_mask"], affine, train)
        fused = self.shrink(fused)
        cls_p, reg_p, dir_p = self.heads(fused)
        out.update(cls_preds=cls_p, reg_preds=reg_p, dir_preds=dir_p)
        return out
