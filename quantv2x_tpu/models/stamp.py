"""STAMP protocol-space adapters (heterogeneous collaboration).

Parity: models/stamp_modules/adapter.py:93-856 (BaseAdapter + ConvNext
variants) and the heter_model_baseline_w_stamp wiring: each agent type owns
an ``Adapter`` mapping its local BEV feature space into a shared *protocol*
space (what gets transmitted) and a ``Reverter`` mapping received protocol
features back into its local space, so heterogeneous models collaborate
without retraining their detection stacks.

Blocks are ConvNeXt-style (depthwise 7x7 + LayerNorm + pointwise MLP) with
optional channel change and spatial rescale, as in the reference's convnext
aligner family (stamp_modules/feature_alignnet_modules.py).
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvNextBlock(nn.Module):
    """ConvNeXt residual block; ``deformable=True`` swaps the depthwise
    conv for a deformable conv (feature_alignnet_modules.ConvEncoder
    deformable flag, stamp_modules/feature_alignnet_modules.py:79-107)."""
    channels: int
    deformable: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.deformable:
            from quantv2x_tpu.ops.deform_conv import DeformableConv2d
            y = DeformableConv2d(self.channels, dtype=self.dtype,
                                 name="dw_deform")(x)
        else:
            y = nn.Conv(self.channels, (7, 7), padding="SAME",
                        feature_group_count=self.channels, dtype=self.dtype,
                        name="dw")(x)
        y = nn.LayerNorm(dtype=self.dtype, name="ln")(y)
        y = nn.Dense(4 * self.channels, dtype=self.dtype, name="pw1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.channels, dtype=self.dtype, name="pw2")(y)
        return x + y


class Adapter(nn.Module):
    """Local feature space -> protocol space (transmit side)."""
    out_channels: int
    depth: int = 2
    out_hw: Optional[tuple] = None   # protocol spatial size (resample if set)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (..., H, W, C_local) -> (..., H', W', C_protocol)."""
        lead = x.shape[:-3]
        H, W, C = x.shape[-3:]
        flat = x.reshape((-1, H, W, C))
        y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="proj")(flat)
        for d in range(self.depth):
            y = ConvNextBlock(self.out_channels, dtype=self.dtype,
                              name=f"block{d}")(y)
        if self.out_hw is not None and self.out_hw != (H, W):
            y = jax.image.resize(
                y, (y.shape[0], *self.out_hw, self.out_channels), "bilinear"
            )
        return y.reshape(lead + y.shape[1:])


class Reverter(nn.Module):
    """Protocol space -> local feature space (receive side)."""
    out_channels: int
    depth: int = 2
    out_hw: Optional[tuple] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lead = x.shape[:-3]
        H, W, C = x.shape[-3:]
        flat = x.reshape((-1, H, W, C))
        y = flat
        if self.out_hw is not None and self.out_hw != (H, W):
            y = jax.image.resize(
                y, (y.shape[0], *self.out_hw, C), "bilinear"
            )
        y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="proj")(y)
        for d in range(self.depth):
            y = ConvNextBlock(self.out_channels, dtype=self.dtype,
                              name=f"block{d}")(y)
        return y.reshape(lead + y.shape[1:])


class StampCollabModel(nn.Module):
    """STAMP end-to-end wrapper: frozen ego + protocol stacks, live bridge.

    Parity: models/heter_model_baseline_w_stamp.py:132-305 and
    tools/train_stamp.py:188-244. Stages:
      - ``train_adapter``           -> (None, (FM, FP2M, FM2P2M, FP, FM2P))
      - ``train_adapter_w_output``  -> (output_dict, feats)
      - ``infer``                   -> output_dict only
    where FM is the ego-modality agent feature, FP the protocol model's,
    FM2P = adapter(FM), FP2M = reverter(FP), FM2P2M = reverter(adapter(FM)).

    Collaboration runs in protocol space: every non-ego agent transmits
    adapter(F) and the ego reverts it before fusion (the reference's
    forward_adapter_and_reverter at heter_model_baseline_w_stamp.py:885-931),
    so heterogeneous stacks interoperate without retraining the heads.
    """
    ego_model: nn.Module        # PyramidCollabModel (frozen)
    protocol_model: nn.Module   # PyramidCollabModel (frozen, "m0")
    protocol_channels: int
    local_channels: int
    stage: str = "train_adapter_w_output"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.bridge = StampBridge(self.protocol_channels,
                                  self.local_channels, dtype=self.dtype)

    def __call__(self, batch, train: bool = False):
        fm = self.ego_model.encode_agents(batch, train=False)
        fm = jax.lax.stop_gradient(fm)
        feats = None
        if self.stage != "infer":
            fp = self.protocol_model.encode_agents(batch, train=False)
            fp = jax.lax.stop_gradient(fp)
            fm2p = self.bridge.adapter(fm)
            fp2m = self.bridge.reverter(fp)
            fm2p2m = self.bridge.reverter(fm2p)
            feats = (fm, fp2m, fm2p2m, fp, fm2p)
        else:
            fm2p2m = self.bridge.reverter(self.bridge.adapter(fm))
        if self.stage == "train_adapter":
            return None, feats
        # non-ego agents' features travel adapter->wire->reverter; the ego
        # keeps its own local feature (agent slot 0 is always ego)
        collab = jnp.concatenate([fm[:, :1], fm2p2m[:, 1:]], axis=1)
        out = self.ego_model.fuse_and_predict(collab, batch, train=False)
        if self.stage == "train_adapter_w_output":
            return out, feats
        return out


class StampBridge(nn.Module):
    """Adapter + Reverter pair for one agent type.

    Training objective (adapter_loss parity): adapted local features should
    match the protocol model's features, and revert(adapt(x)) ~= x.
    """
    protocol_channels: int
    local_channels: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.adapter = Adapter(self.protocol_channels, dtype=self.dtype)
        self.reverter = Reverter(self.local_channels, dtype=self.dtype)

    def __call__(self, local_feats):
        protocol = self.adapter(local_feats)
        restored = self.reverter(protocol)
        return protocol, restored

    def cycle_loss(self, local_feats):
        protocol, restored = self(local_feats)
        return jnp.mean((restored - local_feats) ** 2), protocol
