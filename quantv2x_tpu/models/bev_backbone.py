"""ResNet BEV backbone with multiscale encode/decode split (flax, NHWC).

Parity: sub_modules/base_bev_backbone_resnet.py:13-137 — residual stages at
configured strides, per-stage deconv upsampling, channel concat. The
get_multiscale_feature / decode_multiscale_feature split exists so the
multi-agent fusion can be inserted between them (same as the reference).
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from quantv2x_tpu.models.layers import DeconvBNReLU, ResNetModified


class ResNetBEVBackbone(nn.Module):
    layer_nums: Sequence[int] = (3,)
    layer_strides: Sequence[int] = (2,)
    num_filters: Sequence[int] = (64,)
    upsample_strides: Sequence[int] = ()
    num_upsample_filters: Sequence[int] = ()
    block: str = "basic"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.resnet = ResNetModified(
            self.layer_nums, self.layer_strides, self.num_filters,
            block=self.block, dtype=self.dtype,
        )
        self.deblocks = [
            DeconvBNReLU(f, s, dtype=self.dtype, name=f"deblock{i}")
            for i, (f, s) in enumerate(
                zip(self.num_upsample_filters, self.upsample_strides)
            )
        ]

    def encode(self, x, train: bool = False):
        """-> tuple of per-stage features (get_multiscale_feature)."""
        return self.resnet(x, train)

    def decode(self, features, train: bool = False):
        """per-stage features -> single concat map (decode_multiscale_feature)."""
        if not self.deblocks:
            return features[-1] if len(features) == 1 else jnp.concatenate(
                features, axis=-1
            )
        ups = [
            self.deblocks[i](features[i], train)
            for i in range(len(self.num_filters))
        ]
        x = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        if len(self.deblocks) > len(self.num_filters):
            x = self.deblocks[-1](x, train)
        return x

    def __call__(self, x, train: bool = False):
        return self.decode(self.encode(x, train), train)
