"""Naive conv autoencoder channel compressor (baseline wire).

Parity: sub_modules/naive_compress.py:5-33 — encoder conv to C/ratio
channels + decoder back, both 3x3 conv+BN+ReLU (the non-learned-codebook
compression baseline).
"""

import flax.linen as nn
import jax.numpy as jnp

from quantv2x_tpu.models.layers import ConvBNReLU


class NaiveCompressor(nn.Module):
    channels: int = 64
    compress_ratio: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: (B, L, H, W, C) -> same shape through the bottleneck."""
        B, L, H, W, C = feats.shape
        x = feats.reshape(B * L, H, W, C)
        x = ConvBNReLU(self.channels // self.compress_ratio, 3,
                       dtype=self.dtype, name="enc")(x, train)
        x = ConvBNReLU(self.channels, 3, dtype=self.dtype, name="dec1")(
            x, train)
        x = ConvBNReLU(self.channels, 3, dtype=self.dtype, name="dec2")(
            x, train)
        return x.reshape(B, L, H, W, C), {}
