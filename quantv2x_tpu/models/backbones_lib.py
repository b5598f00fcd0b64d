"""Alternative BEV trunks + attention blocks: CBAM, RegNet, MobileNetV2,
MNASNet, conv AutoEncoder.

Parity targets:
  - models/sub_modules/cbam.py:31-60 (ChannelAttention avg+max pooled MLP,
    SpatialAttention 7x7 conv over [mean,max] maps) and its CBAM-ResNet
    BasicBlock;
  - models/sub_modules/auto_encoder.py:5-70 (layer_num x stride-2 conv +
    channel-halving encoder, mirrored deconv decoder — HEAL's feature
    compressor);
  - models/mobilenetv2.py:22-100 (InvertedResidual expand->depthwise->
    project with residual at stride 1);
  - models/mnasnet.py (same inverted-residual family, per-stage expansion
    factors [3,6]);
  - models/regnet.py:33-180 (SimpleStem, SE, BottleneckTransform with
    group conv, ResBottleneckBlock, AnyStage).

All NHWC channel-last flax modules sized as BEV trunks (the reference uses
these as heterogeneous-modality encoder branches, not ImageNet
classifiers); BN eps/momentum match layers.py conventions.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from quantv2x_tpu.models.layers import BN_EPS, BN_MOMENTUM, ConvBNReLU


class ChannelAttention(nn.Module):
    """Avg+max pooled shared MLP -> sigmoid channel gate (cbam.py:31-46)."""
    ratio: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        hidden = max(C // self.ratio, 1)
        mlp = nn.Sequential([
            nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="fc1"),
            nn.relu,
            nn.Dense(C, use_bias=False, dtype=self.dtype, name="fc2"),
        ])
        avg = mlp(x.mean(axis=(-3, -2)))
        mx = mlp(x.max(axis=(-3, -2)))
        gate = nn.sigmoid(avg + mx)
        return x * gate[..., None, None, :]


class SpatialAttention(nn.Module):
    """7x7 conv over [mean, max] channel maps -> sigmoid gate
    (cbam.py:48-60)."""
    kernel_size: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = x.mean(axis=-1, keepdims=True)
        mx = x.max(axis=-1, keepdims=True)
        g = nn.Conv(1, (self.kernel_size,) * 2, padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv")(
            jnp.concatenate([avg, mx], axis=-1))
        return x * nn.sigmoid(g)


class CBAMBlock(nn.Module):
    """ResNet BasicBlock + channel/spatial attention before the residual
    add (cbam.py BasicBlock with ca/sa)."""
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNReLU(self.features, 3, strides=self.strides,
                       dtype=self.dtype, name="conv1")(x, train)
        y = ConvBNReLU(self.features, 3, act=False, dtype=self.dtype,
                       name="conv2")(y, train)
        y = ChannelAttention(dtype=self.dtype, name="ca")(y)
        y = SpatialAttention(dtype=self.dtype, name="sa")(y)
        if self.strides != 1 or x.shape[-1] != self.features:
            x = ConvBNReLU(self.features, 1, strides=self.strides,
                           act=False, dtype=self.dtype, name="down")(x, train)
        return nn.relu(x + y)


class AutoEncoder(nn.Module):
    """Stride-2 channel-halving conv autoencoder (auto_encoder.py:5-70).

    __call__ returns the reconstruction (the compression round trip the
    HEAL baselines train through); encode() exposes the bottleneck.
    """
    feature_num: int
    layer_num: int = 2
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        enc, dec = [], []
        c = self.feature_num
        for i in range(self.layer_num):
            enc.append((
                ConvBNReLU(c, 3, strides=2, dtype=self.dtype,
                           name=f"enc{i}_down"),
                ConvBNReLU(c // 2, 3, dtype=self.dtype, name=f"enc{i}_sq"),
            ))
            c //= 2
        for i in range(self.layer_num):
            dec.append((
                nn.ConvTranspose(c * 2, (2, 2), strides=(2, 2),
                                 use_bias=False, dtype=self.dtype,
                                 name=f"dec{i}_up"),
                ConvBNReLU(c * 2, 3, dtype=self.dtype, name=f"dec{i}_conv"),
            ))
            c *= 2
        self.enc_layers = enc
        self.dec_layers = dec

    def encode(self, x, train: bool = False):
        for down, sq in self.enc_layers:
            x = sq(down(x, train), train)
        return x

    def decode(self, z, train: bool = False):
        for up, conv in self.dec_layers:
            z = conv(nn.relu(up(z)), train)
        return z

    def __call__(self, x, train: bool = False):
        return self.decode(self.encode(x, train), train)


class InvertedResidual(nn.Module):
    """expand 1x1 -> depthwise 3x3 -> project 1x1, residual at stride 1
    (mobilenetv2.py:22-60)."""
    features: int
    strides: int = 1
    expand: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        hidden = cin * self.expand
        y = x
        if self.expand != 1:
            y = ConvBNReLU(hidden, 1, dtype=self.dtype, name="expand")(
                y, train)
        # depthwise: feature_group_count == channels
        y = nn.Conv(hidden, (3, 3), strides=(self.strides,) * 2,
                    padding="SAME", feature_group_count=hidden,
                    use_bias=False, dtype=self.dtype, name="dw")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="dw_bn")(y)
        y = nn.relu(y)
        y = ConvBNReLU(self.features, 1, act=False, dtype=self.dtype,
                       name="project")(y, train)
        if self.strides == 1 and cin == self.features:
            return x + y
        return y


class MobileNetV2Trunk(nn.Module):
    """Inverted-residual BEV trunk (mobilenetv2.py:63-100 scaled to BEV:
    stage widths/strides configurable, returns stride-2 feature map)."""
    out_channels: int = 64
    stage_channels: Sequence[int] = (24, 32, 64)
    stage_blocks: Sequence[int] = (2, 2, 2)
    stage_strides: Sequence[int] = (2, 1, 1)
    expand: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(32, 3, dtype=self.dtype, name="stem")(x, train)
        for si, (c, n, s) in enumerate(zip(
                self.stage_channels, self.stage_blocks, self.stage_strides)):
            for bi in range(n):
                x = InvertedResidual(
                    c, strides=s if bi == 0 else 1, expand=self.expand,
                    dtype=self.dtype, name=f"s{si}_b{bi}")(x, train)
        return ConvBNReLU(self.out_channels, 1, dtype=self.dtype,
                          name="head")(x, train)


class MNASNetTrunk(MobileNetV2Trunk):
    """MNASNet variant: same family with expansion 3 on early stages
    (mnasnet.py uses [3,3,6,6] per-stage expansions)."""
    expand: int = 3


class SqueezeExcite(nn.Module):
    """SE gate (regnet.py:54-73)."""
    se_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        g = x.mean(axis=(-3, -2))
        g = nn.relu(nn.Dense(self.se_channels, dtype=self.dtype,
                             name="fc1")(g))
        g = nn.sigmoid(nn.Dense(C, dtype=self.dtype, name="fc2")(g))
        return x * g.reshape(g.shape[:-1] + (1, 1, C))


class RegNetBottleneck(nn.Module):
    """1x1 -> grouped 3x3 -> SE -> 1x1 with residual
    (regnet.py:76-135)."""
    features: int
    strides: int = 1
    group_width: int = 16
    bottleneck_mult: float = 1.0
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w_b = int(round(self.features * self.bottleneck_mult))
        groups = max(w_b // self.group_width, 1)
        y = ConvBNReLU(w_b, 1, dtype=self.dtype, name="a")(x, train)
        y = ConvBNReLU(w_b, 3, strides=self.strides, groups=groups,
                       dtype=self.dtype, name="b")(y, train)
        if self.se_ratio:
            y = SqueezeExcite(max(int(w_b * self.se_ratio), 1),
                              dtype=self.dtype, name="se")(y)
        y = ConvBNReLU(self.features, 1, act=False, dtype=self.dtype,
                       name="c")(y, train)
        if self.strides != 1 or x.shape[-1] != self.features:
            x = ConvBNReLU(self.features, 1, strides=self.strides,
                           act=False, dtype=self.dtype, name="down")(x, train)
        return nn.relu(x + y)


class RegNetTrunk(nn.Module):
    """SimpleStem + AnyStage stack (regnet.py:33-52,138-180) as a BEV
    trunk."""
    out_channels: int = 64
    stage_channels: Sequence[int] = (32, 64)
    stage_blocks: Sequence[int] = (1, 2)
    stage_strides: Sequence[int] = (2, 1)
    group_width: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(32, 3, dtype=self.dtype, name="stem")(x, train)
        for si, (c, n, s) in enumerate(zip(
                self.stage_channels, self.stage_blocks, self.stage_strides)):
            for bi in range(n):
                x = RegNetBottleneck(
                    c, strides=s if bi == 0 else 1,
                    group_width=self.group_width, dtype=self.dtype,
                    name=f"s{si}_b{bi}")(x, train)
        return ConvBNReLU(self.out_channels, 1, dtype=self.dtype,
                          name="head")(x, train)
