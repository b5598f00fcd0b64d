"""Shared NN building blocks (flax.linen, NHWC, bf16-friendly).

Conventions:
  - activations may be bfloat16 (``dtype``); params and BN stats stay fp32;
  - BatchNorm eps/momentum match the reference (1e-3 / torch-momentum 0.01,
    i.e. flax momentum 0.99 — see e.g. base_bev_backbone_resnet.py:61);
  - all convs NHWC with HWIO kernels — the native TPU layout.
"""

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_EPS = 1e-3
BN_MOMENTUM = 0.99  # = 1 - torch 0.01


class ConvBNReLU(nn.Module):
    """Conv2d -> BatchNorm -> optional ReLU (the reference's ubiquitous trio)."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    groups: int = 1
    use_bias: bool = False
    use_bn: bool = True
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.groups > 1:
            # XLA's TPU grouped conv with tiny per-group channels starves the
            # MXU (measured 8.4x slower than dense at 32x4 groups). Repack
            # the G tiny groups into 128-lane "supergroups" and run ONE
            # XLA grouped conv with feature_group_count = Cin/128 — full
            # MXU tiles at 1/S the dense-ification FLOPs, bit-equal
            # outputs, exact gradients to the same grouped parameter.
            # Falls back to block-diagonal dense when channels don't align.
            cin = x.shape[-1]
            cpg = cin // self.groups
            kernel = self.param(
                "conv_kernel_grouped",
                nn.initializers.lecun_normal(),
                (self.kernel_size, self.kernel_size, cpg, self.features),
            )
            opg = self.features // self.groups
            o_idx = jnp.arange(self.features)
            if (cin == self.features and cin % 128 == 0
                    and 128 % cpg == 0):
                S = cin // 128
                row_idx = ((o_idx // opg) * cpg % 128)[None, :] \
                    + jnp.arange(cpg)[:, None]
                packed = jnp.zeros(
                    (self.kernel_size, self.kernel_size, 128,
                     self.features), kernel.dtype,
                ).at[:, :, row_idx,
                     jnp.broadcast_to(o_idx[None, :],
                                      row_idx.shape)].set(kernel)
                dn = jax.lax.conv_dimension_numbers(
                    x.shape, packed.shape, ("NHWC", "HWIO", "NHWC")
                )
                x = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), packed.astype(self.dtype),
                    (self.strides, self.strides), "SAME",
                    dimension_numbers=dn, feature_group_count=S,
                )
            else:
                row_idx = (o_idx // opg)[None, :] * cpg \
                    + jnp.arange(cpg)[:, None]
                dense = jnp.zeros(
                    (self.kernel_size, self.kernel_size, cin,
                     self.features), kernel.dtype,
                ).at[:, :, row_idx,
                     jnp.broadcast_to(o_idx[None, :],
                                      row_idx.shape)].set(kernel)
                dn = jax.lax.conv_dimension_numbers(
                    x.shape, dense.shape, ("NHWC", "HWIO", "NHWC")
                )
                x = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), dense.astype(self.dtype),
                    (self.strides, self.strides), "SAME",
                    dimension_numbers=dn,
                )
        else:
            x = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.strides, self.strides),
                padding="SAME",
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv",
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
                name="bn",
            )(x)
        if self.act:
            x = nn.relu(x)
        return x


class DeconvBNReLU(nn.Module):
    """ConvTranspose2d -> BN -> ReLU (the backbone's upsample blocks)."""
    features: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride >= 1:
            x = nn.ConvTranspose(
                self.features,
                (self.stride, self.stride),
                strides=(self.stride, self.stride),
                padding="VALID",
                use_bias=False,
                dtype=self.dtype,
                name="deconv",
            )(x)
        else:
            s = int(round(1 / self.stride))
            x = nn.Conv(
                self.features, (s, s), strides=(s, s), padding="VALID",
                use_bias=False, dtype=self.dtype, name="deconv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=self.dtype, name="bn",
        )(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    """ResNet BasicBlock (parity: sub_modules/resblock.py:18-65)."""
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvBNReLU(self.planes, 3, self.stride, dtype=self.dtype,
                         name="conv1")(x, train)
        out = ConvBNReLU(self.planes, 3, 1, act=False, dtype=self.dtype,
                         name="conv2")(out, train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = ConvBNReLU(self.planes, 1, self.stride, act=False,
                                  dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """ResNeXt bottleneck with expansion=1 (parity: resblock.py:67-122 with
    Bottleneck.expansion=1, groups=32, width_per_group=4 as set by
    PyramidFusion, pyramid_fuse.py:71-79)."""
    planes: int
    stride: int = 1
    groups: int = 32
    base_width: int = 4
    expansion: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * self.expansion
        identity = x
        out = ConvBNReLU(width, 1, 1, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBNReLU(width, 3, self.stride, groups=self.groups,
                         dtype=self.dtype, name="conv2")(out, train)
        out = ConvBNReLU(out_ch, 1, 1, act=False, dtype=self.dtype,
                         name="conv3")(out, train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = ConvBNReLU(out_ch, 1, self.stride, act=False,
                                  dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + identity)


class ResNetModified(nn.Module):
    """Stack of residual stages returning every stage's output.

    Parity: sub_modules/resblock.py:125-225 (no stem; stage i = layer_nums[i]
    blocks at layer_strides[i] with num_filters[i] channels).
    """
    layer_nums: Sequence[int]
    layer_strides: Sequence[int]
    num_filters: Sequence[int]
    block: str = "basic"            # "basic" | "bottleneck"
    groups: int = 32
    base_width: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # setup-style (not compact) so the blocks are NAMED children: the
        # fused inference engine (quant/fused_engine) orchestrates whole
        # stages and needs to address individual blocks
        blocks = []
        for i, (n, s, f) in enumerate(
            zip(self.layer_nums, self.layer_strides, self.num_filters)
        ):
            stage = []
            for b in range(n):
                cls = BasicBlock if self.block == "basic" else Bottleneck
                kwargs = dict(planes=f, stride=s if b == 0 else 1,
                              dtype=self.dtype, name=f"layer{i}_block{b}")
                if self.block == "bottleneck":
                    kwargs.update(groups=self.groups,
                                  base_width=self.base_width)
                stage.append(cls(**kwargs))
            blocks.append(tuple(stage))
        self.stages = tuple(blocks)

    def __call__(self, x, train: bool = False):
        outs = []
        for stage in self.stages:
            for blk in stage:
                x = blk(x, train)
            outs.append(x)
        return tuple(outs)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over channel dim with an element validity mask.

    Used by the pillar feature net where padded pillar slots must not skew
    batch statistics (the reference normalizes over exactly the real voxels
    because its shapes are dynamic; our static padding needs the mask).
    """
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        """x: (..., C); mask: broadcastable to x[..., 0] validity."""
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)

        if train:
            m = mask[..., None].astype(jnp.float32)
            cnt = jnp.maximum(m.sum(), 1.0)
            xf = x.astype(jnp.float32) * m
            mean = xf.sum(axis=tuple(range(x.ndim - 1))) / cnt
            var = ((xf - mean) ** 2 * m).sum(axis=tuple(range(x.ndim - 1))) / cnt
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax_rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype)


def jax_rsqrt(x):
    import jax
    return jax.lax.rsqrt(x)
