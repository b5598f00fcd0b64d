"""Deformable 2D convolution via bilinear gather (TPU-native).

Parity target: the reference's deformable options inside the STAMP/HEAL
aligner stack (stamp_modules/feature_alignnet_modules.py:79-115 ConvEncoder
/ SDTAEncoder `deformable=True`, backed by torchvision deform_conv2d /
sub_modules/deformable_attention.py). CUDA deform_conv gathers input at
learned per-tap offsets; here the gather is an explicit bilinear
interpolation at (base tap + offset) positions — static shapes, fully
jittable, differentiable through both features and offsets.
"""

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def bilinear_sample_nhwc(x, py, px):
    """Sample (H, W, C) map at fractional (py, px) positions of any shape
    S -> (*S, C); zero padding outside."""
    H, W, _ = x.shape
    y0 = jnp.floor(py).astype(jnp.int32)
    x0 = jnp.floor(px).astype(jnp.int32)
    ty = py - y0
    tx = px - x0

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        v = x[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb[..., None], v, 0.0)

    return ((1 - ty)[..., None] * (1 - tx)[..., None] * tap(y0, x0)
            + (1 - ty)[..., None] * tx[..., None] * tap(y0, x0 + 1)
            + ty[..., None] * (1 - tx)[..., None] * tap(y0 + 1, x0)
            + ty[..., None] * tx[..., None] * tap(y0 + 1, x0 + 1))


class DeformableConv2d(nn.Module):
    """3x3 deformable conv: a regular conv predicts per-tap (dy, dx)
    offsets; the input is bilinearly gathered at deformed tap positions
    and contracted with the kernel (one einsum — MXU-friendly)."""
    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        B, H, W, C = x.shape
        K = self.kernel_size
        # offset head initialized to zero: starts as a regular conv
        offsets = nn.Conv(2 * K * K, (K, K), padding="SAME",
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          dtype=self.dtype, name="offset")(x)
        offsets = offsets.reshape(B, H, W, K * K, 2)

        gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32),
                              indexing="ij")
        r = (K - 1) / 2
        dy, dx = jnp.meshgrid(jnp.arange(K, dtype=jnp.float32) - r,
                              jnp.arange(K, dtype=jnp.float32) - r,
                              indexing="ij")
        taps = jnp.stack([dy.ravel(), dx.ravel()], axis=-1)  # (K*K, 2)

        py = (gy[None, :, :, None] + taps[None, None, None, :, 0]
              + offsets[..., 0].astype(jnp.float32))
        px = (gx[None, :, :, None] + taps[None, None, None, :, 1]
              + offsets[..., 1].astype(jnp.float32))

        sampled = jax.vmap(bilinear_sample_nhwc)(
            x.astype(jnp.float32), py, px)          # (B, H, W, K*K, C)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (K * K, C, self.features))
        y = jnp.einsum("bhwkc,kcf->bhwf", sampled.astype(self.dtype),
                       kernel.astype(self.dtype))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y[0] if squeeze else y
