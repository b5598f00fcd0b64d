"""Multi-scale deformable attention + deformable transformer encoder.

TPU-native counterparts of the reference's Deformable-DETR stack:
  - sub_modules/ms_deform_attn.py:30-120 (MSDeformAttn over a CUDA
    ``MSDeformAttnFunction`` im2col kernel),
  - sub_modules/functions/ms_deform_attn_func.py (the sampling core),
  - sub_modules/detr_module.py:8-129 (PositionEmbeddingSine +
    DeformableTransformerEncoder/Layer),
  - stamp_modules/adapter.py:353-497 (single-level
    DeformableSpatialAttentionLayer used by AdapterDSA).

Design differences from the CUDA path (deliberate, TPU-first):
  - per-LEVEL NHWC feature maps with static shapes instead of one
    flattened (sum HW, C) buffer + dynamic ``level_start_index`` — XLA
    needs static slicing, and per-level maps let each gather batch stay a
    single fused gather kernel;
  - the bilinear sampling is an explicit 4-tap gather
    (``ops/deform_conv.bilinear_sample_nhwc``), differentiable through
    both values and sampling locations — no im2col staging buffer;
  - grid_sample(align_corners=False) coordinate convention preserved:
    normalized location ``l`` in [0, 1] maps to pixel ``l*S - 0.5``.
"""

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from quantv2x_tpu.ops.deform_conv import bilinear_sample_nhwc


def deformable_attention(values, sampling_locations, attention_weights):
    """Sampling core (parity: ms_deform_attn_func.MSDeformAttnFunction).

    values: sequence of L level maps, each (B, H_l, W_l, n_heads, dph).
    sampling_locations: (B, Nq, n_heads, L, P, 2) normalized (x, y) in
        [0, 1] over each level's extent (grid_sample convention).
    attention_weights: (B, Nq, n_heads, L, P), softmaxed over (L, P).
    Returns (B, Nq, n_heads * dph).
    """
    B, Nq, nH, L, P, _ = sampling_locations.shape
    dph = values[0].shape[-1]

    out = jnp.zeros((B, Nq, nH, dph), values[0].dtype)
    for lv in range(L):
        v = values[lv]                           # (B, H, W, nH, dph)
        H, W = v.shape[1], v.shape[2]
        loc = sampling_locations[:, :, :, lv]    # (B, Nq, nH, P, 2)
        px = loc[..., 0] * W - 0.5
        py = loc[..., 1] * H - 0.5

        def sample_bh(v_hw, py_h, px_h):
            # v_hw (H, W, dph); py/px (Nq, P) -> (Nq, P, dph)
            return bilinear_sample_nhwc(v_hw, py_h, px_h)

        # vmap heads then batch: (B, nH, Nq, P, dph)
        samp = jax.vmap(                          # over batch
            jax.vmap(sample_bh, in_axes=(2, 1, 1))  # over heads
        )(v, py, px)
        w = jnp.transpose(attention_weights[:, :, :, lv], (0, 2, 1, 3))
        out = out + jnp.transpose(
            (samp * w[..., None]).sum(axis=3), (0, 2, 1, 3))
    return out.reshape(B, Nq, nH * dph)


def _offset_grid_bias(n_heads: int, n_levels: int, n_points: int):
    """Directional per-head init for the sampling-offset bias
    (ms_deform_attn.py:_reset_parameters:63-70): head h points along
    angle 2*pi*h/n_heads, ring radius grows with the point index."""
    import numpy as np
    thetas = np.arange(n_heads, dtype=np.float32) * (2 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return jnp.asarray(grid.reshape(-1))


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention (parity: ms_deform_attn.MSDeformAttn).

    d_model must divide by n_heads. Offsets/weights are predicted from the
    query; values are per-level NHWC maps.
    """
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, reference_points, value_levels,
                 padding_masks: Optional[Sequence] = None):
        """query: (B, Nq, C); reference_points: (B, Nq, L, 2) in [0, 1];
        value_levels: L maps (B, H_l, W_l, C); padding_masks: optional L
        bool maps (B, H_l, W_l), True = pad (zeroed like the reference's
        masked_fill). Returns (B, Nq, C)."""
        if self.d_model % self.n_heads:
            raise ValueError(
                f"d_model {self.d_model} % n_heads {self.n_heads} != 0")
        B, Nq, _ = query.shape
        L, nH, P = self.n_levels, self.n_heads, self.n_points
        dph = self.d_model // nH

        off = nn.Dense(
            nH * L * P * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32:
                _offset_grid_bias(nH, L, P).astype(dtype),
            name="sampling_offsets")(query).reshape(B, Nq, nH, L, P, 2)
        attw = nn.Dense(
            nH * L * P, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights")(query).reshape(B, Nq, nH, L * P)
        attw = jax.nn.softmax(attw, axis=-1).reshape(B, Nq, nH, L, P)

        vproj = nn.Dense(self.d_model, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name="value_proj")
        values = []
        for lv, v in enumerate(value_levels):
            v = vproj(v)
            if padding_masks is not None and padding_masks[lv] is not None:
                v = jnp.where(padding_masks[lv][..., None], 0.0, v)
            values.append(v.reshape(v.shape[0], v.shape[1], v.shape[2],
                                    nH, dph))

        # sampling_locations = ref + offset / (W_l, H_l) per level
        norms = jnp.stack(
            [jnp.array([v.shape[2], v.shape[1]], jnp.float32)
             for v in values])                        # (L, 2) [W, H]
        loc = (reference_points[:, :, None, :, None, :]
               + off / norms[None, None, None, :, None, :])
        out = deformable_attention(values, loc, attw)
        return nn.Dense(self.d_model, dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="output_proj")(out)


def reference_points_2d(H: int, W: int, scale=(1.0, 1.0),
                        dtype=jnp.float32):
    """(H*W, 2) normalized (x, y) pixel-center reference points, optionally
    scaled (parity: adapter.get_reference_points:483-497 /
    detr_module.get_reference_points:100-113 at valid_ratio=1)."""
    ys = (jnp.arange(H, dtype=dtype) + 0.5) / H * scale[0]
    xs = (jnp.arange(W, dtype=dtype) + 0.5) / W * scale[1]
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx.ravel(), gy.ravel()], axis=-1)


class DeformableSpatialAttentionLayer(nn.Module):
    """Single-level DSA layer (parity: stamp_modules/adapter.py:353-481).

    The query lives on the OUTPUT grid (possibly a different lidar range
    than the value map); ``scale_ratio`` rescales the reference points so
    a query pixel attends to the value-map location covering the same
    world position (adapter self.ratio).
    """
    out_channel: int
    n_heads: int = 8
    n_points: int = 4
    scale_ratio: Tuple[float, float] = (1.0, 1.0)
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, value, out_hw, deterministic: bool = True):
        """query (B, Nq, out_channel) on the out_hw grid; value
        (B, H, W, C_in). Returns (B, Nq, out_channel) with residual."""
        B, Nq, _ = query.shape
        nH, P = self.n_heads, self.n_points
        dph = self.out_channel // nH

        off = nn.Dense(
            nH * P * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32:
                _offset_grid_bias(nH, 1, P).astype(dtype),
            name="sampling_offsets")(query).reshape(B, Nq, nH, 1, P, 2)
        attw = nn.Dense(nH * P, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights")(query)
        attw = jax.nn.softmax(
            attw.reshape(B, Nq, nH, P), axis=-1)[:, :, :, None, :]

        v = nn.Dense(self.out_channel, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name="value_proj")(value)
        v = v.reshape(v.shape[0], v.shape[1], v.shape[2], nH, dph)

        H, W = v.shape[1], v.shape[2]
        ref = reference_points_2d(out_hw[0], out_hw[1],
                                  (self.scale_ratio[0], self.scale_ratio[1]),
                                  dtype=query.dtype)
        loc = (ref[None, :, None, None, None, :]
               + off / jnp.array([W, H], query.dtype))
        out = deformable_attention([v], loc, attw)
        out = nn.Dense(self.out_channel, dtype=self.dtype,
                       kernel_init=nn.initializers.xavier_uniform(),
                       name="output_proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out + query


def position_embedding_sine_2d(H: int, W: int, channels: int,
                               temperature: float = 10000.0,
                               dtype=jnp.float32):
    """(H, W, channels) sinusoidal 2D embedding (parity:
    detr_module.PositionEmbeddingSine:8-49 / adapter
    PositionalEncoding2D:38-67 — y/x split across the channel halves,
    interleaved sin/cos)."""
    half = channels // 2
    dim_t = temperature ** (2 * (jnp.arange(half, dtype=dtype) // 2) / half)
    ys = jnp.arange(H, dtype=dtype)[:, None] / dim_t      # (H, half)
    xs = jnp.arange(W, dtype=dtype)[:, None] / dim_t      # (W, half)

    def interleave(a):
        return jnp.stack([jnp.sin(a[..., 0::2]), jnp.cos(a[..., 1::2])],
                         axis=-1).reshape(a.shape[:-1] + (-1,))

    ey = jnp.broadcast_to(interleave(ys)[:, None, :], (H, W, half))
    ex = jnp.broadcast_to(interleave(xs)[None, :, :], (H, W, half))
    emb = jnp.concatenate([ey, ex], axis=-1)
    if emb.shape[-1] < channels:                  # odd channel count
        emb = jnp.pad(emb, ((0, 0), (0, 0), (0, channels - emb.shape[-1])))
    return emb


class DeformableTransformerEncoderLayer(nn.Module):
    """MSDeformAttn + FFN with pre-add position embedding (parity:
    detr_module.DeformableTransformerEncoderLayer:51-91)."""
    d_model: int = 256
    d_ffn: int = 1024
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, value_levels,
                 deterministic: bool = True):
        """src/pos: (B, Nq, C) (queries = flattened level features);
        value_levels: the same features as L NHWC maps."""
        q = src if pos is None else src + pos
        att = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                           self.n_points, dtype=self.dtype,
                           name="self_attn")(
            q, reference_points, value_levels)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            src + nn.Dropout(self.dropout)(att, deterministic=deterministic))
        ff = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(src)
        ff = nn.Dropout(self.dropout)(nn.relu(ff),
                                      deterministic=deterministic)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ff)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(
            src + nn.Dropout(self.dropout)(ff, deterministic=deterministic))


class DeformableTransformerEncoder(nn.Module):
    """Stack of deformable encoder layers over multi-scale NHWC maps
    (parity: detr_module.DeformableTransformerEncoder:93-124). Input and
    output are the L level maps; queries are their flattened union."""
    num_layers: int = 6
    d_model: int = 256
    d_ffn: int = 1024
    n_heads: int = 8
    n_points: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, value_levels, deterministic: bool = True):
        B = value_levels[0].shape[0]
        L = len(value_levels)
        shapes = [(v.shape[1], v.shape[2]) for v in value_levels]
        src = jnp.concatenate(
            [v.reshape(B, -1, self.d_model) for v in value_levels], axis=1)
        pos = jnp.concatenate(
            [jnp.broadcast_to(
                position_embedding_sine_2d(h, w, self.d_model,
                                           dtype=src.dtype).reshape(
                    1, h * w, self.d_model),
                (B, h * w, self.d_model))
             for h, w in shapes], axis=1)
        # per-query reference point, broadcast to every level (valid_ratio=1)
        ref = jnp.concatenate(
            [jnp.broadcast_to(reference_points_2d(h, w, dtype=src.dtype)
                              [None], (B, h * w, 2))
             for h, w in shapes], axis=1)
        ref = jnp.broadcast_to(ref[:, :, None, :], ref.shape[:2] + (L, 2))

        def split_levels(flat):
            out, start = [], 0
            for h, w in shapes:
                out.append(flat[:, start:start + h * w].reshape(
                    B, h, w, self.d_model))
                start += h * w
            return out

        for i in range(self.num_layers):
            src = DeformableTransformerEncoderLayer(
                self.d_model, self.d_ffn, L, self.n_heads, self.n_points,
                dtype=self.dtype, name=f"layer{i}")(
                src, pos, ref, split_levels(src),
                deterministic=deterministic)
        return split_levels(src)
