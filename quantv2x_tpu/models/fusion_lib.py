"""Alternative multi-agent fusion baselines (flax, padded-agent axis).

Parity: fuse_modules/fusion_in_one.py —
  MaxFusion:87, AttFusion:126, DiscoFusion:153, V2VNetFusion:203,
  Where2commFusion:431, Who2comFusion:486 — re-designed for the padded
  (B, L, H, W, C) agent axis with validity masks instead of record_len
  ragged batches. Every module has the same signature:

      __call__(x (B, L, H, W, C), agent_mask (B, L),
               affine_matrix (B, L, L, 2, 3), train=False) -> (B, H, W, C)

  where affine_matrix[b, 0, j] warps agent j into the ego frame.

Notes:
  - the reference's DiscoFusion imports a module that does not exist in the
    repo (fuse_modules/disco_fuse.py is absent); the pixel-weight layer here
    follows the DiscoNet paper (1x1 conv stack on [neighbor, ego] concat);
  - attention modules mask padded agents with -inf logits before softmax.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from quantv2x_tpu.ops.warp_affine import warp_affine_batch


def warp_to_ego(x, affine_matrix):
    """(B, L, H, W, C) -> all agents warped into the ego frame.

    The ego row's self-transform is pinned to identity by
    pairwise_transformation, so slot 0 skips the bilinear gather
    entirely (same optimization as pyramid_fusion.weighted_fuse —
    warps were ~7.7 ms of the 17.6 ms flagship forward)."""
    B, L = x.shape[:2]
    if L == 1:
        return x
    # affine_matrix is (B, L, L, 2, 3); ego row -> each agent is [:, 0]
    theta = affine_matrix[:, 0, 1:]              # (B, L-1, 2, 3)
    flat = x[:, 1:].reshape(B * (L - 1), *x.shape[2:])
    warped = warp_affine_batch(flat, theta.reshape(B * (L - 1), 2, 3))
    return jnp.concatenate(
        [x[:, :1], warped.reshape(B, L - 1, *x.shape[2:])], axis=1)


class MaxFusion(nn.Module):
    """Elementwise max across agents (F-Cooper; fusion_in_one.py:87)."""

    @nn.compact
    def __call__(self, x, agent_mask, affine_matrix, train: bool = False):
        warped = warp_to_ego(x, affine_matrix)
        masked = jnp.where(
            agent_mask[:, :, None, None, None], warped, -jnp.inf
        )
        out = masked.max(axis=1)
        return jnp.where(jnp.isfinite(out), out, 0.0)


class AttFusion(nn.Module):
    """Per-pixel scaled-dot-product attention, ego query
    (fusion_in_one.py:126)."""
    feature_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask, affine_matrix, train: bool = False):
        warped = warp_to_ego(x, affine_matrix)          # (B, L, H, W, C)
        B, L, H, W, C = warped.shape
        q = warped[:, 0].reshape(B, H * W, 1, C)
        kv = warped.transpose(0, 2, 3, 1, 4).reshape(B, H * W, L, C)
        logits = jnp.einsum("bpqc,bplc->bpql", q, kv) / jnp.sqrt(
            jnp.float32(C)
        )
        logits = jnp.where(
            agent_mask[:, None, None, :], logits, -jnp.inf
        )
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bpql,bplc->bpqc", w, kv)
        return out.reshape(B, H, W, C)


class DiscoFusion(nn.Module):
    """DiscoNet pixel-weight matrix fusion (fusion_in_one.py:153)."""
    feature_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask, affine_matrix, train: bool = False):
        warped = warp_to_ego(x, affine_matrix)          # (B, L, H, W, C)
        B, L, H, W, C = warped.shape
        ego = jnp.broadcast_to(warped[:, :1], warped.shape)
        cat = jnp.concatenate([warped, ego], axis=-1).reshape(
            B * L, H, W, 2 * C
        )
        w = nn.Conv(C // 2, (1, 1), dtype=self.dtype, name="pw1")(cat)
        w = nn.relu(w)
        w = nn.Conv(1, (1, 1), dtype=self.dtype, name="pw2")(w)
        w = w.reshape(B, L, H, W, 1)
        w = jnp.where(agent_mask[:, :, None, None, None], w, -jnp.inf)
        w = jax.nn.softmax(w, axis=1)
        w = jnp.where(jnp.isfinite(w), w, 0.0)
        return (warped * w).sum(axis=1)


class ConvGRUCell(nn.Module):
    """Single conv-GRU cell (parity: sub_modules/convgru.py single layer)."""
    hidden_dim: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, h):
        xh = jnp.concatenate([x, h], axis=-1)
        zr = nn.Conv(2 * self.hidden_dim, (self.kernel, self.kernel),
                     padding="SAME", dtype=self.dtype, name="gates")(xh)
        z, r = jnp.split(jax.nn.sigmoid(zr), 2, axis=-1)
        cand = nn.Conv(self.hidden_dim, (self.kernel, self.kernel),
                       padding="SAME", dtype=self.dtype, name="cand")(
            jnp.concatenate([x, r * h], axis=-1)
        )
        cand = jnp.tanh(cand)
        return (1 - z) * h + z * cand


class V2VNetFusion(nn.Module):
    """ConvGRU message passing (fusion_in_one.py:203).

    Per iteration, for every agent i: warp all agents into i's frame, build
    messages conv([neighbor, self]) masked by warped FOV, aggregate
    (avg/max), and update node features with a ConvGRU.
    """
    feature_dim: int
    num_iterations: int = 2
    agg: str = "avg"
    use_gru: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask, affine_matrix, train: bool = False):
        B, L, H, W, C = x.shape
        msg_conv = nn.Conv(C, (3, 3), padding="SAME", dtype=self.dtype,
                           name="msg_cnn")
        gru = ConvGRUCell(C, dtype=self.dtype, name="gru")
        out_mlp = nn.Dense(C, dtype=self.dtype, name="mlp")

        ones = jnp.ones((B, L, H, W, 1), x.dtype)
        feats = x
        for _ in range(self.num_iterations):
            new_feats = []
            for i in range(L):
                theta_i = affine_matrix[:, i]           # (B, L, 2, 3)
                warped = warp_affine_batch(
                    feats.reshape(B * L, H, W, C),
                    theta_i.reshape(B * L, 2, 3),
                ).reshape(B, L, H, W, C)
                fov = warp_affine_batch(
                    ones.reshape(B * L, H, W, 1),
                    theta_i.reshape(B * L, 2, 3),
                ).reshape(B, L, H, W, 1)
                ego_i = jnp.broadcast_to(feats[:, i:i + 1], warped.shape)
                msg = msg_conv(
                    jnp.concatenate([warped, ego_i], axis=-1).reshape(
                        B * L, H, W, 2 * C
                    )
                ).reshape(B, L, H, W, C) * fov
                m = agent_mask[:, :, None, None, None]
                if self.agg == "max":
                    agg = jnp.where(m, msg, -jnp.inf).max(axis=1)
                    agg = jnp.where(jnp.isfinite(agg), agg, 0.0)
                else:
                    cnt = jnp.maximum(
                        agent_mask.sum(axis=1), 1
                    )[:, None, None, None].astype(msg.dtype)
                    agg = jnp.where(m, msg, 0.0).sum(axis=1) / cnt
                if self.use_gru:
                    upd = gru(agg, feats[:, i])
                else:
                    upd = feats[:, i] + agg
                new_feats.append(upd)
            feats = jnp.stack(new_feats, axis=1)
        return out_mlp(feats[:, 0])


class Where2commFusion(nn.Module):
    """MHA + FFN fusion, ego query (fusion_in_one.py:431 / where2comm_attn
    EncodeLayer:64-103)."""
    feature_dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask, affine_matrix, train: bool = False):
        warped = warp_to_ego(x, affine_matrix)
        B, L, H, W, C = warped.shape
        q = warped[:, 0].reshape(B, H * W, C)
        kv = warped.transpose(0, 2, 3, 1, 4).reshape(B, H * W, L, C)
        # attention over the (small) agent axis per pixel
        mask = agent_mask[:, None, None, None, :]       # (B, 1, 1, 1, L)
        ctx = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(q[:, :, None, :], kv, mask=mask)[:, :, 0, :]
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(q + ctx)
        ff = nn.Dense(C, dtype=self.dtype, name="linear2")(
            nn.relu(nn.Dense(C, dtype=self.dtype, name="linear1")(y))
        )
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(y + ff)
        return y.reshape(B, H, W, C)


class Who2comFusion(nn.Module):
    """Per-pixel attention + conv decode (fusion_in_one.py:486)."""
    feature_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask, affine_matrix, train: bool = False):
        att = AttFusion(self.feature_dim, dtype=self.dtype, name="att")(
            x, agent_mask, affine_matrix, train
        )
        ego = x[:, 0]
        cat = jnp.concatenate([ego, att], axis=-1)
        return nn.Conv(self.feature_dim, (3, 3), padding="SAME",
                       dtype=self.dtype, name="decode")(cat)


def _transformer_registry():
    from quantv2x_tpu.models.transformer_fusion import (
        CoBEVTFusion, V2XViTFusion,
    )
    return {"v2xvit": V2XViTFusion, "cobevt": CoBEVTFusion}


FUSION_REGISTRY = {
    "max": MaxFusion,
    "f_cooper": MaxFusion,
    "att": AttFusion,
    "disconet": DiscoFusion,
    "v2vnet": V2VNetFusion,
    "where2comm": Where2commFusion,
    "who2com": Who2comFusion,
}
FUSION_REGISTRY.update(_transformer_registry())
