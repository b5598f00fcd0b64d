"""Transformer fusion modules: V2X-ViT and CoBEVT (flax, padded agents).

Parity targets:
  - V2XViTFusion (fuse_modules/fusion_in_one.py:320 + sub_modules/
    v2xvit_basic.py, hmsa.py:HGTCavAttention, mswin.py:
    PyramidWindowAttention, split_attn.py): blocks of heterogeneous
    cross-agent attention followed by multi-window-size BEV self-attention
    merged by split attention, with FFN + prenorm;
  - CoBEVT (fusion_in_one.py:374 + swap_fusion_modules.SwapFusionBlockMask):
    alternating local-window and global-grid ("swap") attention over the
    (agent, window) token axis, mean-pooled over agents with an MLP head.

TPU notes: window partition is reshape-only (no gather); attention over
(agent x window) tokens is a small-dim batched MXU matmul; padded agents are
masked out of every softmax.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp



def warp_to_ego(x, affine_matrix):
    # deferred import: fusion_lib's registry imports this module at its own
    # module level, so an eager import here would make "import
    # transformer_fusion first" fail with a partially-initialized module
    from quantv2x_tpu.models.fusion_lib import warp_to_ego as _w
    return _w(x, affine_matrix)


def _window_partition(x, ws):
    """(B, H, W, C) -> (B*nH*nW, ws*ws, C). H, W must divide ws."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * (H // ws) * (W // ws), ws * ws, C)


def _window_merge(x, ws, B, H, W):
    C = x.shape[-1]
    x = x.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


class PreNormMHA(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype
        )(y, y, mask=mask)
        return x + y


class PreNormFFN(nn.Module):
    mlp_ratio: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(C * self.mlp_ratio, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(C, dtype=self.dtype)(y)
        return x + y


class HGTCavAttention(nn.Module):
    """Heterogeneous cross-agent attention (parity: hmsa.py HGTCavAttention —
    per-pixel attention over agents with per-agent-type key/value
    projections; types here = agent slot identity embedding)."""
    num_heads: int = 8
    max_agents: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask):
        """x: (B, L, H, W, C) -> same shape (every agent attends to all)."""
        B, L, H, W, C = x.shape
        type_emb = self.param(
            "type_emb", nn.initializers.normal(0.02), (self.max_agents, C)
        )
        xt = x + type_emb[:L][None, :, None, None, :].astype(x.dtype)
        tokens = xt.transpose(0, 2, 3, 1, 4).reshape(B * H * W, L, C)
        mask = jnp.broadcast_to(
            agent_mask[:, None, None, None, :], (B, H, W, 1, L)
        ).reshape(B * H * W, 1, 1, L)
        y = nn.LayerNorm(dtype=self.dtype)(tokens)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype
        )(y, y, mask=mask)
        tokens = tokens + y
        out = tokens.reshape(B, H, W, L, C).transpose(0, 3, 1, 2, 4)
        return out


class PyramidWindowAttention(nn.Module):
    """Multi-window-size BEV self-attention merged by split attention
    (parity: mswin.py PyramidWindowAttention + split_attn.py SplitAttn)."""
    window_sizes: Sequence[int] = (4, 8)
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (N, H, W, C)."""
        N, H, W, C = x.shape
        branches = []
        for ws in self.window_sizes:
            pad_h = (-H) % ws
            pad_w = (-W) % ws
            xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            t = _window_partition(xp, ws)
            t = PreNormMHA(self.num_heads, dtype=self.dtype,
                           name=f"win{ws}")(t)
            y = _window_merge(t, ws, N, H + pad_h, W + pad_w)[:, :H, :W]
            branches.append(y)
        if len(branches) == 1:
            return branches[0]
        # split attention: global per-branch gates (split_attn.py)
        stack = jnp.stack(branches, axis=1)         # (N, K, H, W, C)
        gap = stack.mean(axis=(2, 3))               # (N, K, C)
        a = nn.Dense(C, dtype=self.dtype, name="sa1")(
            nn.gelu(nn.Dense(C, dtype=self.dtype, name="sa0")(
                gap.sum(axis=1)))
        )
        logits = jnp.einsum("nkc,nc->nk", gap, a)
        gates = jax.nn.softmax(logits, axis=1)[:, :, None, None, None]
        return (stack * gates).sum(axis=1)


class V2XViTFusion(nn.Module):
    """V2X-ViT: depth x [HGT agent attention -> pyramid window attention ->
    FFN], then take the ego slot (fusion_in_one.py:320)."""
    feature_dim: int
    depth: int = 2
    num_heads: int = 8
    window_sizes: Sequence[int] = (4, 8)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask, affine_matrix, train: bool = False):
        warped = warp_to_ego(x, affine_matrix)      # (B, L, H, W, C)
        B, L, H, W, C = warped.shape
        h = warped
        for d in range(self.depth):
            h = HGTCavAttention(self.num_heads, dtype=self.dtype,
                                name=f"hgt{d}")(h, agent_mask)
            flat = h.reshape(B * L, H, W, C)
            flat = PyramidWindowAttention(
                self.window_sizes, self.num_heads, dtype=self.dtype,
                name=f"pwa{d}")(flat)
            flat_t = flat.reshape(B * L, H * W, C)
            flat_t = PreNormFFN(dtype=self.dtype, name=f"ffn{d}")(flat_t)
            h = flat_t.reshape(B, L, H, W, C)
            # padded agents stay zero so they never leak through HGT value
            h = jnp.where(agent_mask[:, :, None, None, None], h, 0.0)
        return h[:, 0]


class SwapFusionBlock(nn.Module):
    """One CoBEVT block: local window attention then global grid attention
    over (agent x window) tokens (swap_fusion_modules.SwapFusionBlockMask)."""
    window_size: int = 4
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    def _attend(self, x, agent_mask, grid: bool):
        B, L, H, W, C = x.shape
        ws = self.window_size
        if grid:
            # grid attention: tokens strided across the map
            xr = x.reshape(B * L, ws, H // ws, ws, W // ws, C)
            xr = xr.transpose(0, 2, 4, 1, 3, 5).reshape(
                B, L, (H // ws) * (W // ws), ws * ws, C
            )
        else:
            xr = x.reshape(B * L, H // ws, ws, W // ws, ws, C)
            xr = xr.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, L, (H // ws) * (W // ws), ws * ws, C
            )
        nw = xr.shape[2]
        # fold agents into the token axis: (B*nw, L*ws*ws, C)
        tokens = xr.transpose(0, 2, 1, 3, 4).reshape(B * nw, L * ws * ws, C)
        mask = jnp.repeat(agent_mask, ws * ws, axis=-1)      # (B, L*ws*ws)
        mask = jnp.broadcast_to(
            mask[:, None, None, None, :], (B, nw, 1, 1, L * ws * ws)
        ).reshape(B * nw, 1, 1, L * ws * ws)
        tokens = PreNormMHA(self.num_heads, dtype=self.dtype,
                            name="attn_grid" if grid else "attn_win")(
            tokens, mask=mask
        )
        tokens = PreNormFFN(dtype=self.dtype,
                            name="ffn_grid" if grid else "ffn_win")(tokens)
        xr = tokens.reshape(B, nw, L, ws * ws, C).transpose(0, 2, 1, 3, 4)
        if grid:
            xr = xr.reshape(B * L, H // ws, W // ws, ws, ws, C)
            xr = xr.transpose(0, 3, 1, 4, 2, 5).reshape(B, L, H, W, C)
        else:
            xr = xr.reshape(B * L, H // ws, W // ws, ws, ws, C)
            xr = xr.transpose(0, 1, 3, 2, 4, 5).reshape(B, L, H, W, C)
        return xr

    @nn.compact
    def __call__(self, x, agent_mask):
        x = self._attend(x, agent_mask, grid=False)
        x = self._attend(x, agent_mask, grid=True)
        return x


class CoBEVTFusion(nn.Module):
    """CoBEVT: depth x SwapFusionBlock, mean over agents + MLP head
    (fusion_in_one.py:374-447)."""
    feature_dim: int
    depth: int = 1
    window_size: int = 4
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, agent_mask, affine_matrix, train: bool = False):
        warped = warp_to_ego(x, affine_matrix)
        B, L, H, W, C = warped.shape
        ws = self.window_size
        pad_h, pad_w = (-H) % ws, (-W) % ws
        h = jnp.pad(warped, ((0, 0), (0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        for d in range(self.depth):
            h = SwapFusionBlock(self.window_size, self.num_heads,
                                dtype=self.dtype, name=f"swap{d}")(
                h, agent_mask)
        h = h[:, :, :H, :W]
        m = agent_mask[:, :, None, None, None].astype(h.dtype)
        pooled = (h * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        y = nn.LayerNorm(dtype=self.dtype)(pooled)
        return nn.Dense(C, dtype=self.dtype)(y)
