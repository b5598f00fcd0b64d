"""Pyramid multiscale fusion with occupancy-weighted agent mixing (flax).

Parity: fuse_modules/pyramid_fuse.py:17-180 —
  - ResNeXt (Bottleneck, expansion=1, groups=32, width 4) multiscale trunk;
  - per-level 1x1 occupancy head; score = sigmoid(occ) + 1e-4;
  - every agent's feature/score warped into the ego frame with the
    normalized affine matrix; masked softmax over agents; weighted sum;
  - per-level deconv decode + concat (inherited ResNetBEVBackbone behavior).

TPU-first: agents live on a padded axis (B, L, H, W, C) with an agent mask
instead of the reference's record_len-regrouped ragged batch; the masked
softmax replaces the reference's -inf/masked_fill/NaN-scrub dance
(pyramid_fuse.py:53-57) with a clean jnp.where formulation.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from quantv2x_tpu.models.bev_backbone import ResNetBEVBackbone
from quantv2x_tpu.ops.warp_affine import warp_affine_batch


def project_to_ego(feats, affine_ego, align_corners=False):
    """Warp (B, L, h, w, C) agent features into the ego frame ONCE, before
    the pyramid — the reference's proj_first deployment mode
    (fuse_modules/pyramid_fuse_onnx.py:64-67: features pre-warped, fusion
    warp-free; selected at heter_pyramid_collab_mc.py:101). Cuts warp
    gather bytes 3x vs per-level warping (each pyramid level carries equal
    bytes). A warped ones-channel rides along so out-of-FOV collaborator
    pixels can still be masked during fusion — validity information the
    reference's proj_first path simply drops.

    affine_ego: (B, L, 2, 3) ego row of the normalized pairwise matrix.
    Returns (feats_ego, fov_mask) with fov_mask (B, L, h, w, 1) bool.
    """
    B, L, h, w, C = feats.shape
    ones = jnp.ones((B, L, h, w, 1), feats.dtype)
    both = jnp.concatenate([feats, ones], axis=-1)

    def one_batch(bb, tt):
        warped = warp_affine_batch(bb[1:], tt[1:], align_corners)
        return jnp.concatenate([bb[:1], warped], axis=0)

    both = jax.vmap(one_batch)(both, affine_ego)
    return both[..., :C], both[..., C:] > 0.5


def weighted_fuse_ego(feats, scores, agent_mask, fov_mask):
    """weighted_fuse for features already in the ego frame (proj_first).

    feats: (L, h, w, C); scores: (L, h, w, 1); agent_mask: (L,) bool;
    fov_mask: (L, h, w, 1) bool — warped field-of-view validity.
    """
    valid = fov_mask & agent_mask[:, None, None, None]
    logits = jnp.where(valid, scores.astype(feats.dtype), -jnp.inf)
    weights = jax.nn.softmax(logits, axis=0)
    weights = jnp.where(jnp.isfinite(weights), weights, 0.0)
    return (feats * weights).sum(axis=0)


def weighted_fuse(feats, scores, agent_mask, affine_ego, align_corners=False):
    """Fuse one pyramid level across agents.

    feats: (L, h, w, C) agent features (agent frames);
    scores: (L, h, w, 1) positive scores;
    agent_mask: (L,) bool; affine_ego: (L, 2, 3) theta mapping ego->agent
    (row i=ego of the normalized pairwise matrix).
    Returns (h, w, C) fused map in the ego frame.
    """
    L, _, _, C = feats.shape
    # one combined gather for features+scores (same sample grid), and the
    # ego (row 0 of the normalized pairwise matrix vs itself) is exactly
    # the identity transform — bilinear taps land on integer coords — so
    # only collaborators are warped (TPU gathers are the fusion hot spot:
    # ablation measured ~7.7 ms of the 17.6 ms flagship model in warps)
    both = jnp.concatenate([feats, scores.astype(feats.dtype)], axis=-1)
    warped = warp_affine_batch(both[1:], affine_ego[1:], align_corners)
    both_ego = jnp.concatenate([both[:1], warped], axis=0)
    feats_ego = both_ego[..., :C]
    scores_ego = both_ego[..., C:].astype(scores.dtype)

    valid = (scores_ego > 0) & agent_mask[:, None, None, None]
    logits = jnp.where(valid, scores_ego, -jnp.inf)
    weights = jax.nn.softmax(logits, axis=0)
    weights = jnp.where(jnp.isfinite(weights), weights, 0.0)
    return (feats_ego * weights).sum(axis=0)


class PyramidFusion(ResNetBEVBackbone):
    """Multiscale collaborative fusion backbone (stage: single | collab)."""
    layer_nums: Sequence[int] = (3, 5, 8)
    layer_strides: Sequence[int] = (1, 2, 2)
    num_filters: Sequence[int] = (64, 128, 256)
    upsample_strides: Sequence[int] = (1, 2, 4)
    num_upsample_filters: Sequence[int] = (128, 128, 128)
    block: str = "bottleneck"
    align_corners: bool = False

    def setup(self):
        super().setup()
        self.single_heads = [
            nn.Conv(1, (1, 1), dtype=self.dtype, name=f"single_head_{i}")
            for i in range(len(self.layer_nums))
        ]

    def forward_single(self, x, train: bool = False):
        """x: (N, H, W, C) -> (final (N, h, w, C'), occ list)."""
        feats = self.encode(x, train)
        occ = [self.single_heads[i](feats[i]) for i in range(len(feats))]
        return self.decode(feats, train), occ

    def forward_collab(self, x, agent_mask, affine_matrix, train: bool = False,
                       fov_mask=None):
        """x: (B, L, H, W, C); agent_mask: (B, L);
        affine_matrix: (B, L, L, 2, 3) normalized pairwise affines
        (affine_matrix[b, i, j] = theta_{j<-i}).

        fov_mask not None means x is already in the ego frame (proj_first:
        warped once by project_to_ego) — fusion is then warp-free and
        fov_mask (B, L, H, W, 1) gates out-of-FOV collaborator pixels.

        Returns (fused (B, h, w, C'), occ list of (B, L, hi, wi, 1))."""
        B, L, H, W, C = x.shape
        flat = x.reshape(B * L, H, W, C)
        feats = self.encode(flat, train)
        occ_maps = []
        fused_levels = []
        theta_ego = affine_matrix[:, 0]  # (B, L, 2, 3): ego row -> each agent
        stride = 1
        for i, f in enumerate(feats):
            occ = self.single_heads[i](f)                 # (B*L, hi, wi, 1)
            occ_maps.append(occ.reshape(B, L, *occ.shape[1:]))
            score = jax.nn.sigmoid(occ) + 1e-4
            fl = f.reshape(B, L, *f.shape[1:])
            sl = score.reshape(B, L, *score.shape[1:])
            stride *= self.layer_strides[i]
            if fov_mask is not None:
                fm = fov_mask[:, :, ::stride, ::stride]
                fused = jax.vmap(weighted_fuse_ego)(fl, sl, agent_mask, fm)
            else:
                fused = jax.vmap(
                    lambda fb, sb, mb, tb: weighted_fuse(
                        fb, sb, mb, tb, self.align_corners
                    )
                )(fl, sl, agent_mask, theta_ego)
            fused_levels.append(fused)
        return self.decode(tuple(fused_levels), train), occ_maps
