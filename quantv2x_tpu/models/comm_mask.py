"""Where2comm confidence-gated communication: masks, request maps, and the
multi-round exchange gate.

Parity:
  - comm_modules/where2comm.py:9-79 — per-agent confidence map (max
    sigmoid over anchor channels), optional gaussian smoothing, threshold
    to a binary transmit mask (ego always transmits everything),
    communication rate = transmitted fraction;
  - fuse_modules/where2comm_attn.py:174-341 — the Where2comm fusion
    wrapper: confidence-masked features, per-pixel attention fusion,
    `round` multi-round exchange. The REQUEST formulation
    a_ji = (1 - q_i) * q_ji (ego's own confidence damps requests where the
    ego already sees well — the paper's mechanism, left as a comment in
    the reference code) is implemented behind ``request=True``.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CommCfg:
    threshold: float = 0.01
    gaussian_ksize: int = 5
    gaussian_sigma: float = 1.0
    smooth: bool = True
    request: bool = False      # a_ji = (1 - q_ego->j) * q_j gating
    rounds: int = 1            # multi-round exchange (where2comm_attn round)


def _gaussian_kernel(k: int, sigma: float):
    c = k // 2
    x, y = np.mgrid[-c: k - c, -c: k - c]
    g = np.exp(-(x ** 2 + y ** 2) / (2 * sigma ** 2)) / (2 * np.pi * sigma)
    return jnp.asarray(g, jnp.float32)


def communication_mask(confidence_logits, agent_mask, cfg: CommCfg):
    """confidence_logits: (B, L, H, W, A) occupancy/cls logits per agent.

    Returns (masks (B, L, H, W, 1), rate scalar) — masks gate the features
    each collaborator transmits; the ego (slot 0) always sends everything.
    """
    conf = jax.nn.sigmoid(confidence_logits).max(axis=-1, keepdims=True)
    if cfg.smooth:
        k = _gaussian_kernel(cfg.gaussian_ksize, cfg.gaussian_sigma)
        B, L, H, W, _ = conf.shape
        smoothed = jax.lax.conv_general_dilated(
            conf.reshape(B * L, H, W, 1), k[:, :, None, None],
            (1, 1), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                (B * L, H, W, 1), (cfg.gaussian_ksize, cfg.gaussian_ksize, 1, 1),
                ("NHWC", "HWIO", "NHWC")),
        ).reshape(conf.shape)
    else:
        smoothed = conf
    mask = (smoothed > cfg.threshold).astype(conf.dtype)
    # ego transmits everything (parity: mask[::2] = 1 which covers slot 0)
    mask = mask.at[:, 0].set(1.0)
    valid = agent_mask[:, :, None, None, None].astype(conf.dtype)
    rate = (mask * valid).sum() / jnp.maximum(
        valid.sum() * mask.shape[2] * mask.shape[3], 1.0
    )
    return mask * valid, rate


def apply_comm_mask(agent_feats, masks):
    """Gate the transmitted BEV features (non-ego agents only)."""
    gated = agent_feats * masks
    return gated.at[:, 0].set(agent_feats[:, 0])


def _smooth(conf, cfg: CommCfg):
    if not cfg.smooth:
        return conf
    k = _gaussian_kernel(cfg.gaussian_ksize, cfg.gaussian_sigma)
    B, L, H, W, _ = conf.shape
    return jax.lax.conv_general_dilated(
        conf.reshape(B * L, H, W, 1).astype(jnp.float32),
        k[:, :, None, None], (1, 1), "SAME",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            (B * L, H, W, 1),
            (cfg.gaussian_ksize, cfg.gaussian_ksize, 1, 1),
            ("NHWC", "HWIO", "NHWC")),
    ).reshape(conf.shape).astype(conf.dtype)


class Where2commGate(nn.Module):
    """Confidence head + request-gated transmit masking + multi-round
    exchange around a per-pixel fusion module.

    One round: every agent computes a confidence map from its own BEV
    feature (1x1 "psm" head, the reference's request map source); the
    transmitted feature is masked where (request-gated) confidence falls
    below the threshold; ``fuse_fn`` fuses the masked stack into the ego
    frame. Further rounds recompute the EGO confidence from the fused
    feature, so collaborators only re-send cells the ego still lacks —
    each round strictly reduces the transmitted fraction.

    Returns (fused, comm_rate, masks).
    """
    cfg: CommCfg
    anchor_num: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, agent_mask, affine_matrix, fuse_fn,
                 train: bool = False):
        from quantv2x_tpu.ops.warp_affine import warp_affine

        B, L, H, W, C = feats.shape
        conf_head = nn.Conv(self.anchor_num, (1, 1), dtype=self.dtype,
                            name="psm_head")
        valid = agent_mask[:, :, None, None, None].astype(jnp.float32)

        logits = conf_head(feats)                          # (B, L, H, W, A)
        q = _smooth(jax.nn.sigmoid(logits).max(axis=-1, keepdims=True),
                    self.cfg)

        fused = None
        total_tx, rounds_done = 0.0, 0
        q_ego = q[:, 0]
        for r in range(max(self.cfg.rounds, 1)):
            gate = q
            if self.cfg.request or r > 0:
                # request map: warp the ego's current confidence into each
                # collaborator's frame; send only where the ego is unsure
                theta_to_j = affine_matrix[:, :, 0]        # (B, L, 2, 3)
                q_ego_in_j = jax.vmap(
                    lambda qe, th: jax.vmap(
                        lambda t: warp_affine(qe, t))(th)
                )(q_ego, theta_to_j)                       # (B, L, H, W, 1)
                gate = (1.0 - q_ego_in_j) * q
            mask = (gate > self.cfg.threshold).astype(feats.dtype)
            mask = mask.at[:, 0].set(1.0)                  # ego keeps all
            mask = mask * valid.astype(feats.dtype)
            gated = apply_comm_mask(feats, mask)
            fused = fuse_fn(gated, agent_mask, affine_matrix, train)
            nz = jnp.maximum(valid[:, 1:].sum() * H * W, 1.0)
            total_tx += (mask[:, 1:]
                         * valid[:, 1:].astype(feats.dtype)).sum() / nz
            rounds_done += 1
            if r + 1 < self.cfg.rounds:
                # ego's refreshed confidence from the fused feature
                q_ego = _smooth(
                    jax.nn.sigmoid(conf_head(fused[:, None])).max(
                        axis=-1, keepdims=True), self.cfg)[:, 0]
        return fused, total_tx / rounds_done, mask
