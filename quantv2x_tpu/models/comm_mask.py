"""Where2comm confidence-gated communication masking.

Parity: comm_modules/where2comm.py:9-79 — per-agent confidence map
(max sigmoid over anchor channels), optional gaussian smoothing, threshold
to a binary transmit mask (ego always transmits everything), communication
rate = transmitted fraction.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CommCfg:
    threshold: float = 0.01
    gaussian_ksize: int = 5
    gaussian_sigma: float = 1.0
    smooth: bool = True


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
