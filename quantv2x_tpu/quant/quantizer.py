"""Uniform affine fake-quantization math (jit-safe, STE gradients).

Parity target: opencood/quant/quant_layer.py:53-346 (UniformAffineQuantizer):
  - asymmetric uniform affine, 2..8 bits;
  - per-channel (weights) or per-tensor (activations) scales;
  - scale init by minmax or MSE grid search (80-point shrink of the max
    range minimizing the Lp(2.4) reconstruction loss, quant_layer.py:201-271);
  - straight-through estimator for round().

All functions are pure; quantizer state is a (delta, zero_point) pair plus
static n_bits, so it serializes into checkpoints and shards trivially.
"""

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp


def round_ste(x):
    """round() with straight-through gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def fake_quant(x, delta, zero_point, n_bits: int):
    """Quantize-dequantize with STE. delta/zero_point broadcast against x."""
    n_levels = 2 ** n_bits
    xq = round_ste(x / delta) + zero_point
    xq = jnp.clip(xq, 0, n_levels - 1)
    return (xq - zero_point) * delta


def quantize_int(x, delta, zero_point, n_bits: int):
    """Real integer quantization (no dequant) -> int8/int32 codes."""
    n_levels = 2 ** n_bits
    xq = jnp.round(x / delta) + zero_point
    xq = jnp.clip(xq, 0, n_levels - 1)
    # asymmetric codes are unsigned (0..2^b - 1)
    return xq.astype(jnp.uint8 if n_bits <= 8 else jnp.int32)


def dequantize_int(xq, delta, zero_point):
    return (xq.astype(jnp.float32) - zero_point) * delta


def _delta_zp_from_range(x_min, x_max, n_bits: int):
    """Asymmetric affine params from a clipping range."""
    n_levels = 2 ** n_bits
    x_min = jnp.minimum(x_min, 0.0)
    x_max = jnp.maximum(x_max, 0.0)
    delta = (x_max - x_min) / (n_levels - 1)
    delta = jnp.maximum(delta, 1e-8)
    zero_point = jnp.round(-x_min / delta)
    return delta, zero_point


def init_minmax(x, n_bits: int, per_channel_axis: Optional[int] = None):
    """Min-max scale init. per_channel_axis: which axis holds channels
    (each channel gets its own scale); None = per-tensor."""
    if per_channel_axis is None:
        return _delta_zp_from_range(x.min(), x.max(), n_bits)
    axes = tuple(i for i in range(x.ndim) if i != per_channel_axis)
    x_min = x.min(axis=axes, keepdims=True)
    x_max = x.max(axis=axes, keepdims=True)
    return _delta_zp_from_range(x_min, x_max, n_bits)


def _lp_loss(pred, tgt, p: float = 2.4, axes=None):
    d = jnp.abs(pred - tgt) ** p
    return d.mean() if axes is None else d.mean(axis=axes, keepdims=True)


def init_mse(x, n_bits: int, per_channel_axis: Optional[int] = None,
             num_steps: int = 80, p: float = 2.4):
    """MSE (Lp-2.4) grid search over shrunken minmax ranges
    (parity: quant_layer.py mse init / lp_loss search loop)."""
    if per_channel_axis is None:
        x_min0, x_max0 = x.min(), x.max()
        reduce_axes = None
    else:
        reduce_axes = tuple(i for i in range(x.ndim) if i != per_channel_axis)
        x_min0 = x.min(axis=reduce_axes, keepdims=True)
        x_max0 = x.max(axis=reduce_axes, keepdims=True)

    def candidate_loss(i):
        frac = 1.0 - (i * 0.01)
        d, zp = _delta_zp_from_range(x_min0 * frac, x_max0 * frac, n_bits)
        xq = fake_quant(x, d, zp, n_bits)
        return _lp_loss(xq, x, p, reduce_axes), d, zp

    losses, deltas, zps = jax.vmap(candidate_loss)(jnp.arange(num_steps))
    best = jnp.argmin(losses, axis=0)
    if per_channel_axis is None:
        return deltas[best], zps[best]
    best_b = jnp.broadcast_to(best, (1,) + losses.shape[1:])
    delta = jnp.take_along_axis(deltas, best_b, axis=0)[0]
    zp = jnp.take_along_axis(zps, best_b, axis=0)[0]
    return delta, zp


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Static quantization config for one tensor role."""
    n_bits: int = 8
    per_channel: bool = False
    channel_axis: int = -1
    scale_method: str = "minmax"    # "minmax" | "mse"

    def init(self, x):
        ax = (self.channel_axis % x.ndim) if self.per_channel else None
        if self.scale_method == "mse":
            return init_mse(x, self.n_bits, ax)
        return init_minmax(x, self.n_bits, ax)

    def apply(self, x, delta, zp):
        return fake_quant(x, delta, zp, self.n_bits)


# canonical reference defaults: W8 per-channel minmax, A8 per-tensor
WEIGHT_SPEC = QuantSpec(n_bits=8, per_channel=True, channel_axis=-1,
                        scale_method="minmax")
ACT_SPEC = QuantSpec(n_bits=8, per_channel=False, scale_method="minmax")
# note: activation RANGES come from the observer (PTQConfig.act_percentile)


def init_entropy(x, n_bits: int, num_bins: int = 2048, num_steps: int = 64):
    """KL-divergence (entropy) calibration over an |x| histogram
    (parity: quant_layer.py entropy init :273-319 / TRT entropy calibrator).

    Searches clip thresholds minimizing the KL divergence between the
    original histogram and its quantized redistribution. Per-tensor only.
    """
    ax = jnp.abs(x).ravel()
    amax = jnp.maximum(ax.max(), 1e-8)
    hist, edges = jnp.histogram(ax, bins=num_bins, range=(0.0, amax))
    hist = hist.astype(jnp.float32) + 1e-6
    n_levels = 2 ** n_bits

    def kl_for(frac):
        t = frac * amax
        cut = jnp.clip((t / amax * num_bins).astype(jnp.int32), n_levels,
                       num_bins)
        idx = jnp.arange(num_bins)
        inside = idx < cut
        p = jnp.where(inside, hist, 0.0)
        # clipped mass goes to the last inside bin
        p = p.at[jnp.maximum(cut - 1, 0)].add(jnp.where(~inside, hist, 0.0).sum())
        # quantized redistribution: group inside bins into n_levels buckets
        bucket = jnp.clip(idx * n_levels // jnp.maximum(cut, 1), 0,
                          n_levels - 1)
        bucket = jnp.where(inside, bucket, n_levels - 1)
        bsum = jnp.zeros(n_levels).at[bucket].add(p)
        bcnt = jnp.zeros(n_levels).at[bucket].add(inside.astype(jnp.float32))
        q = bsum[bucket] / jnp.maximum(bcnt[bucket], 1.0)
        q = jnp.where(inside, q, 1e-6) + 1e-6
        pn = p / p.sum()
        qn = q / q.sum()
        return jnp.sum(jnp.where(pn > 0, pn * jnp.log(pn / qn), 0.0))

    fracs = jnp.linspace(0.02, 1.0, num_steps)
    kls = jax.vmap(kl_for)(fracs)
    best_t = fracs[jnp.argmin(kls)] * amax
    return _delta_zp_from_range(-best_t, best_t, n_bits)
