"""Post-training quantization engine: functional W8A8 over flax models.

Re-designs the reference's nn.Module-surgery PTQ
(opencood/quant/quant_model.py:7-147, quant_layer.py:349-497) as pure
functional transforms:

  - **weights**: every `kernel` leaf in the param tree (except skip-listed
    scopes, e.g. the codebook — parity with specials_unquantized,
    quant_block.py:1573-1615) gets per-output-channel scales and is
    fake-quantized by `quantize_weights`; AdaRound later swaps the round()
    for learned rounding on the same tree;
  - **activations**: `nn.intercept_methods` wraps the quantization-unit
    modules (ConvBNReLU / DeconvBNReLU / PFNLayer / head convs). In
    *observe* mode each unit sows its output min/max; in *quantized* mode
    each unit's output is fake-quantized with calibrated per-tensor scales.
    Act quant after the fused conv+BN+ReLU matches the reference QuantModule
    placement (quant_layer.py:400-420). Quantizing after the PFN max-pool is
    exact: max of grid points is a grid point.
  - detection-head outputs stay unquantized (parity:
    disable_network_output_quantization, quant_model.py:129-136).

The same interceptor machinery drives calibration capture for AdaRound
block reconstruction (quant/adaround.py).
"""

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from quantv2x_tpu.models.layers import ConvBNReLU, DeconvBNReLU
from quantv2x_tpu.models.pillar_encoder import PFNLayer
from quantv2x_tpu.quant.quantizer import ACT_SPEC, WEIGHT_SPEC, QuantSpec

# module types that form activation-quantization units
UNIT_TYPES = (ConvBNReLU, DeconvBNReLU, PFNLayer)
# raw layers quantized directly when not inside a unit (heads etc.)
RAW_TYPES = (nn.Conv, nn.ConvTranspose, nn.Dense)
# submodule names of composite units — raw layers with these names are
# already covered by their parent unit
_WRAPPED_NAMES = {"conv", "deconv", "linear"}
# params under these path fragments stay full precision
DEFAULT_SKIP_SCOPES = ("codebook",)
# act-quant disabled for network outputs (cls/reg/dir)
DEFAULT_OUTPUT_HEADS = ("cls_head", "reg_head", "dir_head")


def _path_str(path) -> str:
    return "/".join(str(p) for p in path)


def _in_scope(path_s: str, scopes: Sequence[str]) -> bool:
    return any(s in path_s for s in scopes)


# ---------------------------------------------------------------------------
# Weights
# ---------------------------------------------------------------------------

def quantize_weights(params, spec: QuantSpec = WEIGHT_SPEC,
                     skip_scopes: Sequence[str] = DEFAULT_SKIP_SCOPES):
    """Fake-quantize all kernel leaves; returns (qparams, scales dict).

    scales: {path_str: (delta, zero_point)} aligned with kernel leaves.
    """
    scales = {}

    def visit(path, leaf):
        path_s = _path_str([p.key for p in path])
        if (path_s.endswith("kernel") or path_s.endswith("conv_kernel_grouped")) \
                and not _in_scope(path_s, skip_scopes):
            delta, zp = spec.init(leaf)
            scales[path_s] = (delta, zp)
            return spec.apply(leaf, delta, zp)
        return leaf

    qparams = jax.tree_util.tree_map_with_path(visit, params)
    return qparams, scales


def quantize_weights_with_scales(params, scales,
                                 spec: QuantSpec = WEIGHT_SPEC):
    """Re-apply fake quant using precomputed scales (for AdaRound replay)."""
    def visit(path, leaf):
        path_s = _path_str([p.key for p in path])
        if path_s in scales:
            delta, zp = scales[path_s]
            return spec.apply(leaf, delta, zp)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


# ---------------------------------------------------------------------------
# Activation interception
# ---------------------------------------------------------------------------

def _is_unit(module, path_s):
    if isinstance(module, UNIT_TYPES):
        return True
    if isinstance(module, RAW_TYPES) and module.name not in _WRAPPED_NAMES:
        return True
    return False


@dataclasses.dataclass
class PTQConfig:
    act_spec: QuantSpec = ACT_SPEC
    weight_spec: QuantSpec = WEIGHT_SPEC
    skip_scopes: tuple = DEFAULT_SKIP_SCOPES
    output_heads: tuple = DEFAULT_OUTPUT_HEADS
    # activation-range observer: clip to this two-sided quantile instead of
    # absolute min/max (1.0 = exact minmax). Percentile clipping trades a
    # little saturation for a much finer grid — the single biggest AP lever
    # for per-tensor 8-bit activations on wide layers.
    act_percentile: float = 0.999
    # observer backend:
    #   "histogram" (default) — two passes: minmax then a fixed-range
    #     histogram; the clip comes from the CDF (act_percentile) or a
    #     KL/entropy search (entropy_clip=True). O(N) scatter-add per unit
    #     instead of jnp.quantile's full sort — at the flagship grid a
    #     unit's activation is ~10^7 elements and the sort dominated
    #     calibration (parity: quant_layer.py:273-319 histogram observer).
    #   "quantile" — single pass, exact two-sided jnp.quantile per batch.
    observer: str = "histogram"
    hist_bins: int = 512
    # pick the clip by minimizing KL(original || quantized) over the
    # histogram (TensorRT-entropy style; parity quant_layer.py 'entropy'
    # scale_method) instead of the percentile CDF
    entropy_clip: bool = False


def make_observe_interceptor(cfg: PTQConfig):
    """Interceptor that sows each unit's output range into 'quant_obs'."""
    q = cfg.act_percentile

    def interceptor(next_fn, args, kwargs, context):
        out = next_fn(*args, **kwargs)
        module = context.module
        path_s = _path_str(module.path)
        if (
            context.method_name == "__call__"
            and _is_unit(module, path_s)
            and not _in_scope(path_s, cfg.skip_scopes)
            and not _in_scope(path_s, cfg.output_heads)
            and isinstance(out, jax.Array)
        ):
            flat = out.astype(jnp.float32).ravel()
            if q >= 1.0:
                lo, hi = flat.min(), flat.max()
            else:
                lo, hi = jnp.quantile(
                    flat, jnp.array([1.0 - q, q])
                )
            module.sow(
                "quant_obs", "range",
                (lo, hi),
                init_fn=lambda: (jnp.float32(jnp.inf), jnp.float32(-jnp.inf)),
                reduce_fn=lambda a, b: (
                    jnp.minimum(a[0], b[0]), jnp.maximum(a[1], b[1])
                ),
            )
        return out

    return interceptor


def make_quant_interceptor(cfg: PTQConfig, act_scales: Dict[str, Tuple]):
    """Interceptor applying per-tensor act fake-quant at each unit output."""

    def interceptor(next_fn, args, kwargs, context):
        out = next_fn(*args, **kwargs)
        module = context.module
        path_s = _path_str(module.path)
        if context.method_name == "__call__" and path_s in act_scales and \
                isinstance(out, jax.Array):
            delta, zp = act_scales[path_s]
            out = cfg.act_spec.apply(out, delta, zp).astype(out.dtype)
        return out

    return interceptor


def observe_activations(model, variables, batches, cfg: PTQConfig,
                        apply_fn: Optional[Callable] = None):
    """Run calibration batches, returning {path: (min, max)} ranges.

    apply_fn(variables, batch) defaults to model.apply(train=False).
    """
    ranges: Dict[str, Tuple[float, float]] = {}

    def run(batch):
        with nn.intercept_methods(make_observe_interceptor(cfg)):
            if apply_fn is not None:
                _, mut = apply_fn(variables, batch)
            else:
                _, mut = model.apply(
                    variables, batch, train=False, mutable=["quant_obs"]
                )
        return mut["quant_obs"]

    run_j = jax.jit(run)
    for batch in batches:
        obs = jax.device_get(run_j(batch))
        flat = _flatten_obs(obs)
        for path_s, (lo, hi) in flat.items():
            if path_s in ranges:
                plo, phi = ranges[path_s]
                ranges[path_s] = (min(plo, lo), max(phi, hi))
            else:
                ranges[path_s] = (float(lo), float(hi))
    return ranges


def _flatten_obs(obs_tree, prefix=()):
    """quant_obs collection -> {module_path_str: (min, max)}."""
    out = {}
    for k, v in obs_tree.items():
        if k == "range":
            # v is a tuple of sown values; our reduce_fn keeps one pair
            pair = v[0] if isinstance(v, tuple) and isinstance(v[0], tuple) \
                else v
            out[_path_str(prefix)] = (float(pair[0]), float(pair[1]))
        elif isinstance(v, dict):
            out.update(_flatten_obs(v, prefix + (k,)))
    return out


def make_hist_interceptor(cfg: PTQConfig, ranges):
    """Interceptor sowing a fixed-range histogram of each unit's output.

    Bin counts accumulate across batches via the sow reduce_fn; the range
    comes from a prior minmax pass so bins are stable across batches."""
    B = cfg.hist_bins

    def interceptor(next_fn, args, kwargs, context):
        out = next_fn(*args, **kwargs)
        module = context.module
        path_s = _path_str(module.path)
        if (
            context.method_name == "__call__"
            and path_s in ranges
            and isinstance(out, jax.Array)
        ):
            lo, hi = ranges[path_s]
            width = max((hi - lo) / B, 1e-12)
            # bin via a broadcast-compare CDF reduction, NOT a scatter-add:
            # .at[idx].add over ~1e7 colliding indices serializes on TPU
            # (measured: stalls calibration for minutes per batch), while
            # the (N, B) compare fuses into a single reduction sweep
            flat = out.astype(jnp.float32).reshape(-1, 1)
            edges = lo + width * jnp.arange(1, B, dtype=jnp.float32)
            cdf = (flat < edges[None, :]).sum(axis=0).astype(jnp.int32)
            n = jnp.int32(flat.shape[0])
            counts = jnp.diff(jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), cdf, n[None]]))
            module.sow("quant_obs", "hist", counts,
                       init_fn=lambda: jnp.zeros((B,), jnp.int32),
                       reduce_fn=lambda a, b: a + b)
        return out

    return interceptor


def observe_histograms(model, variables, batches, cfg: PTQConfig, ranges,
                       apply_fn: Optional[Callable] = None):
    """{path: (bins,) counts} over fixed ranges from a prior minmax pass."""
    hists: Dict[str, "jnp.ndarray"] = {}

    def run(batch):
        with nn.intercept_methods(make_hist_interceptor(cfg, ranges)):
            if apply_fn is not None:
                _, mut = apply_fn(variables, batch)
            else:
                _, mut = model.apply(
                    variables, batch, train=False, mutable=["quant_obs"]
                )
        return mut["quant_obs"]

    run_j = jax.jit(run)
    for batch in batches:
        obs = jax.device_get(run_j(batch))
        for path_s, counts in _flatten_hist(obs).items():
            if path_s in hists:
                hists[path_s] = hists[path_s] + counts
            else:
                hists[path_s] = counts
    return hists


def _flatten_hist(obs_tree, prefix=()):
    import numpy as np
    out = {}
    for k, v in obs_tree.items():
        if k == "hist":
            arr = v[0] if isinstance(v, tuple) else v
            out[_path_str(prefix)] = np.asarray(arr, dtype=np.int64)
        elif isinstance(v, dict):
            out.update(_flatten_hist(v, prefix + (k,)))
    return out


def _percentile_clip_from_hist(counts, lo, hi, q):
    """Two-sided percentile clip from the CDF of a fixed-range histogram."""
    import numpy as np
    B = counts.shape[0]
    total = counts.sum()
    if total == 0:
        return lo, hi
    edges = np.linspace(lo, hi, B + 1)
    cdf = np.cumsum(counts) / total
    lo_i = int(np.searchsorted(cdf, 1.0 - q))
    hi_i = int(np.searchsorted(cdf, q))
    return float(edges[min(lo_i, B - 1)]), float(edges[min(hi_i + 1, B)])


def _entropy_clip_from_hist(counts, lo, hi, n_bits):
    """KL-minimizing symmetric-ish clip search over the histogram (the
    TensorRT IInt8EntropyCalibrator scheme; parity quant_layer.py:273-319).

    Candidate clips are histogram-bin suffixes; for each, the clipped
    distribution is re-binned to 2^n_bits levels and compared by KL."""
    import numpy as np
    B = counts.shape[0]
    levels = 2 ** n_bits
    if counts.sum() == 0 or B <= levels:
        return lo, hi
    p_full = counts.astype(np.float64)
    best, best_kl = B, np.inf
    for end in range(levels, B + 1, max((B - levels) // 32, 1)):
        p = p_full[:end].copy()
        outliers = p_full[end:].sum()
        p[-1] += outliers
        # quantize: merge bins into `levels` groups
        group = end / levels
        q = np.zeros(end)
        for g in range(levels):
            s, e = int(g * group), max(int((g + 1) * group), int(g * group) + 1)
            seg = p_full[s:e]
            nz = (seg > 0).sum()
            if nz:
                q[s:e] = np.where(seg > 0, seg.sum() / nz, 0)
        pm = p / max(p.sum(), 1e-12)
        qm = q / max(q.sum(), 1e-12)
        mask = pm > 0
        kl = float(np.sum(pm[mask] * np.log(pm[mask] /
                                            np.maximum(qm[mask], 1e-12))))
        if kl < best_kl:
            best_kl, best = kl, end
    edges = np.linspace(lo, hi, B + 1)
    return lo, float(edges[best])


def act_scales_from_histograms(hists, ranges, cfg: PTQConfig):
    """Per-tensor (delta, zp) from histogram clips."""
    from quantv2x_tpu.quant.quantizer import _delta_zp_from_range

    scales = {}
    for path_s, counts in hists.items():
        lo, hi = ranges[path_s]
        if cfg.entropy_clip:
            clo, chi = _entropy_clip_from_hist(counts, lo, hi,
                                               cfg.act_spec.n_bits)
        else:
            clo, chi = _percentile_clip_from_hist(counts, lo, hi,
                                                  cfg.act_percentile)
        scales[path_s] = _delta_zp_from_range(
            jnp.float32(clo), jnp.float32(chi), cfg.act_spec.n_bits)
    return scales


def act_scales_from_ranges(ranges, cfg: PTQConfig):
    """Per-tensor (delta, zp) from observed ranges."""
    from quantv2x_tpu.quant.quantizer import _delta_zp_from_range

    scales = {}
    for path_s, (lo, hi) in ranges.items():
        d, zp = _delta_zp_from_range(
            jnp.float32(lo), jnp.float32(hi), cfg.act_spec.n_bits
        )
        scales[path_s] = (d, zp)
    return scales


def make_quantized_apply(model, cfg: PTQConfig):
    """Returns qapply(qvariables, act_scales, batch) running W8A8 inference."""

    def qapply(qvariables, act_scales, batch):
        with nn.intercept_methods(make_quant_interceptor(cfg, act_scales)):
            return model.apply(qvariables, batch, train=False)

    return qapply


def ptq_calibrate(model, variables, calib_batches, cfg: PTQConfig = None,
                  return_w_scales: bool = False):
    """One-call W8A8 PTQ: weight scales + act ranges -> quantized apply.

    Returns (qvariables, act_scales, qapply)
    [+ w_scales if return_w_scales — adaround reuses them instead of
    redoing the full fake-quant pass].
    """
    cfg = cfg or PTQConfig()
    qparams, w_scales = quantize_weights(
        variables["params"], cfg.weight_spec, cfg.skip_scopes
    )
    qvariables = dict(variables, params=qparams)
    if cfg.observer == "histogram":
        # pass 1: exact minmax fixes the bin range; pass 2: histogram
        mm_cfg = dataclasses.replace(cfg, act_percentile=1.0)
        ranges = observe_activations(model, variables, calib_batches, mm_cfg)
        hists = observe_histograms(model, variables, calib_batches, cfg,
                                   ranges)
        act_scales = act_scales_from_histograms(hists, ranges, cfg)
    else:
        ranges = observe_activations(model, variables, calib_batches, cfg)
        act_scales = act_scales_from_ranges(ranges, cfg)
    qapply = make_quantized_apply(model, cfg)
    if return_w_scales:
        return qvariables, act_scales, qapply, w_scales
    return qvariables, act_scales, qapply


def first_sow_init():
    """Sow init for keep-first-call capture. flax's default ``init_fn``
    returns ``()``; a plain ``reduce_fn=lambda a, b: a`` would then keep
    the empty tuple forever (the round-2 sequential-capture bug). ``None``
    marks "nothing captured yet"; pair with ``first_sow_reduce``."""
    return None


def first_sow_reduce(acc, value):
    return value if acc is None else acc
