"""INT8 fused inference engine: residual-block stacks on int8 Pallas kernels.

This combines the two round-1 halves (VERDICT item 1):
  - quant/fused_engine.py — BN-folded VMEM-resident residual blocks
    (bf16, one HBM round trip per stack);
  - quant/int8_engine.py — real-int8 conv execution (which lost to bf16
    because XLA materialized quantize/requant HBM traffic per unit).

Here requantization happens INSIDE the Pallas kernel between convs, the
chain buffer in HBM holds int8 codes (half the bf16 engine's bytes on a
bandwidth-bound device), and the MXU runs at its int8 rate. Build is a
pure transform:

  1. one calibration pass observes every ConvBNReLU unit's input range
     AND every Basic/Bottleneck block's output range (flax sow);
  2. BN folds into each conv (reusing fused_engine.build_fused_tables);
  3. per-output-channel symmetric int8 weight quantization; the
     zero-point correction term (ezp_in * ksum * scale) folds into the
     bias so the kernel epilogue is a single multiply-add;
  4. at inference, stage runs of stride-1 blocks execute as chained
     ops/int8_fused_block calls in CODE SPACE — one quantize at stack
     entry, one dequantize at stack exit; strided blocks, deconvs and
     heads stay on the stock bf16 path (the same split TensorRT makes).

Reference parity: tools/build_trt_int8.py:46-405 (ONNX -> TRT INT8 engine
with entropy calibrator); here the "engine" is a flax interceptor.
"""

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from quantv2x_tpu.models.layers import (BasicBlock, Bottleneck, ConvBNReLU,
                                        ResNetModified)
from quantv2x_tpu.ops import int8_fused_block as ifb
from quantv2x_tpu.quant import ptq as ptq_mod
from quantv2x_tpu.quant.fused_engine import build_fused_tables
from quantv2x_tpu.quant.quantizer import _delta_zp_from_range


def observe_engine_ranges(model, variables, batches, cfg=None,
                          sample_size: int = 0):
    """One calibration pass -> ({unit_path: (lo, hi)}, {block_path: (lo,
    hi)}[, unit_samples, block_samples]): ConvBNReLU INPUT ranges plus
    Basic/Bottleneck OUTPUT ranges.

    Honors cfg.act_percentile with the same per-batch two-sided quantile
    + running min/max semantics as quant/ptq.py observers.

    ``sample_size > 0`` additionally sows a strided subsample of every
    boundary tensor (for the MSE clip search) and switches the return to a
    4-tuple with {path: (n_samples,) np.float32} dicts."""
    import numpy as np

    cfg = cfg or ptq_mod.PTQConfig()
    q = cfg.act_percentile

    def _range(x):
        flat = x.astype(jnp.float32).ravel()
        if q >= 1.0:
            return flat.min(), flat.max()
        return tuple(jnp.quantile(flat, jnp.array([1.0 - q, q])))

    def _sow(module, col, pair):
        module.sow(
            "quant_obs", col, pair,
            init_fn=lambda: (jnp.float32(jnp.inf), jnp.float32(-jnp.inf)),
            reduce_fn=lambda a, b: (jnp.minimum(a[0], b[0]),
                                    jnp.maximum(a[1], b[1])))

    def _sow_sample(module, col, x):
        flat = x.astype(jnp.float32).ravel()
        stride = max(1, flat.shape[0] // sample_size)
        module.sow(f"{col}_s", "sample", flat[::stride][:sample_size],
                   init_fn=ptq_mod.first_sow_init,
                   reduce_fn=ptq_mod.first_sow_reduce)

    def interceptor(next_fn, args, kwargs, context):
        module = context.module
        path_s = ptq_mod._path_str(module.path)
        if (context.method_name == "__call__"
                and not ptq_mod._in_scope(path_s, cfg.skip_scopes)
                and isinstance(args[0], jax.Array)):
            if isinstance(module, ConvBNReLU):
                _sow(module, "in_range", _range(args[0]))
                if sample_size:
                    _sow_sample(module, "in_range", args[0])
            elif isinstance(module, (BasicBlock, Bottleneck)):
                out = next_fn(*args, **kwargs)
                _sow(module, "out_range", _range(out))
                if sample_size:
                    _sow_sample(module, "out_range", out)
                return out
        return next_fn(*args, **kwargs)

    cols = ["quant_obs"] + (["in_range_s", "out_range_s"] if sample_size
                            else [])

    def run(batch):
        with nn.intercept_methods(interceptor):
            _, mut = model.apply(variables, batch, train=False,
                                 mutable=cols)
        return mut

    run_j = jax.jit(run)
    unit_ranges, block_ranges = {}, {}
    unit_samples, block_samples = {}, {}

    def merge(dst, path_s, lo, hi):
        if path_s in dst:
            plo, phi = dst[path_s]
            dst[path_s] = (min(plo, lo), max(phi, hi))
        else:
            dst[path_s] = (float(lo), float(hi))

    def flatten(tree, prefix=()):
        for k, v in tree.items():
            if k in ("in_range", "out_range"):
                pair = v[0] if isinstance(v, tuple) and \
                    isinstance(v[0], tuple) else v
                dst = unit_ranges if k == "in_range" else block_ranges
                merge(dst, ptq_mod._path_str(prefix),
                      float(pair[0]), float(pair[1]))
            elif isinstance(v, dict):
                flatten(v, prefix + (k,))

    def flatten_samples(tree, dst, prefix=()):
        for k, v in tree.items():
            if k == "sample":
                arr = np.asarray(v[0] if isinstance(v, tuple) else v,
                                 np.float32)
                dst.setdefault(ptq_mod._path_str(prefix), []).append(arr)
            elif isinstance(v, dict):
                flatten_samples(v, dst, prefix + (k,))

    for batch in batches:
        mut = jax.device_get(run_j(batch))
        flatten(mut["quant_obs"])
        if sample_size:
            flatten_samples(mut.get("in_range_s", {}), unit_samples)
            flatten_samples(mut.get("out_range_s", {}), block_samples)
    if not sample_size:
        return unit_ranges, block_ranges
    unit_samples = {p: np.concatenate(v) for p, v in unit_samples.items()}
    block_samples = {p: np.concatenate(v) for p, v in block_samples.items()}
    return unit_ranges, block_ranges, unit_samples, block_samples


def _mse_clip(sample, lo, hi, n_bits: int = 8, steps: int = 64,
              p: float = 2.4):
    """Grid-search the clip range minimizing Lp quantization error on a
    calibration sample (parity: UniformAffineQuantizer's 'mse' scale
    search, quant_layer.py:201-271, Lp(2.4); geometric candidates down to
    1% of the observed range so heavy-tailed boundaries still find the
    optimum — the reference's linear 1%-shrink sweep bottoms out at 20%)."""
    import numpy as np

    levels = 2 ** n_bits - 1
    best = (lo, hi)
    best_score = np.inf
    for f in np.geomspace(1.0, 0.01, steps):
        clo, chi = lo * f, hi * f
        if chi - clo < 1e-8:
            break
        d = (chi - clo) / levels
        zp = np.round(-clo / d)
        q = np.clip(np.round(sample / d) + zp, 0, levels)
        deq = (q - zp) * d
        score = float(np.mean(np.abs(deq - sample) ** p))
        if score < best_score:
            best_score, best = score, (float(clo), float(chi))
    return best


def _entropy_clip(sample, lo, hi, n_bits: int = 8, bins: int = 2048):
    """KL-minimizing clip from a sample histogram (the TensorRT
    IInt8EntropyCalibrator role — bulk-distribution-weighted, unlike the
    tail-dominated Lp search; parity tools/build_trt_int8.py:46-141 via
    quant/ptq._entropy_clip_from_hist)."""
    import numpy as np

    from quantv2x_tpu.quant.ptq import _entropy_clip_from_hist

    counts, _ = np.histogram(sample, bins=bins, range=(lo, hi))
    return _entropy_clip_from_hist(counts.astype(np.int64), lo, hi, n_bits)


def _grid(lo, hi):
    """(delta, ezp) for stored-int8 codes: f = (s - ezp) * delta."""
    d, zp = _delta_zp_from_range(jnp.float32(lo), jnp.float32(hi), 8)
    return jnp.float32(d), jnp.float32(zp) - 128.0


def _wquant(w):
    """Per-output-channel symmetric int8 on the ``_wscales`` grid (one
    definition of the grid — AdaRound-refined codes are learned on the
    same deltas and dequantized via ``_wscales``, so the two paths must
    stay bit-identical).

    Dense (..., cout): out channels = last axis. Supergrouped bottleneck
    w2 (3, 3, S, 128, 128): out channel c = s * 128 + lane, so the
    reduction keeps both the supergroup and the lane axis."""
    dw = _wscales(w)
    wq = jnp.clip(jnp.round(w / dw), -127, 127).astype(jnp.int8)
    return wq, dw.reshape(-1)


def _ksum(wq):
    """Per-out-channel sum of quantized weights (for the zp correction).

    Dense (..., cout): sum all leading axes. Supergrouped bottleneck w2
    (3, 3, S, 128, 128): off-diagonal blocks are structural zeros, so the
    diagonal-block sum IS the grouped kernel's column sum."""
    if wq.ndim == 5:
        return wq.astype(jnp.float32).sum(axis=(0, 1, 3)).reshape(-1)
    axes = tuple(range(wq.ndim - 1))
    return wq.astype(jnp.float32).sum(axis=axes)


def _wscales(w):
    """Per-out-channel symmetric deltas (the _wquant grid, codes aside)."""
    axes = (0, 1, 3) if w.ndim == 5 else tuple(range(w.ndim - 1))
    amax = jnp.abs(w).max(axis=axes, keepdims=True)
    return jnp.maximum(amax / 127.0, 1e-12)


def _conv_tables(w, b, in_grid, wq=None):
    """Quantize one folded conv: (wq, sb) with the zero-point correction
    folded into the bias row. sb = [scale; bias'] (2, cout) f32.

    ``wq`` overrides the nearest-rounded codes (AdaRound-refined codes on
    the same per-channel symmetric grid)."""
    d_in, ezp_in = in_grid
    if wq is None:
        wq, dw = _wquant(w)
    else:
        dw = _wscales(w).reshape(-1)
    scale = d_in * dw
    bias = b.astype(jnp.float32) - ezp_in * _ksum(wq) * scale
    return wq, jnp.stack([scale, bias])


def quantize_to_codes(x, grid):
    """float -> stored int8 codes on (delta, ezp)."""
    d, ezp = grid
    s = jnp.round(x.astype(jnp.float32) / d) + ezp
    return jnp.clip(s, -128, 127).astype(jnp.int8)


def dequantize_codes(s, grid):
    d, ezp = grid
    return (s.astype(jnp.float32) - ezp) * d


def capture_block_io(model, variables, calib_batches, block_paths):
    """{block_path: (inputs (N, H, W, C), fp_outputs (N, H, W, C))} over
    the calibration batches — one jitted sow pass per batch (the adaround
    capture discipline: eager interception costs one tunnel dispatch per
    op on the remote backend)."""
    import numpy as np

    targets = set(block_paths)

    def interceptor(next_fn, args, kwargs, context):
        module = context.module
        path_s = ptq_mod._path_str(module.path)
        if (context.method_name == "__call__"
                and isinstance(module, (BasicBlock, Bottleneck))
                and path_s in targets
                and isinstance(args[0], jax.Array)):
            module.sow("blk_io", "inp", args[0],
                       init_fn=ptq_mod.first_sow_init,
                       reduce_fn=ptq_mod.first_sow_reduce)
            out = next_fn(*args, **kwargs)
            module.sow("blk_io", "out", out,
                       init_fn=ptq_mod.first_sow_init,
                       reduce_fn=ptq_mod.first_sow_reduce)
            return out
        return next_fn(*args, **kwargs)

    def run(batch):
        with nn.intercept_methods(interceptor):
            _, mut = model.apply(variables, batch, train=False,
                                 mutable=["blk_io"])
        return mut["blk_io"]

    run_j = jax.jit(run)
    store = {}

    def flatten(tree, key, dst, prefix=()):
        for k, v in tree.items():
            if k == key:
                # f16 on host: flagship stage-1 block IO is ~1 GB/block
                # in f32 across 16 calib batches. Clip to the f16 range
                # first — an inf from overflow would NaN the recon errors
                # and defeat the learned-vs-nearest safety comparison
                raw = np.asarray(v[0] if isinstance(v, tuple) else v,
                                 np.float32)
                arr = np.clip(raw, -65504.0, 65504.0).astype(np.float16)
                dst.setdefault(ptq_mod._path_str(prefix), []).append(arr)
            elif isinstance(v, dict):
                flatten(v, key, dst, prefix + (k,))

    ins, outs = {}, {}
    for batch in calib_batches:
        caps = jax.device_get(run_j(batch))
        flatten(caps, "inp", ins)
        flatten(caps, "out", outs)
    for p in ins:
        store[p] = (np.concatenate(ins[p]), np.concatenate(outs[p]))
    return store


def _ste_fq(x, grid):
    """Straight-through fake quant on a stored-int8 grid."""
    d, ezp = grid
    q = (jnp.clip(jnp.round(x / d) + ezp, -128, 127) - ezp) * d
    return x + jax.lax.stop_gradient(q - x)


def _lsq_fq(x, d, ezp):
    """Fake quant on a stored-int8 grid with an LSQ-differentiable delta:
    gradients flow to ``d`` through both the scaled input and the rescale
    (the standard learned-step-size estimator), to ``x`` straight-through."""
    s = x / d + ezp
    s_c = jnp.clip(s, -128.0, 127.0)
    s_r = s_c + jax.lax.stop_gradient(jnp.round(s_c) - s_c)
    return (s_r - ezp) * d


def refine_block_rounding(kind, ws, grids, g_out, x, y_fp, iters: int = 600,
                          lr: float = 1e-2, rows: int = 8, seed: int = 0,
                          learn_grids: bool = True, grid_lr: float = 4e-5):
    """AdaRound at the fused-block granularity: learn each folded conv's
    rounding mask to reconstruct the FP block output under the engine's
    boundary grids (parity: quant/block_recon.py:93-232 applied to the
    TensorRT-split blocks; soft rounding + annealed relaxation from
    quant/adaround.py).

    ``learn_grids``: jointly refine the block's INTERNAL activation grid
    deltas (g_h1 / g_h2) LSQ-style alongside the rounding masks — the
    engine counterpart of the reference's set_act_quantize_params + lr_a
    step-size optimization inside block reconstruction
    (block_recon.py:140-176). Only internal grids move: the block-boundary
    grids (g_in / g_out) are shared with the neighbouring blocks in the
    deployed chain (make_int8_fused_apply chains out->in) and must stay
    where the clip search put them.

    ws: folded float convs with bottleneck w2 in GROUPED (3, 3, cpg, out)
    layout (build_fused_tables(pack_grouped=False)). Returns
    (codes, refined_grids) — int8 codes per conv in the same layouts and
    the (possibly updated) full grid list — or None when the learned
    result fails to beat nearest rounding on the calibration recon error."""
    import optax

    from quantv2x_tpu.quant.adaround import (alpha_init, rect_sigmoid,
                                             round_loss)

    weights = list(ws[0::2])
    biases = list(ws[1::2])
    dws = [_wscales(w) for w in weights]
    floors = [jnp.floor(w / d) for w, d in zip(weights, dws)]
    alphas0 = {
        str(i): alpha_init(w.astype(jnp.float32), d)
        for i, (w, d) in enumerate(zip(weights, dws))
    }
    n_internal = 1 if kind == "basic" else 2
    log_dh0 = jnp.log(jnp.stack([
        jnp.maximum(grids[1 + i][0], 1e-12) for i in range(n_internal)
    ]))
    opt0 = {"alphas": alphas0}
    if learn_grids:
        opt0["log_dh"] = log_dh0
    groups = 1
    if kind != "basic":
        cpg, out_ch = weights[1].shape[2], weights[1].shape[3]
        groups = out_ch // cpg

    def soft_w(i, alphas, hard):
        h = rect_sigmoid(alphas[str(i)])
        r = (h >= 0.5).astype(jnp.float32) if hard else h
        codes = jnp.clip(floors[i] + r, -127, 127)
        return codes * dws[i]

    def conv3x3(x, w, grp=1):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=grp)

    def sim(x, opt, hard):
        alphas = opt["alphas"]

        def fq_h(h, i):
            d = (jnp.exp(opt["log_dh"][i]) if learn_grids
                 else grids[1 + i][0])
            return _lsq_fq(h, d, grids[1 + i][1])

        xq = _ste_fq(x, grids[0])
        if kind == "basic":
            h = jnp.maximum(conv3x3(xq, soft_w(0, alphas, hard))
                            + biases[0], 0.0)
            h = fq_h(h, 0)
            y = conv3x3(h, soft_w(1, alphas, hard)) + biases[1]
        else:
            w1 = soft_w(0, alphas, hard)          # (C, width) 1x1
            h = jnp.maximum(jnp.einsum("nhwc,cd->nhwd", xq, w1)
                            + biases[0], 0.0)
            h = fq_h(h, 0)
            h = jnp.maximum(conv3x3(h, soft_w(1, alphas, hard), groups)
                            + biases[1], 0.0)
            h = fq_h(h, 1)
            w3 = soft_w(2, alphas, hard)          # (width, C) 1x1
            y = jnp.einsum("nhwc,cd->nhwd", h, w3) + biases[2]
        # the deployed block emits int8 codes on the boundary grid — fake
        # -quantize the output so the learned rounding optimizes what the
        # engine actually produces
        return _ste_fq(jnp.maximum(y + xq, 0.0), g_out)

    x = jnp.asarray(x, jnp.float32)
    y_fp = jnp.asarray(y_fp, jnp.float32)
    n = x.shape[0]
    rows_eff = min(rows, n)
    warm = int(iters * 0.2)
    tx = optax.multi_transform(
        {"alphas": optax.adam(lr), "log_dh": optax.adam(grid_lr)},
        param_labels=lambda tree: {k: k for k in tree},
    )
    rng = jax.random.PRNGKey(seed)

    def loss_fn(opt, beta, xb, yb):
        y = sim(xb, opt, hard=False)
        recon = jnp.mean((y - yb) ** 2)
        alphas = opt["alphas"]
        rl = sum(round_loss(a, beta) for a in alphas.values()) / len(alphas)
        return recon + 0.01 * rl

    @jax.jit
    def optimize(opt, x, y_fp):
        state = tx.init(opt)

        def body(it, carry):
            opt, state = carry
            t = jnp.clip((it - warm) / max(iters - warm, 1), 0.0, 1.0)
            beta = 20.0 + (2.0 - 20.0) * t
            if rows_eff < n:
                idx = jax.random.randint(jax.random.fold_in(rng, it),
                                         (rows_eff,), 0, n)
                xb, yb = x[idx], y_fp[idx]
            else:
                xb, yb = x, y_fp
            grads = jax.grad(loss_fn)(opt, beta, xb, yb)
            upd, state = tx.update(grads, state)
            return optax.apply_updates(opt, upd), state

        opt, _ = jax.lax.fori_loop(0, iters, body, (opt, state))
        return opt

    opt = optimize(opt0, x, y_fp)

    @jax.jit
    def recon_err(opt, x, y_fp):
        return jnp.mean((sim(x, opt, hard=True) - y_fp) ** 2)

    e_learned = float(recon_err(opt, x, y_fp))
    # hard mode thresholds h(alpha) >= 0.5, which for init alphas is
    # exactly nearest rounding (h(alpha_init) = frac) — no scaling needed
    e_nearest = float(recon_err(opt0, x, y_fp))
    # `not <=` (instead of `>`) so a NaN recon error fails CLOSED to
    # nearest rounding rather than baking diverged codes into the engine
    if not (e_learned <= e_nearest):
        return None
    alphas = opt["alphas"]
    codes = []
    for i in range(len(weights)):
        h = rect_sigmoid(alphas[str(i)])
        codes.append(jnp.clip(floors[i] + (h >= 0.5), -127, 127)
                     .astype(jnp.int8))
    new_grids = list(grids)
    if learn_grids:
        for i in range(n_internal):
            new_grids[1 + i] = (jnp.exp(opt["log_dh"][i]),
                                grids[1 + i][1])
    return codes, new_grids


def _pack_codes_like(codes_grouped, w_packed):
    """Grouped int8 codes -> the kernel's packed layout (pure layout
    transform; zeros pack to zero codes)."""
    from quantv2x_tpu.quant.fused_engine import (grouped_to_blockdiag,
                                                 grouped_to_superblocks)

    if w_packed.ndim == 5:
        kh, kw, cpg, out = codes_grouped.shape
        return grouped_to_superblocks(
            codes_grouped.astype(jnp.float32), out // cpg).astype(jnp.int8)
    if w_packed.shape != codes_grouped.shape:
        kh, kw, cpg, out = codes_grouped.shape
        return grouped_to_blockdiag(
            codes_grouped.astype(jnp.float32), out // cpg).astype(jnp.int8)
    return codes_grouped


def build_int8_fused_tables(model, variables, calib_batches, cfg=None,
                            min_channels: int = 0, clip: str = "mse",
                            adaround_iters: int = 0, verbose: bool = False):
    """{block_path: entry} for every fusable stride-1 block.

    entry = dict(kind, blk=(w1q, sb1, w2q, sb2[, w3q, sb3]),
                 g_in, g_h1, [g_h2], g_out) with g_* = (delta, ezp) f32
    scalars of the stored-int8 grids.

    ``clip``: per-boundary grid selection — "mse" (default) searches the
    Lp-optimal clip on a calibration sample per boundary (the reference's
    mse scale search / TRT-entropy role); "percentile" keeps the plain
    quantile ranges. ``adaround_iters > 0`` additionally learns each
    folded conv's rounding mask against the FP block output
    (refine_block_rounding)."""
    cfg = cfg or ptq_mod.PTQConfig()
    if clip in ("mse", "entropy"):
        unit_ranges, block_ranges, unit_samples, block_samples = \
            observe_engine_ranges(model, variables, calib_batches, cfg,
                                  sample_size=65536)
        search = _mse_clip if clip == "mse" else _entropy_clip

        def _refine(ranges, samples):
            return {
                p: search(samples[p], lo, hi) if p in samples else (lo, hi)
                for p, (lo, hi) in ranges.items()
            }

        unit_ranges = _refine(unit_ranges, unit_samples)
        block_ranges = _refine(block_ranges, block_samples)
    else:
        unit_ranges, block_ranges = observe_engine_ranges(
            model, variables, calib_batches, cfg)
    folded = build_fused_tables(variables, dtype=jnp.float32,
                                min_channels=min_channels)

    specs = {}
    for path_s, t in folded.items():
        kind = t[0]
        names = ("conv1", "conv2") if kind == "basic" else \
            ("conv1", "conv2", "conv3")
        in_keys = [f"{path_s}/{n}" for n in names]
        if any(k not in unit_ranges for k in in_keys) or \
                path_s not in block_ranges:
            continue
        specs[path_s] = dict(
            ws=t[1:],
            in_ranges=[unit_ranges[k] for k in in_keys],
            out_range=block_ranges[path_s])

    kinds = {p: folded[p][0] for p in specs}

    refined = {}
    if adaround_iters:
        grouped = build_fused_tables(variables, dtype=jnp.float32,
                                     min_channels=min_channels,
                                     pack_grouped=False)
        io = capture_block_io(model, variables, calib_batches, set(specs))
        for path_s, s in specs.items():
            if path_s not in io:
                continue
            x, y_fp = io[path_s]
            grids = [_grid(*r) for r in s["in_ranges"]]
            got = refine_block_rounding(
                kinds[path_s], grouped[path_s][1:], grids,
                _grid(*s["out_range"]), x, y_fp, iters=adaround_iters)
            if got is not None:
                refined[path_s] = got
            if verbose:
                print(f"[int8-engine] adaround {path_s}: "
                      f"{'refined' if got is not None else 'kept nearest'}")

    def build_all(specs):
        out = {}
        for path_s, s in specs.items():
            grids = [_grid(*r) for r in s["in_ranges"]]
            g_out = _grid(*s["out_range"])
            ws = s["ws"]
            codes = None
            if path_s in refined:
                codes, grids = refined[path_s]
            if kinds[path_s] == "basic":
                w1, b1, w2, b2 = ws
                w1q, sb1 = _conv_tables(
                    w1, b1, grids[0], wq=codes[0] if codes else None)
                w2q, sb2 = _conv_tables(
                    w2, b2, grids[1], wq=codes[1] if codes else None)
                out[path_s] = dict(
                    blk=(w1q, sb1, w2q, sb2), g_in=grids[0],
                    g_h1=grids[1], g_out=g_out)
            else:
                w1, b1, w2, b2, w3, b3 = ws
                cq = [None, None, None]
                if codes:
                    # grouped-layout codes -> the kernel's packed layouts
                    cq = [codes[0].reshape(w1.shape),
                          _pack_codes_like(codes[1], w2),
                          codes[2].reshape(w3.shape)]
                w1q, sb1 = _conv_tables(w1, b1, grids[0], wq=cq[0])
                w2q, sb2 = _conv_tables(w2, b2, grids[1], wq=cq[1])
                w3q, sb3 = _conv_tables(w3, b3, grids[2], wq=cq[2])
                out[path_s] = dict(
                    blk=(w1q, sb1, w2q, sb2, w3q, sb3), g_in=grids[0],
                    g_h1=grids[1], g_h2=grids[2], g_out=g_out)
        return out

    built = jax.jit(build_all)(specs)
    return {p: dict(built[p], kind=kinds[p]) for p in built}


def _entry_cin(e):
    w1 = e["blk"][0]
    return w1.shape[2] if e["kind"] == "basic" else w1.shape[0]


def _meta_rows(run):
    """(K, 8) f32 meta. Block j's OUT grid = block j+1's IN grid (the
    same tensor — chains exactly); the last block keeps its own."""
    rows = []
    for j, e in enumerate(run):
        g_in, g_h1 = e["g_in"], e["g_h1"]
        g_h2 = e.get("g_h2", (jnp.float32(1.0), jnp.float32(0.0)))
        g_out = run[j + 1]["g_in"] if j + 1 < len(run) else e["g_out"]
        rows.append(jnp.stack([
            g_in[0], g_in[1], 1.0 / g_h1[0], g_h1[1],
            1.0 / g_h2[0], g_h2[1], 1.0 / g_out[0], g_out[1]]))
    return jnp.stack(rows)


def make_int8_fused_apply(model, tables, h_tile: int = 16,
                          interpret: bool = False):
    """fused int8 apply: ResNetModified stage runs of stride-1 blocks run
    as chained int8 Pallas stacks; everything else stock."""

    def _run_stack(x, run):
        """x: float NHWC. Chained int8 execution of ``run`` (list of
        table entries), staying in code space across VMEM splits."""
        kind = run[0]["kind"]
        radius = 2 if kind == "basic" else 1
        N, H, W, C = x.shape
        # carried between sub-runs as (codes, grid); re-padding goes
        # dequant -> pad(0) -> quant (XLA fuses it; quantize(0) == the
        # ezp code exactly, so the chain-padding invariant holds)
        codes, g_cur = quantize_to_codes(x, run[0]["g_in"]), run[0]["g_in"]
        out_dtype = x.dtype
        while run:
            # (K, th) policy, measured on-chip (scripts/drive_tile_tune):
            # deep chunks at tiny tiles pay quadratic halo recompute —
            # cap chunks at 4 blocks and size the tile to ~2x the halo
            # (stage2 K=7: (7,)@th4 1.11 ms -> (4,3)@th8 0.50 ms).
            K = min(len(run), 4)
            th = 0
            while K >= 1:
                widths = [
                    (e["blk"][0].shape[3] if kind == "basic"
                     else e["blk"][0].shape[1]) for e in run[:K]]
                w2_super = [e["blk"][2].ndim == 5 for e in run[:K]]
                halo = K * radius
                Wt = -(-(W + 2 * halo) // 32) * 32
                Cp = (-(-C // 128) * 128) if not interpret else C
                th = min(h_tile, max(8, 2 * halo), max(4, H))
                while th > 4 and ifb.int8_stack_vmem_bytes(
                        th, Wt, Cp, widths, radius,
                        w2_super=w2_super) > ifb._VMEM_BUDGET:
                    th //= 2
                if ifb.int8_stack_vmem_bytes(
                        th, Wt, Cp, widths, radius,
                        w2_super=w2_super) <= ifb._VMEM_BUDGET:
                    break
                K -= 1
            K = max(K, 1)
            halo = K * radius
            Wt = -(-(W + 2 * halo) // 32) * 32
            Cp = (-(-C // 128) * 128) if not interpret else C
            ngrid = -(-H // th)
            R = ngrid * th + 2 * halo
            sub = run[:K]
            nxt = run[K:]
            # last-of-sub's out grid = the next sub-run's input grid
            meta = _meta_rows(sub + nxt[:1])[:K]
            xf = dequantize_codes(codes, g_cur)
            xf = jnp.pad(xf, ((0, 0), (halo, R - H - halo),
                              (halo, Wt - W - halo), (0, Cp - C)))
            sp = quantize_to_codes(xf, sub[0]["g_in"])
            yp = ifb.int8_fused_stack_chained(
                sp, tuple(tuple(e["blk"]) for e in sub), meta,
                (H, W, C), radius, h_tile=th, interpret=interpret)
            codes = ifb.from_int8_chain_layout(yp, (H, W, C), halo)
            g_cur = nxt[0]["g_in"] if nxt else sub[-1]["g_out"]
            run = nxt
        return dequantize_codes(codes, g_cur).astype(out_dtype)

    def _run_resnet_stages(module, x):
        outs = []
        for stage in module.stages:
            pending = []
            for blk in stage:
                e = tables.get(ptq_mod._path_str(blk.path))
                if e is not None and x.shape[-1] == _entry_cin(e):
                    pending.append(e)
                else:
                    if pending:
                        x = _run_stack(x, pending)
                        pending = []
                    x = blk(x, False)
            if pending:
                x = _run_stack(x, pending)
            outs.append(x)
        return tuple(outs)

    def interceptor(next_fn, args, kwargs, context):
        module = context.module
        if (
            context.method_name == "__call__"
            and isinstance(module, ResNetModified)
            and isinstance(args[0], jax.Array)
            and args[0].ndim == 4
            and not kwargs.get("train",
                               args[1] if len(args) > 1 else False)
            and any(tables.get(ptq_mod._path_str(b.path)) is not None
                    for st in module.stages for b in st)
        ):
            return _run_resnet_stages(module, args[0])
        if (
            context.method_name == "__call__"
            and isinstance(module, (BasicBlock, Bottleneck))
            and isinstance(args[0], jax.Array)
        ):
            e = tables.get(ptq_mod._path_str(module.path))
            x = args[0]
            if e is not None and x.shape[-1] == _entry_cin(e):
                x4 = x[None] if x.ndim == 3 else x
                shp = x4.shape
                if x4.ndim > 4:
                    x4 = x4.reshape((-1,) + shp[-3:])
                y = _run_stack(x4, [e])
                if x.ndim == 3:
                    return y[0]
                if len(shp) > 4:
                    return y.reshape(shp[:-3] + y.shape[-3:])
                return y
        return next_fn(*args, **kwargs)

    def fused_apply(variables, *args, train: bool = False, method=None,
                    **kwargs):
        if train:
            raise ValueError("int8 fused engine is inference-only")
        with nn.intercept_methods(interceptor):
            if method is None:
                return model.apply(variables, *args, train=False, **kwargs)
            # custom methods own their train default (a bare lambda would
            # reject an injected train kwarg)
            return model.apply(variables, *args, method=method, **kwargs)

    return fused_apply


def build_int8_fused_engine(model, variables, calib_batches, cfg=None,
                            h_tile: int = 16, interpret: bool = False,
                            min_channels: int = 0, clip: str = "mse",
                            adaround_iters: int = 0, verbose: bool = False):
    """One call: calibrate + fold + quantize -> (tables, int8_apply)."""
    tables = build_int8_fused_tables(model, variables, calib_batches,
                                     cfg, min_channels=min_channels,
                                     clip=clip,
                                     adaround_iters=adaround_iters,
                                     verbose=verbose)
    return tables, make_int8_fused_apply(model, tables, h_tile=h_tile,
                                         interpret=interpret)
