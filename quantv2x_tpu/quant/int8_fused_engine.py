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


def observe_engine_ranges(model, variables, batches, cfg=None):
    """One calibration pass -> ({unit_path: (lo, hi)}, {block_path: (lo,
    hi)}): ConvBNReLU INPUT ranges plus Basic/Bottleneck OUTPUT ranges.

    Honors cfg.act_percentile with the same per-batch two-sided quantile
    + running min/max semantics as quant/ptq.py observers."""
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

    def interceptor(next_fn, args, kwargs, context):
        module = context.module
        path_s = ptq_mod._path_str(module.path)
        if (context.method_name == "__call__"
                and not ptq_mod._in_scope(path_s, cfg.skip_scopes)
                and isinstance(args[0], jax.Array)):
            if isinstance(module, ConvBNReLU):
                _sow(module, "in_range", _range(args[0]))
            elif isinstance(module, (BasicBlock, Bottleneck)):
                out = next_fn(*args, **kwargs)
                _sow(module, "out_range", _range(out))
                return out
        return next_fn(*args, **kwargs)

    def run(batch):
        with nn.intercept_methods(interceptor):
            _, mut = model.apply(variables, batch, train=False,
                                 mutable=["quant_obs"])
        return mut["quant_obs"]

    run_j = jax.jit(run)
    unit_ranges, block_ranges = {}, {}

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

    for batch in batches:
        flatten(jax.device_get(run_j(batch)))
    return unit_ranges, block_ranges


def _grid(lo, hi):
    """(delta, ezp) for stored-int8 codes: f = (s - ezp) * delta."""
    d, zp = _delta_zp_from_range(jnp.float32(lo), jnp.float32(hi), 8)
    return jnp.float32(d), jnp.float32(zp) - 128.0


def _wquant(w):
    """Per-output-channel symmetric int8.

    Dense (..., cout): out channels = last axis. Supergrouped bottleneck
    w2 (3, 3, S, 128, 128): out channel c = s * 128 + lane, so the
    reduction keeps both the supergroup and the lane axis."""
    axes = (0, 1, 3) if w.ndim == 5 else tuple(range(w.ndim - 1))
    amax = jnp.abs(w).max(axis=axes, keepdims=True)
    dw = jnp.maximum(amax / 127.0, 1e-12)
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


def _conv_tables(w, b, in_grid):
    """Quantize one folded conv: (wq, sb) with the zero-point correction
    folded into the bias row. sb = [scale; bias'] (2, cout) f32."""
    d_in, ezp_in = in_grid
    wq, dw = _wquant(w)
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


def build_int8_fused_tables(model, variables, calib_batches, cfg=None,
                            min_channels: int = 0):
    """{block_path: entry} for every fusable stride-1 block.

    entry = dict(kind, blk=(w1q, sb1, w2q, sb2[, w3q, sb3]),
                 g_in, g_h1, [g_h2], g_out) with g_* = (delta, ezp) f32
    scalars of the stored-int8 grids."""
    cfg = cfg or ptq_mod.PTQConfig()
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

    def build_all(specs):
        out = {}
        for path_s, s in specs.items():
            grids = [_grid(*r) for r in s["in_ranges"]]
            g_out = _grid(*s["out_range"])
            ws = s["ws"]
            if kinds[path_s] == "basic":
                w1, b1, w2, b2 = ws
                w1q, sb1 = _conv_tables(w1, b1, grids[0])
                w2q, sb2 = _conv_tables(w2, b2, grids[1])
                out[path_s] = dict(
                    blk=(w1q, sb1, w2q, sb2), g_in=grids[0],
                    g_h1=grids[1], g_out=g_out)
            else:
                w1, b1, w2, b2, w3, b3 = ws
                w1q, sb1 = _conv_tables(w1, b1, grids[0])
                w2q, sb2 = _conv_tables(w2, b2, grids[1])
                w3q, sb3 = _conv_tables(w3, b3, grids[2])
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
            return model.apply(variables, *args, train=False,
                               method=method, **kwargs)

    return fused_apply


def build_int8_fused_engine(model, variables, calib_batches, cfg=None,
                            h_tile: int = 16, interpret: bool = False,
                            min_channels: int = 0):
    """One call: calibrate + fold + quantize -> (tables, int8_apply)."""
    tables = build_int8_fused_tables(model, variables, calib_batches,
                                     cfg, min_channels=min_channels)
    return tables, make_int8_fused_apply(model, tables, h_tile=h_tile,
                                         interpret=interpret)
