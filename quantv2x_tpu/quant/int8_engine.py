"""Real-INT8 inference engine: executes the quantized conv stack on int8 data.

This replaces the reference's TensorRT deployment step
(tools/build_trt_int8.py:46-405 — ONNX export + IInt8EntropyCalibrator2 +
serialized engine): here the "engine build" is a pure-JAX transform:

  1. observe per-unit INPUT ranges on calibration data (interceptor sow);
  2. fold BN into each ConvBNReLU unit's conv (w' = w*g/sqrt(v+eps),
     b' = b_conv*g/sqrt(v+eps) + beta - g*mean/sqrt(v+eps));
  3. per-output-channel symmetric int8 weight quantization of folded
     weights;
  4. at inference, an interceptor REPLACES each unit's __call__ with:
     quantize input to uint8 codes -> int8 conv (int32 MXU accumulation,
     ops/int8_kernels.int8_conv_requant) -> fused dequant+bias+ReLU.

Convolutions (the FLOPs bulk: backbone, pyramid, shrink, heads) run on real
int8; pillar VFE / scatter / warp / softmax stay in float — the same split
TensorRT engines make. Deconv (upsample) units currently stay on the
fake-quant float path (int8 conv_transpose lowering is not guaranteed).
"""

import dataclasses
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from quantv2x_tpu.models.layers import BN_EPS, ConvBNReLU
from quantv2x_tpu.ops.int8_kernels import int8_conv_requant
from quantv2x_tpu.quant import ptq as ptq_mod
from quantv2x_tpu.quant.quantizer import _delta_zp_from_range, quantize_int


def fold_conv_bn(kernel, conv_bias, bn_scale, bn_bias, bn_mean, bn_var,
                 eps=BN_EPS):
    """Fold BatchNorm into conv weights/bias."""
    g = bn_scale / jnp.sqrt(bn_var + eps)
    w = kernel * g[None, None, None, :]
    b = (conv_bias if conv_bias is not None else 0.0) * g + bn_bias - bn_mean * g
    return w, b


def quantize_weight_sym(w, bits=8):
    """Per-output-channel symmetric weight quantization (HWIO, axis -1)."""
    amax = jnp.abs(w).max(axis=(0, 1, 2), keepdims=True)
    delta = jnp.maximum(amax / (2 ** (bits - 1) - 1), 1e-8)
    wq = jnp.clip(
        jnp.round(w / delta), -(2 ** (bits - 1) - 1), 2 ** (bits - 1) - 1
    ).astype(jnp.int8)
    return wq, delta.reshape(-1)


# ---------------------------------------------------------------------------
# Input-range observation
# ---------------------------------------------------------------------------

def observe_input_ranges(model, variables, batches, cfg: ptq_mod.PTQConfig,
                         unit_attrs: dict = None):
    """{unit_path: (lo, hi)} of each ConvBNReLU unit's INPUT.

    Honors cfg.act_percentile (per-batch two-sided quantile, running
    min/max across batches — same observer semantics as quant/ptq.py).
    If `unit_attrs` is given, it is filled with each unit's static
    (strides, groups, act) so engine tables carry the real values."""
    q = cfg.act_percentile

    def interceptor(next_fn, args, kwargs, context):
        module = context.module
        path_s = ptq_mod._path_str(module.path)
        if (
            context.method_name == "__call__"
            and isinstance(module, ConvBNReLU)
            and not ptq_mod._in_scope(path_s, cfg.skip_scopes)
            and isinstance(args[0], jax.Array)
        ):
            x = args[0]
            if unit_attrs is not None:
                st = module.strides
                unit_attrs[path_s] = (
                    (st, st) if isinstance(st, int) else tuple(st),
                    module.groups, module.act,
                )
            flat = x.astype(jnp.float32).ravel()
            if q >= 1.0:
                lo, hi = flat.min(), flat.max()
            else:
                lo, hi = jnp.quantile(flat, jnp.array([1.0 - q, q]))
            module.sow(
                "quant_obs", "in_range",
                (lo, hi),
                init_fn=lambda: (jnp.float32(jnp.inf), jnp.float32(-jnp.inf)),
                reduce_fn=lambda a, b: (
                    jnp.minimum(a[0], b[0]), jnp.maximum(a[1], b[1])
                ),
            )
        return next_fn(*args, **kwargs)

    ranges = {}

    def run(batch):
        with nn.intercept_methods(interceptor):
            _, mut = model.apply(
                variables, batch, train=False, mutable=["quant_obs"]
            )
        return mut["quant_obs"]

    run_j = jax.jit(run)
    for batch in batches:
        obs = jax.device_get(run_j(batch))
        for path_s, pair in _flatten_in_obs(obs).items():
            lo, hi = pair
            if path_s in ranges:
                plo, phi = ranges[path_s]
                ranges[path_s] = (min(plo, lo), max(phi, hi))
            else:
                ranges[path_s] = (float(lo), float(hi))
    return ranges


def _flatten_in_obs(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if k == "in_range":
            pair = v[0] if isinstance(v, tuple) and isinstance(v[0], tuple) else v
            out[ptq_mod._path_str(prefix)] = (float(pair[0]), float(pair[1]))
        elif isinstance(v, dict):
            out.update(_flatten_in_obs(v, prefix + (k,)))
    return out


# ---------------------------------------------------------------------------
# Engine build
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class UnitTable:
    wq: jax.Array          # (kh, kw, cin/g, cout) int8
    scale: jax.Array       # (cout,) = in_delta * w_delta
    bias: jax.Array        # (cout,) float folded bias
    in_delta: jax.Array
    in_zp: jax.Array
    strides: Tuple[int, int]
    groups: int
    relu: bool


def build_engine_tables(model, variables, calib_batches,
                        cfg: ptq_mod.PTQConfig = None):
    """Calibrate input ranges and fold+quantize every ConvBNReLU unit."""
    cfg = cfg or ptq_mod.PTQConfig()
    unit_attrs: Dict[str, tuple] = {}
    in_ranges = observe_input_ranges(model, variables, calib_batches, cfg,
                                     unit_attrs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tables: Dict[str, UnitTable] = {}

    # locate every ConvBNReLU's params by walking the tree for "conv/kernel";
    # the walk only COLLECTS references — all table math runs in one jit
    # below (the previous per-unit eager math was ~10 dispatches x 69 units
    # over the remote-TPU tunnel, i.e. minutes of engine build)
    specs: Dict[str, dict] = {}

    def walk(ptree, btree, prefix):
        if not isinstance(ptree, dict):
            return
        has_conv = ("conv" in ptree and isinstance(ptree["conv"], dict)
                    and "kernel" in ptree["conv"])
        has_grouped = "conv_kernel_grouped" in ptree
        if has_conv or has_grouped:
            path_s = ptq_mod._path_str(prefix)
            if path_s not in in_ranges:
                return
            if has_conv:
                kernel = ptree["conv"]["kernel"]
                conv_bias = ptree["conv"].get("bias")
            else:
                kernel = ptree["conv_kernel_grouped"]
                conv_bias = None
            lo, hi = in_ranges[path_s]
            specs[path_s] = {
                "kernel": kernel, "conv_bias": conv_bias,
                "bn": ptree.get("bn"),
                "bn_stats": (btree or {}).get("bn") if "bn" in ptree else None,
                "lo": jnp.float32(lo), "hi": jnp.float32(hi),
            }
            return
        for k, v in ptree.items():
            walk(v, (btree or {}).get(k, {}) if isinstance(btree, dict) else {},
                 prefix + (k,))

    walk(params, batch_stats, ())

    @jax.jit
    def build_all(specs):
        out = {}
        for path_s, s in specs.items():
            kernel, conv_bias = s["kernel"], s["conv_bias"]
            if s["bn"] is not None:
                w, b = fold_conv_bn(
                    kernel, conv_bias, s["bn"]["scale"], s["bn"]["bias"],
                    s["bn_stats"]["mean"], s["bn_stats"]["var"],
                )
            else:
                w = kernel
                b = (conv_bias if conv_bias is not None
                     else jnp.zeros((kernel.shape[-1],), jnp.float32))
            wq, wd = quantize_weight_sym(w)
            in_delta, in_zp = _delta_zp_from_range(s["lo"], s["hi"], 8)
            out[path_s] = dict(wq=wq, scale=in_delta * wd, bias=b,
                               in_delta=in_delta, in_zp=in_zp)
        return out

    built = build_all(specs)
    for path_s, t in built.items():
        st, gr, act = unit_attrs.get(path_s, ((1, 1), 1, True))
        tables[path_s] = UnitTable(
            wq=t["wq"], scale=t["scale"], bias=t["bias"],
            in_delta=t["in_delta"], in_zp=t["in_zp"],
            strides=st, groups=gr, relu=act,
        )
    return tables


def make_int8_interceptor(tables):
    """The engine as a reusable flax method interceptor (composes with any
    apply — e.g. parallel/serving's shard_map SPMD step)."""

    def interceptor(next_fn, args, kwargs, context):
        module = context.module
        path_s = ptq_mod._path_str(module.path)
        if (
            context.method_name == "__call__"
            and isinstance(module, ConvBNReLU)
            and path_s in tables
            and isinstance(args[0], jax.Array)
        ):
            t = tables[path_s]
            x = args[0]
            shp = x.shape
            if x.ndim == 3:
                x4 = x[None]
            elif x.ndim > 4:
                x4 = x.reshape((-1,) + shp[-3:])
            else:
                x4 = x
            xq = quantize_int(x4.astype(jnp.float32), t.in_delta, t.in_zp, 8)
            s = module.strides
            y = int8_conv_requant(
                xq, t.wq, t.in_zp, t.scale, bias=t.bias,
                relu=module.act, strides=(s, s) if isinstance(s, int) else s,
                groups=module.groups,
            )
            if x.ndim == 3:
                y = y[0]
            elif x.ndim > 4:
                y = y.reshape(shp[:-3] + y.shape[-3:])
            return y.astype(x.dtype)
        return next_fn(*args, **kwargs)

    return interceptor


def make_int8_apply(model, tables, cfg: ptq_mod.PTQConfig = None):
    """Returns int8_apply(variables, batch) executing units on real int8."""
    interceptor = make_int8_interceptor(tables)

    def int8_apply(variables, batch):
        with nn.intercept_methods(interceptor):
            return model.apply(variables, batch, train=False)

    return int8_apply


def build_int8_engine(model, variables, calib_batches,
                      cfg: ptq_mod.PTQConfig = None):
    """One call: calibrate + fold + quantize -> (tables, int8_apply)."""
    cfg = cfg or ptq_mod.PTQConfig()
    tables = build_engine_tables(model, variables, calib_batches, cfg)
    return tables, make_int8_apply(model, tables, cfg)
