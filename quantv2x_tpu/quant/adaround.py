"""AdaRound learned rounding + LSQ activation-step reconstruction.

Parity targets:
  - AdaRoundQuantizer (opencood/quant/adaptive_rounding.py:6-75): rectified
    sigmoid h(alpha) = clip(sigmoid(alpha)(zeta-gamma)+gamma, 0, 1) with
    zeta=1.1, gamma=-0.1; alpha initialized so h(alpha) equals the float
    rounding remainder; deploy uses hard h(alpha) >= 0.5;
  - per-layer/block reconstruction loop (opencood/quant/layer_recon.py,
    block_recon.py:93-232): Adam on alpha (and LSQ on the activation step,
    lr 4e-5) minimizing Lp(2) reconstruction + rounding relaxation with
    linearly decaying temperature b: 20 -> 2 after 20% warmup, 5000 iters
    (defaults: tools/inference_mc_quant.py:269-298).

Capture modes (ReconCfg.sequential):
  - sequential=True (default, reference parity): each unit's input is
    re-captured from the partially-reconstructed model right before its
    optimization, so later units see their refined predecessors (the
    reference's per-block save_inp_oup_data + StopForwardException,
    quant/data_utils.py:94-137); capture early-exits at the target unit.
  - sequential=False: all unit inputs captured once from the minmax
    quantized model (cheaper: 2 forward passes total instead of one per
    unit).
A per-unit safety fallback keeps nearest rounding whenever the learned
rounding fails to beat it on the calibration samples.

Functional design: each quantization unit (ConvBNReLU / PFNLayer / head
conv) is captured via interception — its input batch (from the
quantized-so-far model), its FP output, a detached clone of the module, and
its variable subtree — then its kernels' rounding masks are optimized in
isolation and written back into the quantized param tree. Unit-sequential
reconstruction follows the reference's recon_model recursion
(inference_mc_quant.py:458-536).
"""

import dataclasses
import os
from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from quantv2x_tpu.quant import ptq as ptq_mod
from quantv2x_tpu.quant.quantizer import QuantSpec

ZETA, GAMMA = 1.1, -0.1


def rect_sigmoid(alpha):
    return jnp.clip(jax.nn.sigmoid(alpha) * (ZETA - GAMMA) + GAMMA, 0.0, 1.0)


def alpha_init(w, delta):
    """alpha s.t. h(alpha) = frac(w/delta) (adaptive_rounding.py:52-60)."""
    rest = w / delta - jnp.floor(w / delta)
    rest = jnp.clip(rest, 1e-4, 1 - 1e-4)
    return -jnp.log((ZETA - GAMMA) / (rest - GAMMA) - 1)


def adaround_weight(w, delta, zp, n_bits: int, alpha, hard: bool):
    """Quantize weight with learned rounding."""
    n_levels = 2 ** n_bits
    floor = jnp.floor(w / delta)
    r = (rect_sigmoid(alpha) >= 0.5).astype(w.dtype) if hard else rect_sigmoid(alpha)
    xq = jnp.clip(floor + r + zp, 0, n_levels - 1)
    return (xq - zp) * delta


def round_loss(alpha, beta):
    """Rounding relaxation: mean(1 - |2h-1|^beta).

    The reference sums over weights (block_recon LossFunction) against a
    large-magnitude recon loss; with our normalized (mean) recon objective a
    mean keeps the two terms on comparable scales across unit sizes."""
    h = rect_sigmoid(alpha)
    return jnp.mean(1.0 - jnp.abs(2 * h - 1.0) ** beta)


@dataclasses.dataclass
class ReconCfg:
    iters: int = 800                 # reference default 5000; tests use less
    round_weight: float = 0.01
    b_start: float = 20.0
    b_end: float = 2.0
    warmup: float = 0.2
    alpha_lr: float = 1e-2           # reference 1e-3..1e-2 range
    act_lr: float = 4e-5             # LSQ lr (inference_mc_quant.py:287)
    batch_size: int = 8192           # max samples per unit (0 = all)
    # rows drawn per optimization step (parity: block_recon's per-iter
    # random calib minibatch). 0 = auto: ~16M input elements per step —
    # full feature maps use ~8 rows, pillar-row units thousands. Without
    # this, every iter consumes the whole capture pool (measured ~7 min
    # per flagship conv unit at 5000 iters; minibatched: seconds).
    iter_rows: int = 0
    sequential: bool = True          # per-unit input re-capture (parity)
    # --- prediction-level terms (parity: block_recon.py LossFunction
    # :262-312 hetero KL + misalignment, pyramid_recon.py:61-85 heads from
    # the reconstructed feature + SoftBoundingBoxLoss:382). Applied to
    # units whose output feeds the detection heads (pred_unit_suffixes)
    # when the model's head params are found next to them. ---
    pred_terms: bool = True
    pred_unit_suffixes: tuple = ("shrink/conv2",)
    kl_T: float = 7.0                # softmax temperature (T=7.0)
    feat_kl_weight: float = 0.2     # channel-softmax KL on unit outputs
    pred_weight: float = 1.0        # lp misalignment on head predictions
    box_weight: float = 0.02        # soft-box term on reg deltas (lamb_c)


# ---------------------------------------------------------------------------
# Unit capture
# ---------------------------------------------------------------------------

def capture_units(model, variables, qvariables, act_scales, batches,
                  cfg: ptq_mod.PTQConfig):
    """For every quantization unit, capture (module clone, quant-input list,
    fp-output list). Inputs come from the quantized model (reference's
    quant-input convention), outputs from the FP model."""
    store: Dict[str, dict] = {}

    def make_cap(kind, use_quant):
        def interceptor(next_fn, args, kwargs, context):
            module = context.module
            path_s = ptq_mod._path_str(module.path)
            is_unit = (
                context.method_name == "__call__"
                and ptq_mod._is_unit(module, path_s)
                and not ptq_mod._in_scope(path_s, cfg.skip_scopes)
            )
            if is_unit and kind == "in":
                ent = store.setdefault(
                    path_s, {"inputs": [], "outputs": [], "module": None,
                             "extra_args": []},
                )
                ent["module"] = module.clone(parent=None)
                ent["inputs"].append(jax.device_get(args[0]))
                ent["extra_args"].append(
                    tuple(jax.device_get(a) if isinstance(a, jax.Array) else a
                          for a in args[1:])
                )
            out = next_fn(*args, **kwargs)
            if is_unit and kind == "out":
                store.setdefault(
                    path_s, {"inputs": [], "outputs": [], "module": None,
                             "extra_args": None},
                )["outputs"].append(jax.device_get(out))
            if (is_unit and kind == "in" and path_s in act_scales):
                # keep propagating quantized activations downstream
                delta, zp = act_scales[path_s]
                out = cfg.act_spec.apply(out, delta, zp).astype(out.dtype)
            return out

        return interceptor

    for batch in batches:
        with nn.intercept_methods(make_cap("in", True)):
            model.apply(qvariables, batch, train=False)
        with nn.intercept_methods(make_cap("out", False)):
            model.apply(variables, batch, train=False)
    return store


class _StopCapture(Exception):
    """Early exit once the target unit's input is captured (parity:
    quant/data_utils.py StopForwardException:94-120)."""


# Keep-first sow pattern: canonical helpers in quant/ptq.py (flax's
# default init_fn returns (), so a plain `reduce_fn=lambda a, b: a` keeps
# the empty tuple forever — the round-2 sequential-capture bug; every
# keep-first sow must use this pair)
from quantv2x_tpu.quant.ptq import first_sow_init as _first_init
from quantv2x_tpu.quant.ptq import first_sow_reduce as _first_reduce


def capture_fp_outputs(model, variables, batches, cfg: ptq_mod.PTQConfig):
    """One FP pass per batch: per-unit FP outputs + module clones, in
    first-execution order (dict insertion order = reconstruction order).

    The forward is JITTED with sow-based capture — an eager interceptor
    pass is one tunnel dispatch PER OP on the remote-TPU backend (measured
    in the tens of minutes at the flagship grid). The sow reduce_fn keeps
    the FIRST call per unit per batch (units invoked several times per
    forward — e.g. heter encoders applied per agent — must stay aligned
    with capture_unit_inputs, which records the first call)."""
    modules: Dict[str, object] = {}
    order: List[str] = []

    def interceptor(next_fn, args, kwargs, context):
        module = context.module
        path_s = ptq_mod._path_str(module.path)
        is_unit = (
            context.method_name == "__call__"
            and ptq_mod._is_unit(module, path_s)
            and not ptq_mod._in_scope(path_s, cfg.skip_scopes)
        )
        out = next_fn(*args, **kwargs)
        if is_unit:
            if path_s not in modules:
                modules[path_s] = module.clone(parent=None)
                order.append(path_s)
            if isinstance(out, jax.Array):
                module.sow("cap_out", "out", out,
                           init_fn=_first_init,
                           reduce_fn=_first_reduce)   # keep first call
        return out

    def run(batch):
        with nn.intercept_methods(interceptor):
            _, mut = model.apply(variables, batch, train=False,
                                 mutable=["cap_out"])
        return mut["cap_out"]

    run_j = jax.jit(run)
    store: Dict[str, dict] = {}
    for batch in batches:
        caps = jax.device_get(run_j(batch))
        flat = _flatten_caps(caps, "out")
        for path_s in flat:
            store.setdefault(path_s, {"outputs": [], "module": None})
            store[path_s]["outputs"].append(flat[path_s])
    # insertion order = first-execution order (the jit trace visits units
    # in execution order, populating `order`)
    for path_s in store:
        store[path_s]["module"] = modules.get(path_s)
    return {p: store[p] for p in order if p in store}


def _flatten_caps(tree, leaf_key, prefix=()):
    out = {}
    for k, v in tree.items():
        if k == leaf_key:
            val = v[0] if isinstance(v, tuple) else v
            out[ptq_mod._path_str(prefix)] = val
        elif isinstance(v, dict):
            out.update(_flatten_caps(v, leaf_key, prefix + (k,)))
    return out


def make_sequential_capturer(model, cfg: ptq_mod.PTQConfig):
    """ONE jitted capture program for unit-sequential reconstruction.

    Sows EVERY unit's first-call input (+ array extra args) and applies
    each unit's activation fake-quant downstream, with ``qvariables`` and
    ``act_scales`` as jit ARGUMENTS — so refining a unit's weights or act
    step never recompiles: the reference's per-block StopForward recapture
    (quant/data_utils.py:94-137) becomes the same compiled forward
    re-executed with updated params. (The previous per-target design
    traced a fresh full-model program per unit: at the flagship grid
    that's minutes of XLA compile x #units over the remote-TPU tunnel,
    which is exactly why the flagship AdaRound number never landed.)

    Returns (run_j, static_extras): ``run_j(qvariables, act_scales,
    batch) -> cap_in tree``; ``static_extras`` is filled at trace time
    with {unit_path: tuple(static-or-None per extra arg)}. Only the
    target unit's leaves should be fetched per call — the rest stay on
    device and are dropped (no transfer)."""
    static_extras: Dict[str, tuple] = {}
    scales_ref: Dict[str, tuple] = {}

    def interceptor(next_fn, args, kwargs, context):
        module = context.module
        path_s = ptq_mod._path_str(module.path)
        is_unit = (
            context.method_name == "__call__"
            and ptq_mod._is_unit(module, path_s)
            and not ptq_mod._in_scope(path_s, cfg.skip_scopes)
        )
        if is_unit:
            if path_s not in static_extras:
                static_extras[path_s] = tuple(
                    None if isinstance(a, jax.Array) else a
                    for a in args[1:])
            # keep-first sow: units invoked several times per forward
            # (per-agent encoders) record their first call, aligned with
            # capture_fp_outputs
            module.sow("cap_in", "inp", args[0],
                       init_fn=_first_init, reduce_fn=_first_reduce)
            for i, a in enumerate(args[1:]):
                if isinstance(a, jax.Array):
                    module.sow("cap_in", f"extra{i}", a,
                               init_fn=_first_init, reduce_fn=_first_reduce)
        out = next_fn(*args, **kwargs)
        if is_unit and path_s in scales_ref:
            delta, zp = scales_ref[path_s]
            out = cfg.act_spec.apply(out, delta, zp).astype(out.dtype)
        return out

    def run(qvariables, act_scales, batch):
        # populated at trace time; traced scale values flow into the graph,
        # later calls reuse the compiled program with fresh argument values.
        # The set of units that receive act fake-quant is frozen at trace
        # time to act_scales' keys — safe because a dict's pytree structure
        # includes its keys, so adding/removing a key forces a retrace; only
        # value updates (same keys) reuse the compiled program.
        scales_ref.clear()
        scales_ref.update(act_scales)
        with nn.intercept_methods(interceptor):
            _, mut = model.apply(qvariables, batch, train=False,
                                 mutable=["cap_in"])
        return mut["cap_in"]

    return jax.jit(run), static_extras


def _unit_caps(caps, rel: Sequence[str]):
    """Navigate the cap_in tree to one unit's sub-dict (device arrays)."""
    sub = caps
    for p in rel:
        sub = sub.get(p)
        if sub is None:
            return None
    return sub


def _sow_leaf(v):
    return v[0] if isinstance(v, tuple) else v


def capture_unit_inputs(run_cap, static_extras, qvariables, act_scales,
                        batches, target: str):
    """Fetch ONE unit's inputs from the quantized-so-far model via the
    shared capture program (reference GetLayerInpOut semantics: weight +
    activation fake-quant of every predecessor applied). Only the target
    unit's arrays cross the device boundary."""
    rel = target.split("/")
    inputs: List[np.ndarray] = []
    extra_args: List[tuple] = []
    for batch in batches:
        caps = run_cap(qvariables, act_scales, batch)
        sub = _unit_caps(caps, rel)
        if sub is None or "inp" not in sub:
            continue
        inputs.append(jax.device_get(_sow_leaf(sub["inp"])))
        extras = list(static_extras.get(target, ()))
        for i in range(len(extras)):
            if extras[i] is None:
                extras[i] = jax.device_get(_sow_leaf(sub[f"extra{i}"]))
        extra_args.append(tuple(extras))
    return inputs, extra_args


# ---------------------------------------------------------------------------
# Per-unit optimization
# ---------------------------------------------------------------------------

def _subtree(tree, path: Sequence[str]):
    for p in path:
        tree = tree[p]
    return tree


def _set_subtree(tree, path: Sequence[str], value):
    if not path:
        return value
    return dict(tree, **{path[0]: _set_subtree(tree[path[0]], path[1:], value)})


def _soft_box_loss(rq, rf):
    """SoftBoundingBoxLoss (pyramid_recon.py:382): weighted L2 on the six
    position/size channels + (1 - cos) on the yaw channel, applied on reg
    deltas reshaped (..., 7)."""
    rq = rq.reshape(rq.shape[:-1] + (-1, 7))
    rf = rf.reshape(rf.shape[:-1] + (-1, 7))
    spatial = jnp.mean((rq[..., :6] - rf[..., :6]) ** 2)
    angle = jnp.mean(1.0 - jnp.cos(rq[..., 6] - rf[..., 6]))
    return spatial + angle


def _channel_kl(y_q, y_fp, T):
    """KL(softmax_c(fp/T) || softmax_c(q/T)) over the channel axis
    (block_recon.py:283 'hetero' loss, KLDivLoss batchmean semantics)."""
    lq = jax.nn.log_softmax(y_q.astype(jnp.float32) / T, axis=-1)
    lf = jax.nn.log_softmax(y_fp.astype(jnp.float32) / T, axis=-1)
    pf = jnp.exp(lf)
    return jnp.mean(jnp.sum(pf * (lf - lq), axis=-1))


def make_pred_loss(head_params, rcfg: "ReconCfg"):
    """Prediction-level loss closure for a pre-head unit.

    head_params: {"cls_head": (kernel, bias), "reg_head": ..., ...} (1x1
    conv params). Returns fn(y_q, y_fp) -> scalar with the reference's
    three terms: feature channel-KL, head-output misalignment, soft-box."""
    def run_heads(y):
        outs = {}
        for name, (k, b) in head_params.items():
            o = jnp.einsum("...c,cd->...d", y.astype(jnp.float32),
                           k.reshape(k.shape[-2], k.shape[-1]))
            outs[name] = o + (b if b is not None else 0.0)
        return outs

    def pred_loss(y_q, y_fp):
        loss = rcfg.feat_kl_weight * _channel_kl(y_q, y_fp, rcfg.kl_T)
        hq, hf = run_heads(y_q), run_heads(y_fp)
        mis = sum(jnp.mean((hq[n] - hf[n]) ** 2) for n in hq)
        loss = loss + rcfg.pred_weight * mis
        if "cls_head" in hq:
            loss = loss + rcfg.feat_kl_weight * _channel_kl(
                hq["cls_head"], hf["cls_head"], rcfg.kl_T)
        if "reg_head" in hq:
            loss = loss + rcfg.box_weight * _soft_box_loss(
                hq["reg_head"], hf["reg_head"])
        return loss

    return pred_loss


#: compiled (optimize, recon_err) programs keyed by unit config + shapes.
#: Flagship models repeat the same unit geometry dozens of times (every
#: layerN_blockM conv1 shares one shape class); tracing the reconstruction
#: loop per INSTANCE paid ~40-80 s of XLA compile per unit — per shape
#: CLASS it's ~6x fewer compiles. All per-unit arrays (calib tensors, FP
#: params, weight scales, head params, rng) travel as jit arguments.
_PROG_CACHE: Dict[tuple, tuple] = {}


def _unit_key(unit):
    """Explicit cache key for a flax unit module: type + every dataclass
    field (excluding tree-wiring fields), regardless of each field's
    ``repr`` flag. ``repr(unit)`` was the previous key — correctness then
    silently depended on flax dataclass repr encoding every
    behavior-determining field, which a future field with ``repr=False``
    would break."""
    import dataclasses as _dc

    fields = []
    for f in _dc.fields(unit):
        if f.name in ("parent", "name"):
            continue
        fields.append((f.name, repr(getattr(unit, f.name, None))))
    return (type(unit).__module__, type(unit).__qualname__, tuple(fields))


def _tree_key(tree):
    return tuple(
        (jax.tree_util.keystr(path), tuple(getattr(leaf, "shape", ())),
         str(getattr(leaf, "dtype", type(leaf).__name__)))
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    )


def reconstruct_unit(unit, fp_params, batch_stats, w_scales_local,
                     act_scale, inputs, fp_outputs, extra_args,
                     spec_w: QuantSpec, spec_a: QuantSpec, rcfg: ReconCfg,
                     rng, head_params=None):
    """Optimize rounding masks (+ act step) for one unit.

    fp_params: unit's FP param subtree. w_scales_local: {rel_path: (d, zp)}.
    head_params: optional {"cls_head": (kernel, bias), ...} — enables the
    prediction-level loss terms (make_pred_loss) for pre-head units.
    Returns (hard-rounded quantized unit params, learned act (delta, zp)).
    """
    flat_params = jax.tree_util.tree_flatten_with_path(fp_params)[0]
    kernel_items = [
        ("/".join(k.key for k in path), leaf)
        for path, leaf in flat_params
        if path[-1].key in ("kernel", "conv_kernel_grouped")
    ]
    # alphas in f32 always: bf16 models would otherwise learn the rounding
    # mask at 8-bit mantissa precision (and leak bf16 into the Adam state)
    alphas = {
        p: alpha_init(w.astype(jnp.float32),
                      jnp.asarray(w_scales_local[p][0], jnp.float32))
        for p, w in kernel_items
        if p in w_scales_local
    }
    w_scales_local = {p: w_scales_local[p] for p in alphas}
    act_delta = act_scale[0] if act_scale is not None else None
    act_zp = act_scale[1] if act_scale is not None else None

    x = np.concatenate(inputs, axis=0)
    y_fp = np.concatenate(fp_outputs, axis=0)
    if y_fp.shape[0] != x.shape[0]:
        raise ValueError(
            f"captured input/output sample mismatch ({x.shape[0]} vs "
            f"{y_fp.shape[0]}) — capture_fp_outputs and "
            f"capture_unit_inputs must both record the first call per batch"
        )
    # merge per-batch extra args: concatenate arrays, pass scalars through
    if extra_args:
        merged = []
        for vals in zip(*extra_args):
            if isinstance(vals[0], np.ndarray):
                merged.append(np.concatenate(vals, axis=0))
            else:
                merged.append(vals[0])
        extra_args = tuple(merged)
    else:
        extra_args = ()
    # cap the sample count per step (rcfg.batch_size; pillar-level units
    # capture hundreds of thousands of rows — a random subset suffices)
    if rcfg.batch_size and x.shape[0] > rcfg.batch_size:
        old_n = x.shape[0]
        sel = np.random.default_rng(0).choice(
            old_n, rcfg.batch_size, replace=False
        )
        x = x[sel]
        y_fp = y_fp[sel]
        extra_args = tuple(
            a[sel] if isinstance(a, np.ndarray) and a.ndim >= 1
            and a.shape[0] == old_n else a
            for a in extra_args
        )
    x = jnp.asarray(x)
    y_fp = jnp.asarray(y_fp)
    extra_args = tuple(
        jnp.asarray(a) if isinstance(a, np.ndarray) else a for a in extra_args
    )

    # split extra args: arrays travel as jit arguments (big calibration
    # tensors must not bake into the HLO, and at flagship shapes the
    # remote-compile tunnel rejects baked-constant programs — HTTP 413),
    # non-array flags stay static
    extra_static = tuple(None if isinstance(a, jax.Array) else a
                         for a in extra_args)
    extra_arrays = tuple(a for a in extra_args if isinstance(a, jax.Array))

    opt_vars = {"alphas": alphas}
    if act_delta is not None:
        opt_vars["act_delta"] = act_delta
    data = {"x": x, "y_fp": y_fp, "fp_params": fp_params,
            "extra": extra_arrays, "bs": batch_stats, "w": w_scales_local,
            "act_zp": act_zp, "heads": head_params, "rng": rng}

    # per-iter minibatch rows (parity: block_recon draws a random calib
    # minibatch each step). auto targets ~16M input elements per step.
    n_rows = x.shape[0]
    rows = rcfg.iter_rows or int(np.clip(
        16_000_000 // max(int(np.prod(x.shape[1:])), 1), 8, n_rows))
    rows = min(rows, n_rows)

    key = (_unit_key(unit), extra_static, act_delta is not None,
           head_params is not None, repr(rcfg), repr(spec_w), repr(spec_a),
           rows, n_rows, _tree_key(data), _tree_key(opt_vars))
    cache_hit = key in _PROG_CACHE
    if cache_hit:
        optimize, recon_err, tx = _PROG_CACHE[key]
    else:
        optimize, recon_err, tx = _build_unit_programs(
            unit, extra_static, spec_w, spec_a, rcfg, rows, n_rows)
        _PROG_CACHE[key] = (optimize, recon_err, tx)

    opt_state = tx.init(opt_vars)
    opt_vars, opt_state, recon = optimize(opt_vars, opt_state, data)

    new_act = (
        (jnp.maximum(opt_vars["act_delta"], 1e-8), act_zp)
        if act_delta is not None else None
    )
    old_act = (act_delta, act_zp) if act_delta is not None else None
    q_learned = _quantize_unit_params(
        fp_params, w_scales_local, opt_vars["alphas"], spec_w.n_bits, True)
    q_nearest = _quantize_unit_params(
        fp_params, w_scales_local,
        jax.tree.map(lambda a: a * 1e3, alphas), spec_w.n_bits, True,
    )  # saturated init-alphas == nearest rounding
    # safety: hard-thresholded learned rounding is only kept if it actually
    # reconstructs better than nearest rounding on the calibration samples
    # (with few iters the relaxation may not have binarized, making the hard
    # threshold arbitrary — the reference relies on 5000-iter anneals)
    e_learned = float(recon_err(q_learned, new_act, data))
    e_nearest = float(recon_err(q_nearest, old_act, data))
    if e_learned <= e_nearest:
        return q_learned, new_act, e_learned, cache_hit
    return q_nearest, old_act, e_nearest, cache_hit


def _quantize_unit_params(fp_params, w_scales, alphas, n_bits, hard):
    def visit(path, leaf):
        p = "/".join(k.key for k in path)
        if p in alphas:
            d, zp = w_scales[p]
            return adaround_weight(
                leaf.astype(jnp.float32), d, zp, n_bits,
                alphas[p], hard).astype(leaf.dtype)
        return leaf
    return jax.tree_util.tree_map_with_path(visit, fp_params)


def _build_unit_programs(unit, extra_static, spec_w: QuantSpec,
                         spec_a: QuantSpec, rcfg: ReconCfg,
                         rows: int, n_rows: int):
    """Compile the per-unit (optimize, recon_err) pair. Everything
    tensor-valued reaches the program through the ``data`` argument so one
    compilation serves every unit instance with this shape signature."""
    tx = optax.multi_transform(
        {"alphas": optax.adam(rcfg.alpha_lr),
         "act_delta": optax.adam(rcfg.act_lr)},
        param_labels=lambda tree: {k: k for k in tree},
    )

    def unit_apply(params_q, data):
        vars_in = {"params": params_q}
        if data["bs"]:
            vars_in["batch_stats"] = data["bs"]
        arrs = iter(data["extra"])
        full = tuple(next(arrs) if s is None else s for s in extra_static)
        return unit.apply(vars_in, data["x"], *full)

    def forward(q_params, act, data):
        y = unit_apply(q_params, data)
        if act is not None:
            y = spec_a.apply(y, jnp.maximum(act[0], 1e-8), act[1])
        return y

    def err_terms(y, data):
        # f32 loss arithmetic regardless of model dtype (bf16 models would
        # otherwise leak bf16 into the fori_loop carry and the Adam state)
        err = jnp.mean(jnp.abs(y.astype(jnp.float32)
                               - data["y_fp"].astype(jnp.float32)) ** 2)
        if data["heads"] is not None:
            err = err + make_pred_loss(data["heads"], rcfg)(
                y, data["y_fp"]).astype(jnp.float32)
        return err

    def loss_fn(opt_vars, beta, data):
        alphas_v = opt_vars["alphas"]
        q_params = _quantize_unit_params(
            data["fp_params"], data["w"], alphas_v, spec_w.n_bits, False)
        act = ((opt_vars["act_delta"], data["act_zp"])
               if "act_delta" in opt_vars else None)
        y = forward(q_params, act, data)
        recon = jnp.mean(jnp.abs(y.astype(jnp.float32)
                                 - data["y_fp"].astype(jnp.float32)) ** 2)
        rl = sum(round_loss(a, beta)
                 for a in alphas_v.values()) / max(len(alphas_v), 1)
        total = recon + rcfg.round_weight * rl.astype(jnp.float32)
        if data["heads"] is not None:
            total = total + make_pred_loss(data["heads"], rcfg)(
                y, data["y_fp"]).astype(jnp.float32)
        return total, recon

    def _gather_rows(data, idx):
        sel = lambda a: a[idx] if (
            isinstance(a, jax.Array) and a.ndim >= 1
            and a.shape[0] == n_rows) else a
        return dict(data, x=data["x"][idx], y_fp=data["y_fp"][idx],
                    extra=tuple(sel(a) for a in data["extra"]))

    warm = int(rcfg.iters * rcfg.warmup)

    @jax.jit
    def optimize(opt_vars, opt_state, data):
        # whole reconstruction as ONE compiled loop — per-step dispatch over
        # a remote-TPU tunnel would dominate otherwise
        def body(it, carry):
            opt_vars, opt_state, _ = carry
            t = jnp.clip((it - warm) / max(rcfg.iters - warm, 1), 0.0, 1.0)
            beta = rcfg.b_start + (rcfg.b_end - rcfg.b_start) * t
            if rows < n_rows:
                idx = jax.random.randint(
                    jax.random.fold_in(data["rng"], it), (rows,), 0, n_rows)
                data_it = _gather_rows(data, idx)
            else:
                data_it = data
            (loss, recon), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(opt_vars, beta, data_it)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(opt_vars, updates), opt_state, recon)

        return jax.lax.fori_loop(
            0, rcfg.iters, body,
            (opt_vars, opt_state, jnp.float32(0.0)),
        )

    @jax.jit
    def recon_err(q_params, act, data):
        return err_terms(forward(q_params, act, data), data)

    return optimize, recon_err, tx


def _resume_path(resume_dir, path_s):
    return os.path.join(resume_dir, path_s.replace("/", "__") + ".npz")


def resume_fingerprint(variables, calib_seeds=None, epoch=None, iters=None):
    """Fingerprint of everything a resume dir's per-unit results depend on:
    the FP params the units were reconstructed against, the calibration
    data identity, and the optimization length.

    Params are hashed from ONE packed device fetch (exact bytes, so the
    fingerprint is identical on every backend) — per-leaf np.asarray
    would cost one tunnel round trip per parameter (~300 leaves x ~1s on
    the remote backend), and reduction-based summaries differ between
    CPU and TPU numerics."""
    import hashlib
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat = sorted(flat, key=lambda kv: jax.tree_util.keystr(kv[0]))

    @jax.jit
    def _packed(leaves):
        return jnp.concatenate(
            [jnp.ravel(v).astype(jnp.float32) for v in leaves])

    buf = np.asarray(_packed([v for _, v in flat]))
    h = hashlib.sha256()
    for p, v in flat:
        h.update(jax.tree_util.keystr(p).encode())
        h.update(str(tuple(v.shape)).encode())
    h.update(buf.tobytes())
    return {"params_sha256": h.hexdigest()[:16],
            "calib_seeds": list(calib_seeds) if calib_seeds else None,
            "epoch": epoch, "iters": iters}


def _check_resume_meta(resume_dir, meta, verbose):
    """Refuse stale per-unit caches (advisor r4, medium): a resume dir is
    only valid against the exact checkpoint + calib set it was built on.
    Legacy dirs (units but no meta.json) are grandfathered: stamped with
    the current fingerprint and a warning, since refusing would discard
    them with no way to verify."""
    import glob as _glob
    import json as _json
    fn = os.path.join(resume_dir, "meta.json")
    if os.path.exists(fn):
        with open(fn) as f:
            got = _json.load(f)
        mismatch = {k: (got.get(k), v) for k, v in meta.items()
                    if got.get(k) != v}
        if mismatch:
            raise RuntimeError(
                f"adaround resume dir {resume_dir} was built against a "
                f"different run (mismatched {mismatch}); clear the dir or "
                f"point --run_dir elsewhere — reusing it would silently "
                f"mix results from two checkpoints/calib sets")
    else:
        legacy = _glob.glob(os.path.join(resume_dir, "*.npz"))
        if legacy and verbose:
            print(f"[adaround] WARNING: {len(legacy)} legacy resume units "
                  f"with no meta.json in {resume_dir}; stamping current "
                  f"fingerprint (cannot verify they match)", flush=True)
        with open(fn, "w") as f:
            _json.dump(meta, f, indent=1)


def _save_unit_result(resume_dir, path_s, q_sub, new_act):
    """Persist one reconstructed unit (crash resume: a flagship 5000-iter
    run is hours, and the tunneled TPU worker can kernel-fault at any
    point — r4 lost a 64/69-unit run to exactly that)."""
    flat = jax.tree_util.tree_flatten_with_path(q_sub)[0]
    payload = {"param::" + jax.tree_util.keystr(p): np.asarray(v)
               for p, v in flat}
    if new_act is not None:
        payload["act::delta"] = np.asarray(new_act[0])
        if new_act[1] is not None:
            payload["act::zp"] = np.asarray(new_act[1])
    # np.savez appends ".npz" when absent — keep the tmp name ending in
    # .npz so the atomic rename source actually exists
    tmp = _resume_path(resume_dir, path_s)[:-4] + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, _resume_path(resume_dir, path_s))


def _skip_path(resume_dir, path_s):
    return _resume_path(resume_dir, path_s)[:-4] + ".skip"


def _skip_count(resume_dir, path_s):
    fn = _skip_path(resume_dir, path_s)
    if not os.path.exists(fn):
        return 0
    with open(fn) as f:
        return int(f.read().strip() or 0)


def _mark_skip(resume_dir, path_s):
    n = _skip_count(resume_dir, path_s) + 1
    with open(_skip_path(resume_dir, path_s), "w") as f:
        f.write(str(n))
    return n


def _wait_backend_recovery(max_wait_s=900, probe_every_s=45):
    """After a tunneled-TPU worker crash mid-run, the remote side needs
    minutes to come back (measured r4: 2-15 min). Probe with a trivial
    dispatch until it answers or the budget runs out."""
    import time as _time
    t0 = _time.time()
    while _time.time() - t0 < max_wait_s:
        try:
            float(jnp.asarray(1.0) + 1.0)
            return True
        except Exception:
            _time.sleep(probe_every_s)
    return False


def _load_unit_result(resume_dir, path_s, fp_sub):
    fn = _resume_path(resume_dir, path_s)
    if not os.path.exists(fn):
        return None
    data = np.load(fn)
    flat = jax.tree_util.tree_flatten_with_path(fp_sub)
    leaves = []
    for p, v in flat[0]:
        key = "param::" + jax.tree_util.keystr(p)
        if key not in data:
            return None          # structure drifted — recompute
        leaves.append(jnp.asarray(data[key]).astype(v.dtype))
    q_sub = jax.tree_util.tree_unflatten(flat[1], leaves)
    new_act = None
    if "act::delta" in data:
        zp = jnp.asarray(data["act::zp"]) if "act::zp" in data else None
        new_act = (jnp.asarray(data["act::delta"]), zp)
    return q_sub, new_act


def adaround_reconstruct(model, variables, calib_batches,
                         cfg: ptq_mod.PTQConfig = None,
                         rcfg: ReconCfg = None, verbose: bool = False,
                         resume_dir: str = None, resume_meta: dict = None):
    """Full pipeline: minmax PTQ -> unit-sequential AdaRound+LSQ refinement.

    ``resume_dir``: directory for per-unit crash-resume checkpoints —
    each reconstructed unit's hard-rounded params + act step are saved
    after its optimization; a rerun loads them and skips straight to the
    first unfinished unit (the sequential capture re-derives its inputs
    from the restored quantized prefix, so the resumed result equals an
    uninterrupted run up to rng).

    Returns (qvariables, act_scales, qapply).
    """
    import time as _time
    cfg = cfg or ptq_mod.PTQConfig()
    rcfg = rcfg or ReconCfg()
    if resume_dir and resume_meta is not None:
        os.makedirs(resume_dir, exist_ok=True)
        _check_resume_meta(resume_dir, resume_meta, verbose)
    _t0 = _time.time()
    qvars, act_scales, qapply, w_scales = ptq_mod.ptq_calibrate(
        model, variables, calib_batches, cfg, return_w_scales=True
    )
    if verbose:
        print(f"[adaround] ptq_calibrate {_time.time() - _t0:.1f}s",
              flush=True)
    _t0 = _time.time()
    if rcfg.sequential:
        store = capture_fp_outputs(model, variables, calib_batches, cfg)
        run_cap, static_extras = make_sequential_capturer(model, cfg)
    else:
        store = capture_units(model, variables, qvars, act_scales,
                              calib_batches, cfg)
    if verbose:
        print(f"[adaround] fp-output capture {_time.time() - _t0:.1f}s "
              f"({len(store)} units)", flush=True)

    # locate detection-head 1x1 convs for the prediction-level terms: the
    # subtree holding cls_head/reg_head/dir_head params (PyramidCollabModel
    # and friends name them uniformly)
    head_params = None
    if rcfg.pred_terms:
        def find_heads(tree, prefix=()):
            if not isinstance(tree, dict):
                return None
            if "cls_head" in tree and isinstance(tree["cls_head"], dict) \
                    and "kernel" in tree["cls_head"]:
                return {
                    n: (tree[n]["kernel"], tree[n].get("bias"))
                    for n in ("cls_head", "reg_head", "dir_head")
                    if n in tree
                }
            for k, v in tree.items():
                got = find_heads(v, prefix + (k,))
                if got is not None:
                    return got
            return None

        head_params = find_heads(variables["params"])

    qparams = qvars["params"]
    for path_s, ent in store.items():
        if ent["module"] is None or not ent["outputs"]:
            continue
        rel = path_s.split("/")
        fp_sub = _subtree(variables["params"], rel)
        try:
            bs_sub = _subtree(variables.get("batch_stats", {}), rel)
        except (KeyError, TypeError):
            bs_sub = {}
        w_local = {
            p[len(path_s) + 1:]: s for p, s in w_scales.items()
            if p.startswith(path_s + "/")
        }
        if not w_local:
            continue
        if resume_dir:
            os.makedirs(resume_dir, exist_ok=True)
            got = _load_unit_result(resume_dir, path_s, fp_sub)
            if got is not None:
                q_sub, new_act = got
                qparams = _set_subtree(qparams, rel, q_sub)
                if new_act is not None:
                    act_scales[path_s] = new_act
                if verbose:
                    print(f"[adaround] {path_s}: resumed from "
                          f"{_resume_path(resume_dir, path_s)}", flush=True)
                continue
        if resume_dir and jax.default_backend() != "cpu" \
                and _skip_count(resume_dir, path_s) >= 2:
            # this unit's program repeatedly kernel-faulted the backend
            # (r4+r5: the flagship PFN unit deterministically crashes the
            # tunneled worker); keep its plain-PTQ nearest rounding
            if verbose:
                print(f"[adaround] {path_s}: SKIPPED (backend-faulted "
                      f"{_skip_count(resume_dir, path_s)}x; keeps nearest "
                      f"rounding)", flush=True)
            continue
        _t0 = _time.time()
        try:
            if rcfg.sequential:
                # input from the partially-reconstructed model:
                # predecessors already carry their hard-rounded weights +
                # refined act steps
                inputs, extra_args = capture_unit_inputs(
                    run_cap, static_extras, dict(qvars, params=qparams),
                    act_scales, calib_batches, path_s)
            else:
                inputs, extra_args = ent["inputs"], ent["extra_args"] or []
            _t_cap = _time.time() - _t0
            if not inputs:
                continue
            act = act_scales.get(path_s)
            unit_heads = None
            if head_params is not None and any(
                    path_s.endswith(s) for s in rcfg.pred_unit_suffixes):
                unit_heads = head_params
            if verbose:
                print(f"[adaround] {path_s}: optimizing "
                      f"({len(inputs)} calib inputs, "
                      f"{inputs[0].shape if hasattr(inputs[0], 'shape') else '?'})",
                      flush=True)
            q_sub, new_act, recon, hit = reconstruct_unit(
                ent["module"], fp_sub, bs_sub, w_local, act,
                inputs, ent["outputs"], extra_args,
                cfg.weight_spec, cfg.act_spec, rcfg, jax.random.PRNGKey(0),
                head_params=unit_heads,
            )
        except Exception as e:  # noqa: BLE001 — backend faults are not
            # a typed exception family; anything raised mid-unit leaves
            # that unit at nearest rounding rather than killing the
            # (hours-long) run
            if resume_dir:
                n = _mark_skip(resume_dir, path_s)
            else:
                n = 1
            print(f"[adaround] {path_s}: FAULTED ({type(e).__name__}: "
                  f"{str(e)[:200]}); attempt {n}, keeping nearest "
                  f"rounding this run", flush=True)
            if not _wait_backend_recovery():
                raise RuntimeError(
                    f"backend did not recover after fault at {path_s}; "
                    f"re-run the same command to resume") from e
            continue
        qparams = _set_subtree(qparams, rel, q_sub)
        if new_act is not None:
            act_scales[path_s] = new_act
        if resume_dir:
            _save_unit_result(resume_dir, path_s, q_sub, new_act)
        if verbose:
            print(f"[adaround] {path_s}: recon={recon:.6f} "
                  f"(capture {_t_cap:.1f}s, optimize "
                  f"{_time.time() - _t0 - _t_cap:.1f}s"
                  f"{', prog-cache hit' if hit else ', compiled'})",
                  flush=True)

    qvariables = dict(qvars, params=qparams)
    return qvariables, act_scales, ptq_mod.make_quantized_apply(model, cfg)
