"""BF16 fused inference engine: run BasicBlocks through the Pallas kernel.

The deployment counterpart of int8_engine for the speed path. The tunneled
chip (and BEV conv nets generally) is HBM-bandwidth-bound (BASELINE.md
device calibration): XLA materializes every conv activation in HBM, so a
ResNet BasicBlock costs three full feature-map round trips. The Pallas
fused kernel (ops/fused_block.py) runs conv1+relu+conv2+residual+relu on a
VMEM-resident tile — one read, one write.

Engine build = a pure parameter transform, same pattern as
int8_engine.build_engine_tables:

  1. walk the variables tree for BasicBlock subtrees (children conv1/conv2,
     no downsample — i.e. stride 1 and Cin == Cout, exactly the kernel's
     residual contract);
  2. fold each ConvBNReLU's BatchNorm into (w, b) in ONE jit;
  3. at inference an interceptor replaces those BasicBlock.__call__s with
     fused_basic_block; everything else (strided blocks, deconvs, heads)
     stays on the stock XLA path.

Reference analogue: TensorRT's vertical layer fusion applied to the
exported engine (tools/build_trt.py) — here it is a runtime transform, no
export step.
"""

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from quantv2x_tpu.models.layers import BasicBlock, Bottleneck
from quantv2x_tpu.quant import ptq as ptq_mod
from quantv2x_tpu.quant.int8_engine import fold_conv_bn


def grouped_to_blockdiag(kernel, groups: int):
    """(kh, kw, cpg, out) grouped-conv kernel -> (kh, kw, cpg*groups, out)
    block-diagonal dense kernel (bit-equal conv, full MXU tiles; same
    construction as models/layers.ConvBNReLU's grouped path)."""
    kh, kw, cpg, out = kernel.shape
    cin = cpg * groups
    opg = out // groups
    o_idx = jnp.arange(out)
    row_idx = (o_idx // opg)[None, :] * cpg + jnp.arange(cpg)[:, None]
    return jnp.zeros((kh, kw, cin, out), kernel.dtype).at[
        :, :, row_idx,
        jnp.broadcast_to(o_idx[None, :], row_idx.shape)].set(kernel)


def grouped_to_superblocks(kernel, groups: int):
    """(kh, kw, cpg, out) square grouped-conv kernel -> (kh, kw, S, 128,
    128) supergroup diagonal blocks: groups packed 128-lanes-at-a-time.

    The dense-ification of a 32-group conv wastes out/128 x the FLOPs on
    structurally-zero off-diagonal blocks; keeping only the S = out/128
    diagonal 128x128 blocks gives full MXU tiles AND minimal FLOPs —
    bit-identical to the grouped conv. Requires cin == out, out % 128 == 0
    and 128 % cpg == 0 (group boundaries then align to lane tiles)."""
    kh, kw, cpg, out = kernel.shape
    assert cpg * groups == out and out % 128 == 0 and 128 % cpg == 0
    S = out // 128
    dense = grouped_to_blockdiag(kernel, groups)
    blocks = dense.reshape(kh, kw, S, 128, S, 128)
    idx = jnp.arange(S)
    diag = blocks[:, :, idx, :, idx, :]      # (S, kh, kw, 128, 128)
    return jnp.transpose(diag, (1, 2, 0, 3, 4))


def build_fused_tables(variables, dtype=jnp.bfloat16, min_channels: int = 0,
                       pack_grouped: bool = True):
    """{block_path: (w1, b1, w2, b2)} for every fusable BasicBlock.

    Fusable = stride-1, no downsample branch (the BasicBlock module only
    creates `downsample` params when stride != 1 or Cin != planes, so its
    absence certifies the kernel's residual contract).

    ``min_channels``: skip blocks whose channel count is below this.
    Mosaic's manual-DMA slices force lane padding to 128 channels, so C=64
    blocks pay 2x bytes in the kernel — on a bandwidth-bound device fusing
    only C>=128 blocks is the measured-faster configuration.

    ``pack_grouped=False`` keeps bottleneck w2 in the original grouped
    (kh, kw, cpg, out) layout instead of the kernel's supergroup/blockdiag
    packing — the differentiable form the engine's AdaRound refinement
    optimizes (packing is a pure layout transform, so integer codes
    produced in grouped form pack bit-identically).
    """
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    specs: Dict[str, dict] = {}

    def walk(ptree, btree, prefix):
        if not isinstance(ptree, dict):
            return
        is_block = (
            "conv1" in ptree and "conv2" in ptree
            and isinstance(ptree["conv1"], dict)
            and "conv" in ptree.get("conv1", {})
            and "bn" in ptree.get("conv1", {})
            and "downsample" not in ptree
        )
        if is_block and "conv3" not in ptree:
            k1 = ptree["conv1"]["conv"]["kernel"]
            k2 = ptree["conv2"]["conv"]["kernel"]
            # 3x3 square-channel blocks only (kernel contract)
            if (k1.shape[:2] == (3, 3) and k2.shape[:2] == (3, 3)
                    and k1.shape[2] == k2.shape[3]
                    and k1.shape[2] >= min_channels):
                specs[ptq_mod._path_str(prefix)] = {
                    "kind": "basic",
                    "c1": ptree["conv1"], "c2": ptree["conv2"],
                    "s1": (btree or {}).get("conv1", {}).get("bn"),
                    "s2": (btree or {}).get("conv2", {}).get("bn"),
                }
            return
        if is_block and "conv3" in ptree:
            # ResNeXt bottleneck: 1x1 -> grouped 3x3 -> 1x1 + residual
            k1 = ptree["conv1"]["conv"]["kernel"]
            k2 = ptree["conv2"].get("conv_kernel_grouped")
            if k2 is None:
                k2 = ptree["conv2"].get("conv", {}).get("kernel")
            k3 = ptree["conv3"]["conv"]["kernel"]
            if (k1.shape[:2] == (1, 1) and k2 is not None
                    and k2.shape[:2] == (3, 3) and k3.shape[:2] == (1, 1)
                    and k1.shape[2] == k3.shape[3]
                    and k1.shape[2] >= min_channels):
                specs[ptq_mod._path_str(prefix)] = {
                    "kind": "bottleneck",
                    "c1": ptree["conv1"], "c2": ptree["conv2"],
                    "c3": ptree["conv3"], "k2_grouped": k2,
                    "s1": (btree or {}).get("conv1", {}).get("bn"),
                    "s2": (btree or {}).get("conv2", {}).get("bn"),
                    "s3": (btree or {}).get("conv3", {}).get("bn"),
                }
            return
        for k, v in ptree.items():
            walk(v, (btree or {}).get(k, {}) if isinstance(btree, dict)
                 else {}, prefix + (k,))

    walk(params, batch_stats, ())

    kinds = {p: s.pop("kind") for p, s in specs.items()}

    def fold_all(specs):
        out = {}
        for path_s, s in specs.items():
            s = dict(s, kind=kinds[path_s])
            w1, b1 = fold_conv_bn(
                s["c1"]["conv"]["kernel"], s["c1"]["conv"].get("bias"),
                s["c1"]["bn"]["scale"], s["c1"]["bn"]["bias"],
                s["s1"]["mean"], s["s1"]["var"])
            if s["kind"] == "basic":
                w2, b2 = fold_conv_bn(
                    s["c2"]["conv"]["kernel"], s["c2"]["conv"].get("bias"),
                    s["c2"]["bn"]["scale"], s["c2"]["bn"]["bias"],
                    s["s2"]["mean"], s["s2"]["var"])
                out[path_s] = (w1.astype(dtype), b1.astype(jnp.float32),
                               w2.astype(dtype), b2.astype(jnp.float32))
            else:
                # grouped kernel folds like any conv (out channels last),
                # then materializes to block-diagonal dense for the MXU
                k2 = s["k2_grouped"]
                w2g, b2 = fold_conv_bn(
                    k2, None,
                    s["c2"]["bn"]["scale"], s["c2"]["bn"]["bias"],
                    s["s2"]["mean"], s["s2"]["var"])
                cpg, out_ch = w2g.shape[2], w2g.shape[3]
                groups = out_ch // cpg
                if not pack_grouped:
                    w2 = w2g
                elif (groups > 1 and out_ch % 128 == 0
                        and 128 % cpg == 0):
                    w2 = grouped_to_superblocks(w2g, groups)
                elif groups > 1:
                    w2 = grouped_to_blockdiag(w2g, groups)
                else:
                    w2 = w2g
                w3, b3 = fold_conv_bn(
                    s["c3"]["conv"]["kernel"], s["c3"]["conv"].get("bias"),
                    s["c3"]["bn"]["scale"], s["c3"]["bn"]["bias"],
                    s["s3"]["mean"], s["s3"]["var"])
                out[path_s] = (w1[0, 0].astype(dtype),
                               b1.astype(jnp.float32),
                               w2.astype(dtype), b2.astype(jnp.float32),
                               w3[0, 0].astype(dtype),
                               b3.astype(jnp.float32))
        return out

    folded = jax.jit(fold_all)(specs)
    return {p: (kinds[p],) + tuple(t) for p, t in folded.items()}


def make_fused_apply(model, tables, h_tile: int = 16,
                     interpret: bool = False):
    """fused_apply(variables, batch, ...) with BasicBlocks on the Pallas
    kernel. Tables are closed over; variables still feed the unfused rest."""

    from quantv2x_tpu.models.layers import ResNetModified
    from quantv2x_tpu.ops import fused_block as fb

    def _table_matches(t, x):
        if t is None:
            return False
        cin = t[1].shape[2] if t[0] == "basic" else t[1].shape[0]
        return x.shape[-1] == cin

    def _run_stack(x, run):
        """Run a list of same-kind block tables as multi-block kernels
        (splitting on the VMEM budget). One pad + one slice per kernel
        call instead of per block, and one kernel dispatch per run —
        dispatch overhead is significant on the tunneled backend."""
        kind = run[0][0]
        radius = 2 if kind == "basic" else 1
        while run:
            N, H, W, C = x.shape
            # (K, th) policy, measured on-chip (scripts/drive_tile_tune):
            # cap chunks at 4 blocks, tile ~2x the halo — deep chunks at
            # tiny tiles pay quadratic halo recompute ((7,)@th4 1.17 ms
            # vs (4,3)@th8 0.71 ms on the stage2 shapes).
            K = min(len(run), 4)
            th = 0
            while K >= 1:
                widths = [
                    (t[1].shape[3] if kind == "basic" else t[1].shape[1])
                    for t in run[:K]
                ]
                # actual w2 form per block: supergrouped (ndim 5) is
                # 9*w*128 VMEM; block-diagonal pads to 9*Wd*Wd
                w2_super = [t[3].ndim == 5 for t in run[:K]]
                halo = K * radius
                Wt = -(-(W + 2 * halo) // 8) * 8
                Cp = (-(-C // 128) * 128) if not interpret else C
                th = min(h_tile, max(8, 2 * halo), max(4, H))
                while th > 4 and fb._stack_vmem_bytes(
                        th, Wt, Cp, widths, radius,
                        w2_super=w2_super) > fb._VMEM_BUDGET:
                    th //= 2
                if fb._stack_vmem_bytes(th, Wt, Cp, widths, radius,
                                        w2_super=w2_super) <= fb._VMEM_BUDGET:
                    break
                K -= 1
            K = max(K, 1)
            halo = K * radius
            Wt = -(-(W + 2 * halo) // 8) * 8
            Cp = (-(-C // 128) * 128) if not interpret else C
            ngrid = -(-H // th)
            R = ngrid * th + 2 * halo
            dt = run[0][1].dtype
            xp = fb.to_chain_layout(x.astype(dt), (th, R, Wt, Cp), halo)
            yp = fb.fused_stack_chained(
                xp, tuple(tuple(t[1:]) for t in run[:K]), (H, W, C),
                radius, h_tile=th, interpret=interpret)
            x = fb.from_chain_layout(yp, (H, W, C), halo).astype(x.dtype)
            run = run[K:]
        return x

    def _run_resnet_stages(module, x):
        """Stage-level orchestration of a ResNetModified: consecutive
        fusable blocks run as one multi-block kernel; strided/downsample
        blocks fall through to the stock module call."""
        outs = []
        for stage in module.stages:
            pending = []
            for blk in stage:
                t = tables.get(ptq_mod._path_str(blk.path))
                if _table_matches(t, x):
                    pending.append(t)
                else:
                    if pending:
                        x = _run_stack(x, pending)
                        pending = []
                    x = blk(x, False)
            if pending:
                x = _run_stack(x, pending)
            outs.append(x)
        return tuple(outs)

    def make_interceptor(pad_cache):
        """Blocks hand their chain-layout (padded) output to the next
        fused block via ``pad_cache`` (id(returned tracer) -> padded
        buffer). When block k+1 finds its input in the cache, it consumes
        the padded buffer directly and XLA dead-code-eliminates block k's
        slice and block k+1's pad — on a BW-bound device those per-block
        HBM copies cost more than the convolutions at C=64 (lane padding
        doubles the bytes). Entries hold a strong ref to the returned
        tracer so ids stay unique for the duration of one trace."""

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
            if not (
                context.method_name == "__call__"
                and isinstance(module, (BasicBlock, Bottleneck))
                and isinstance(args[0], jax.Array)
            ):
                return next_fn(*args, **kwargs)
            path_s = ptq_mod._path_str(module.path)
            t = tables.get(path_s)
            x = args[0]
            cin = (t[1].shape[2] if t is not None and t[0] == "basic"
                   else t[1].shape[0] if t is not None else None)
            if t is None or x.shape[-1] != cin:
                return next_fn(*args, **kwargs)
            kind, *ws = t
            x4 = x[None] if x.ndim == 3 else x
            shp = x4.shape
            if x4.ndim > 4:
                x4 = x4.reshape((-1,) + shp[-3:])
            if kind == "basic":
                w1, b1, w2, b2 = ws
                halo, cmid = 2, w1.shape[3]
            else:
                w1, b1, w2, b2, w3, b3 = ws
                halo, cmid = 1, w1.shape[1]
            N, H, W, C = x4.shape
            geom = fb.chain_geometry(H, W, C, cmid, min(h_tile, H),
                                     halo, interpret)
            ent = pad_cache.get(id(x4))
            if ent is not None and ent[1] == (geom, halo, w1.dtype):
                xp = ent[0]
            else:
                xp = fb.to_chain_layout(x4.astype(w1.dtype), geom, halo)
            if kind == "basic":
                yp = fb.fused_basic_block_chained(
                    xp, w1, b1, w2, b2, (H, W, C), h_tile=geom[0],
                    interpret=interpret)
            else:
                yp = fb.fused_bottleneck_chained(
                    xp, w1, b1, w2, b2, w3, b3, (H, W, C),
                    h_tile=geom[0], interpret=interpret)
            y = fb.from_chain_layout(yp, (H, W, C), halo).astype(x.dtype)
            if x.ndim == 3:
                return y[0]
            if len(shp) > 4:
                return y.reshape(shp[:-3] + y.shape[-3:])
            pad_cache[id(y)] = (yp, (geom, halo, w1.dtype), y)
            return y

        return interceptor

    def fused_apply(variables, *args, train: bool = False, method=None,
                    **kwargs):
        if train:
            raise ValueError("fused engine is inference-only: BN is folded "
                             "into the kernels, so train=True cannot update "
                             "batch stats")
        with nn.intercept_methods(make_interceptor({})):
            if method is None:
                return model.apply(variables, *args, train=False, **kwargs)
            return model.apply(variables, *args, train=False,
                               method=method, **kwargs)

    return fused_apply


def build_fused_engine(model, variables, h_tile: int = 16,
                       interpret: bool = False, dtype=jnp.bfloat16,
                       min_channels: int = 0):
    """One call: fold BN -> (tables, fused_apply)."""
    tables = build_fused_tables(variables, dtype=dtype,
                                min_channels=min_channels)
    return tables, make_fused_apply(model, tables, h_tile=h_tile,
                                    interpret=interpret)
