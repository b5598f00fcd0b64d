"""Real-INT8 execution kernels (Pallas TPU + XLA int8 paths).

This is the TPU replacement for the reference's TensorRT INT8 engine
(tools/build_trt_int8.py) — the reference only fake-quants in torch and
delegates real int8 to TRT; here the quantized inference path executes on
real int8 data:

  - ``int8_matmul_requant``: Pallas kernel — int8 x int8 -> int32 on the
    MXU, fused per-channel dequant + bias + optional ReLU + requant to the
    next layer's int8 grid, all in VMEM (one HBM round-trip total);
  - ``int8_conv``: XLA conv with int8 inputs and int32 accumulation plus
    the same fused requant epilogue (XLA fuses the elementwise tail);
  - zero-point handling: activations are asymmetric (uint8 codes, stored as
    int8 after -128 shift is NOT used — we keep the affine math explicit
    with an int32 zero-point correction term, precomputed per output
    channel from the weights).

Quantization convention (matches quant/quantizer.py):
  x_f = (x_q - zp_x) * dx ;  w_f = w_q * dw  (weights symmetric per-channel)
  y_f = sum x_f w_f = dx*dw * (sum x_q w_q - zp_x * sum w_q)
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _requant_epilogue(acc_i32, x_zp, w_colsum, scale, bias, relu,
                      out_delta, out_zp, out_bits):
    """Shared epilogue: zero-point correction, dequant, bias, relu, requant."""
    acc = acc_i32 - x_zp * w_colsum[None, :]
    y = acc.astype(jnp.float32) * scale[None, :]
    if bias is not None:
        y = y + bias[None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_delta is None:
        return y
    n_levels = 2 ** out_bits
    yq = jnp.round(y / out_delta) + out_zp
    return jnp.clip(yq, 0, n_levels - 1).astype(jnp.float32)


def int8_matmul_requant_kernel(x_ref, w_ref, colsum_ref, scale_ref, bias_ref,
                               meta_ref, out_ref, acc_ref):
    """Pallas kernel: one (TM, TN) tile of Y = requant(X_q @ W_q).

    Grid: (M/TM, N/TN, K/TK); K-loop accumulates into acc_ref (VMEM fp32
    would lose exactness — int32 accumulate).
    meta_ref (SMEM): [x_zp, out_delta, out_zp, relu_flag, quantize_flag]
    """
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == nk - 1)
    def _():
        x_zp = meta_ref[0]
        out_delta = meta_ref[1]
        out_zp = meta_ref[2]
        relu = meta_ref[3]
        do_quant = meta_ref[4]
        acc = acc_ref[:] - jnp.round(x_zp).astype(jnp.int32) * colsum_ref[:][None, :]
        y = acc.astype(jnp.float32) * scale_ref[:][None, :]
        y = y + bias_ref[:][None, :]
        y = jnp.where(relu > 0, jnp.maximum(y, 0.0), y)
        qmax = meta_ref[5]          # 2**out_bits - 1
        yq = jnp.clip(jnp.round(y / out_delta) + out_zp, 0, qmax)
        out_ref[:] = jnp.where(do_quant > 0, yq, y)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "out_bits", "interpret", "tm", "tn", "tk"),
)
def int8_matmul_requant(x_q, w_q, x_zp, scale, bias=None, relu=False,
                        out_delta=None, out_zp=None, out_bits=8,
                        interpret=False, tm=256, tn=256, tk=256):
    """Y = requant((x_q - x_zp) @ (w_q * dw)) as one fused Pallas call.

    x_q: (M, K) uint8/int32 codes; w_q: (K, N) int8 codes;
    scale: (N,) = dx * dw per output channel; bias: (N,) float or None;
    out_delta/out_zp: next activation grid (None -> float output).
    Returns (M, N) float32 (codes if out_delta given, else dequant values).
    """
    M, K = x_q.shape
    _, N = w_q.shape
    Mp, Kp, Np = _round_up(M, tm), _round_up(K, tk), _round_up(N, tn)
    x_p = jnp.zeros((Mp, Kp), jnp.int8).at[:M, :K].set(
        (x_q.astype(jnp.int32) - 128).astype(jnp.int8)
    )
    # shift x by -128 so codes fit int8; fold the shift into the zero point
    eff_zp = jnp.float32(x_zp) - 128.0
    w_p = jnp.zeros((Kp, Np), jnp.int8).at[:K, :N].set(w_q.astype(jnp.int8))
    colsum = jnp.zeros((Np,), jnp.int32).at[:N].set(
        w_q.astype(jnp.int32).sum(axis=0)
    )
    scale_p = jnp.zeros((Np,), jnp.float32).at[:N].set(scale)
    bias_p = jnp.zeros((Np,), jnp.float32)
    if bias is not None:
        bias_p = bias_p.at[:N].set(bias)
    meta = jnp.array(
        [
            eff_zp,
            1.0 if out_delta is None else out_delta,
            0.0 if out_zp is None else out_zp,
            1.0 if relu else 0.0,
            0.0 if out_delta is None else 1.0,
            float(2 ** out_bits - 1),
        ],
        jnp.float32,
    )

    grid = (Mp // tm, Np // tn, Kp // tk)
    out = pl.pallas_call(
        int8_matmul_requant_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn,), lambda i, j, k: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn,), lambda i, j, k: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn,), lambda i, j, k: (j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        interpret=interpret,
    )(x_p, w_p, colsum, scale_p, bias_p, meta)
    return out[:M, :N]


def int8_matmul_reference(x_q, w_q, x_zp, scale, bias=None, relu=False,
                          out_delta=None, out_zp=None, out_bits=8):
    """Plain-XLA twin of the Pallas kernel (oracle for tests; also a usable
    fallback path — XLA lowers int8 dots onto the MXU natively)."""
    acc = x_q.astype(jnp.int32) @ w_q.astype(jnp.int32)
    colsum = w_q.astype(jnp.int32).sum(axis=0)
    return _requant_epilogue(
        acc, jnp.round(jnp.float32(x_zp)).astype(jnp.int32), colsum,
        jnp.asarray(scale, jnp.float32),
        None if bias is None else jnp.asarray(bias, jnp.float32),
        relu, out_delta, out_zp, out_bits,
    )


def int8_conv_requant(x_q, w_q, x_zp, scale, bias=None, relu=False,
                      out_delta=None, out_zp=None, strides=(1, 1),
                      out_bits=8, groups=1):
    """INT8 NHWC conv with int32 accumulation + fused requant epilogue.

    x_q: (N, H, W, Cin) uint8 codes; w_q: (kh, kw, Cin, Cout) int8.
    XLA emits the int8 conv on the MXU; the epilogue fuses elementwise.
    The zero-point correction for SAME padding is exact because padded
    zeros are *code* zeros only after shifting — so we shift x to signed
    int8 (x - 128) and correct with an ones-mask conv of the kernel sum.
    """
    kh, kw, ci, co = w_q.shape
    # pad with the ZERO-POINT code (float 0 == code zp): every out-of-image
    # tap then contributes exactly zp*w, so the zero-point correction is the
    # per-channel constant eff_zp * sum(w) — no second conv needed, and the
    # result is exact for SAME padding, strides, and grouped convs alike
    zp_code = jnp.round(jnp.float32(x_zp)).astype(jnp.int32)
    xs = (x_q.astype(jnp.int32) - 128).astype(jnp.int8)

    def same_pad(in_size, k, s):
        out = -(-in_size // s)
        total = max((out - 1) * s + k - in_size, 0)
        return total // 2, total - total // 2

    ph = same_pad(xs.shape[1], kh, strides[0])
    pw = same_pad(xs.shape[2], kw, strides[1])
    pad_val = (zp_code - 128).astype(jnp.int8)
    xs = jnp.pad(
        xs, ((0, 0), ph, pw, (0, 0)), constant_values=pad_val,
    )
    dn = jax.lax.conv_dimension_numbers(
        xs.shape, w_q.shape, ("NHWC", "HWIO", "NHWC")
    )
    acc = jax.lax.conv_general_dilated(
        xs, w_q.astype(jnp.int8), strides, "VALID",
        dimension_numbers=dn, preferred_element_type=jnp.int32,
        feature_group_count=groups,
    )
    eff_zp = jnp.float32(x_zp) - 128.0
    ksum = w_q.astype(jnp.float32).sum(axis=(0, 1, 2))          # (co,)
    y = (acc.astype(jnp.float32) - eff_zp * ksum[None, None, None, :]) * \
        jnp.asarray(scale, jnp.float32)
    if bias is not None:
        y = y + jnp.asarray(bias, jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_delta is None:
        return y
    n_levels = 2 ** out_bits
    yq = jnp.round(y / out_delta) + out_zp
    return jnp.clip(yq, 0, n_levels - 1)
