"""INT8 Pallas fused residual blocks: whole BasicBlock / Bottleneck runs on
int8 data in VMEM — the "TensorRT int8 engine" that actually beats bf16.

Why (VERDICT r1 item 1): the device is HBM-bandwidth-bound and the round-1
real-int8 path lost to bf16 because XLA materialized a quantize + requant
HBM round trip per unit. Here the whole residual-block chain lives on int8:

  - the chain buffer in HBM holds int8 ACTIVATION CODES (1 byte — half the
    bf16 engine's DMA traffic, a quarter of f32);
  - convs run as int8 x int8 -> int32 MXU dots (2x the bf16 MXU rate);
  - the requant epilogue (per-channel scale, folded bias + zero-point
    correction, ReLU, round/clip to the next activation grid) runs on the
    VPU against VMEM-resident tiles — no quantize/requant ever touches HBM.

Quantization convention (matches quant/quantizer.py / int8_engine):
  activations per-tensor asymmetric uint8 codes q in [0, 255],
  f = (q - zp) * d.  Codes are STORED shifted to int8, s = q - 128, so
  with ezp = zp - 128:  f = (s - ezp) * d  and the chain padding value is
  the code for f = 0, i.e. s_pad = ezp.
  Weights per-output-channel symmetric int8:  w_f = w_q * dw.
  One conv:  y_f[c] = (acc[c] - ezp_in * ksum[c]) * (d_in * dw[c]) + b[c]
  with acc the int32 MXU sum and ksum[c] = sum of w_q over taps+cin; the
  correction term is constant per channel and is FOLDED INTO THE BIAS at
  engine-build time (quant/int8_fused_engine.py), so the kernel epilogue is
  just  y = acc * scale + bias'.

Layout mirrors ops/fused_block.py's chain layout (image at (halo, halo) of
an (N, R, Wt, Cp) buffer; halo = K * radius for a K-block stack) with two
int8-specific changes: Wt is 32-aligned (int8 sublane tile is (32, 128))
and the padded region holds each tensor's ezp code instead of zeros.
Mosaic cannot rotate 8-bit data, so the dx stencil shifts round-trip
through int32 — hoisted to 2 rolls per conv (the +-1 column variants are
pre-computed once, then row-sliced per dy), not one per tap.

Reference parity target: tools/build_trt_int8.py:46-405 (the int8 engine
the reference outsources to TensorRT).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# empirically calibrated against Mosaic's actual allocator: the estimator
# below overcounts transients ~1.7x (Mosaic reuses buffers), so the budget
# is set where measured compiles still fit (stage2 K=7 th=16 = 21MB est)
_VMEM_BUDGET = 22 * 1024 * 1024


def _requant(y_f32, inv_d, ezp):
    """f32 -> stored int8 codes on grid (d, zp): s = clip(round(y/d)+ezp)."""
    s = jnp.round(y_f32 * inv_d) + ezp
    return jnp.clip(s, -128.0, 127.0).astype(jnp.int8)


def int8_chain_geometry(H, W, C, cmid, h_tile, halo, interpret):
    """(h_tile, R, Wt, Cp) for the int8 chain buffer (Wt 32-aligned)."""
    Wt = -(-(W + 2 * halo) // 32) * 32
    Cp = -(-C // 128) * 128 if not interpret else C
    Cm = -(-cmid // 128) * 128 if not interpret else cmid
    per_row = Wt * (Cp * 1            # xs int8
                    + Cm * (4 + 1) * 3  # acc i32/f32 + codes + roll copies
                    + Cp * 4 + Cp * 1)  # y f32 + out int8
    h_tile = _fit_h_tile(h_tile, per_row, (9 * Cm * Cm + 2 * Cp * Cm))
    ngrid = -(-H // h_tile)
    R = ngrid * h_tile + 2 * halo
    return h_tile, R, Wt, Cp


def _fit_h_tile(h_tile, per_row_bytes, fixed_bytes):
    while h_tile > 4 and fixed_bytes + (h_tile + 4) * per_row_bytes > \
            _VMEM_BUDGET:
        h_tile //= 2
    return h_tile


def to_int8_chain_layout(s, geom, halo, ezp):
    """(N, H, W, C) stored-int8 codes -> (N, R, Wt, Cp) chain buffer with
    the image at (halo, halo) and the ezp code everywhere else."""
    N, H, W, C = s.shape
    _, R, Wt, Cp = geom
    return jnp.pad(
        s, ((0, 0), (halo, R - H - halo), (halo, Wt - W - halo),
            (0, Cp - C)),
        constant_values=jnp.int8(ezp))


def from_int8_chain_layout(sp, hwc, halo):
    H, W, C = hwc
    return sp[:, halo:halo + H, halo:halo + W, :C]


# ---------------------------------------------------------------------------
# Multi-block int8 stack kernel
# ---------------------------------------------------------------------------
#
# Per-block refs (VMEM unless noted):
#   basic  (radius 2): w1 (3,3,Cp,Cm) i8, sb1 (2,Cm) f32 [scale;bias'],
#                      w2 (3,3,Cm,Cp) i8, sb2 (2,Cp) f32
#   bottleneck (r 1):  w1 (Cp,Wd) i8, sb1 (2,Wd), w2 (3,3,Wd,Wd) i8 dense
#                      block-diagonal OR (3,3,S,128,128) supergrouped,
#                      sb2 (2,Wd), w3 (Wd,Cp) i8, sb3 (2,Cp)
# meta_ref (SMEM f32, (K, 8)) per block:
#   [d_in, ezp_in, inv_d_h1, ezp_h1, inv_d_h2, ezp_h2, inv_d_out, ezp_out]
#   (basic blocks ignore the h2 pair).
# The LAST block's out grid is the stack output grid; for every other
# block j, (inv_d_out, ezp_out)_j must equal block j+1's input grid.


def _roll32(v, dx, w_t, interpret):
    """result[p] = v[p + dx] along sublane axis for 32-bit data (native)."""
    if dx == 0:
        return v
    if interpret:
        return jnp.roll(v, -dx, axis=1)
    return pltpu.roll(v, (w_t - dx) % w_t, axis=1)


def _conv3x3_i8(h, wref, rows_out, w_t, interpret, supergrouped):
    """3x3 int8 conv over the haloed int8 tile ``h`` (rows_out+2, Wt, C):
    returns int32 acc (rows_out, Wt, Cout).

    MXU-friendly decomposition: the three dy taps are STACKED along the
    contraction dim (one K=3C dot per dx — weights load into the MXU
    once instead of 9 times), and the dx shifts move to the int32
    accumulators via native 32-bit sublane rolls (int8 data itself
    cannot be rotated by Mosaic). acc[r,p] = sum_dx z_dx[r, p+dx] where
    z_dx = [h[r];h[r+1];h[r+2]] @ w[:,dx,:,:].

    wref: (3, 3C, Cout) dense indexed [dx], or (3, S, 3*128, 128)
    supergrouped indexed [dx, s] (out channel = s*128 + lane)."""
    if supergrouped:
        S = wref.shape[1]
        cols = []
        for s_i in range(S):
            sub = jnp.concatenate(
                [h[dy:dy + rows_out, :, s_i * 128:(s_i + 1) * 128]
                 for dy in range(3)], axis=-1)
            acc_s = jnp.zeros((rows_out, w_t, 128), jnp.int32)
            for dx in (-1, 0, 1):
                z = jax.lax.dot_general(
                    sub, wref[dx + 1, s_i],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc_s = acc_s + _roll32(z, dx, w_t, interpret)
            cols.append(acc_s)
        return jnp.concatenate(cols, axis=-1)
    stacked = jnp.concatenate([h[dy:dy + rows_out] for dy in range(3)],
                              axis=-1)
    acc = jnp.zeros((rows_out, w_t, wref.shape[-1]), jnp.int32)
    for dx in (-1, 0, 1):
        z = jax.lax.dot_general(
            stacked, wref[dx + 1],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = acc + _roll32(z, dx, w_t, interpret)
    return acc


def _int8_stack_kernel(x_hbm, *refs, th, w_t, w_img, h_img, K, radius,
                       widths, r_rows, interpret):
    """K chained int8 residual blocks on one (th + 2*halo)-row tile."""
    per = 4 if radius == 2 else 6
    wrefs = refs[:K * per]
    meta_ref = refs[K * per]
    out_hbm, xs, ys, zs, sem_in, sem_out, sem_z = refs[K * per + 1:]
    n = pl.program_id(0)
    i = pl.program_id(1)
    ngrid = pl.num_programs(1)
    halo = K * radius

    dma_in = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(i * th, th + 2 * halo)], xs, sem_in)
    dma_in.start()
    dma_in.wait()

    cur = xs[:]
    off = 0
    for j in range(K):
        rows_in = th + 2 * halo - 2 * radius * j
        rows_out = rows_in - 2 * radius
        d_in = meta_ref[j, 0]
        ezp_in = meta_ref[j, 1]
        inv_d1 = meta_ref[j, 2]
        ezp1 = meta_ref[j, 3]
        inv_d2 = meta_ref[j, 4]
        ezp2 = meta_ref[j, 5]
        inv_do = meta_ref[j, 6]
        ezp_o = meta_ref[j, 7]
        if radius == 1:
            w1r, sb1, w2r, sb2, w3r, sb3 = wrefs[j * per:(j + 1) * per]
            # conv1 (1x1): full haloed rows feed the 3x3
            acc1 = jax.lax.dot_general(
                cur, w1r[:],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y1 = acc1.astype(jnp.float32) * sb1[0][None, None, :] \
                + sb1[1][None, None, :]
            y1 = jnp.maximum(y1, 0.0)
            h1 = _requant(y1, inv_d1, ezp1)
            # intermediate exists only INSIDE the image: pad/wraparound
            # positions must read as f=0, i.e. the ezp code
            row = (i * th - halo + off
                   + jax.lax.broadcasted_iota(jnp.int32,
                                              (rows_in, w_t, 1), 0))
            col = (jax.lax.broadcasted_iota(jnp.int32,
                                            (rows_in, w_t, 1), 1) - halo)
            inside = ((row >= 0) & (row < h_img) & (col >= 0) &
                      (col < w_img))
            h1 = jnp.where(inside, h1,
                           jnp.round(ezp1).astype(jnp.int8))
            acc2 = _conv3x3_i8(h1, w2r, rows_out, w_t, interpret,
                               supergrouped=len(w2r.shape) == 4)
            y2 = acc2.astype(jnp.float32) * sb2[0][None, None, :] \
                + sb2[1][None, None, :]
            y2 = jnp.maximum(y2, 0.0)
            h2 = _requant(y2, inv_d2, ezp2)
            acc3 = jax.lax.dot_general(
                h2, w3r[:],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = acc3.astype(jnp.float32) * sb3[0][None, None, :] \
                + sb3[1][None, None, :]
            res = (cur[1:1 + rows_out].astype(jnp.float32) - ezp_in) * d_in
            y = jnp.maximum(y + res, 0.0)
        else:
            w1r, sb1, w2r, sb2 = wrefs[j * per:(j + 1) * per]
            H1 = rows_in - 2
            acc1 = _conv3x3_i8(cur[:rows_in], w1r, H1, w_t, interpret,
                               supergrouped=False)
            y1 = acc1.astype(jnp.float32) * sb1[0][None, None, :] \
                + sb1[1][None, None, :]
            y1 = jnp.maximum(y1, 0.0)
            h1 = _requant(y1, inv_d1, ezp1)
            row = (i * th - halo + off + 1
                   + jax.lax.broadcasted_iota(jnp.int32, (H1, w_t, 1), 0))
            col = (jax.lax.broadcasted_iota(jnp.int32,
                                            (H1, w_t, 1), 1) - halo)
            inside = ((row >= 0) & (row < h_img) & (col >= 0) &
                      (col < w_img))
            h1 = jnp.where(inside, h1, jnp.round(ezp1).astype(jnp.int8))
            acc2 = _conv3x3_i8(h1, w2r, rows_out, w_t, interpret,
                               supergrouped=False)
            y = acc2.astype(jnp.float32) * sb2[0][None, None, :] \
                + sb2[1][None, None, :]
            res = (cur[2:2 + rows_out].astype(jnp.float32) - ezp_in) * d_in
            y = jnp.maximum(y + res, 0.0)
        out_s = _requant(y, inv_do, ezp_o)
        # keep the chain invariant: outside-image = the NEXT grid's ezp
        orow = (i * th - halo + off + radius
                + jax.lax.broadcasted_iota(jnp.int32,
                                           (rows_out, w_t, 1), 0))
        ocol = (jax.lax.broadcasted_iota(jnp.int32,
                                         (rows_out, w_t, 1), 1) - halo)
        out_inside = ((orow >= 0) & (orow < h_img) & (ocol >= 0) &
                      (ocol < w_img))
        cur = jnp.where(out_inside, out_s,
                        jnp.round(ezp_o).astype(jnp.int8))
        off += radius

    ys[:] = cur
    dma_out = pltpu.make_async_copy(
        ys, out_hbm.at[n, pl.ds(halo + i * th, th)], sem_out)
    dma_out.start()
    dma_out.wait()

    # halo rows of the output buffer hold the OUTPUT grid's ezp code
    ezp_last = meta_ref[K - 1, 7]
    zs[:] = jnp.full(zs.shape, jnp.round(ezp_last), zs.dtype)

    @pl.when(i == 0)
    def _():
        d = pltpu.make_async_copy(zs, out_hbm.at[n, pl.ds(0, halo)], sem_z)
        d.start()
        d.wait()

    @pl.when(i == ngrid - 1)
    def _():
        d = pltpu.make_async_copy(
            zs, out_hbm.at[n, pl.ds(r_rows - halo, halo)], sem_z)
        d.start()
        d.wait()


def int8_stack_vmem_bytes(th, Wt, Cp, widths, radius, w2_super=None):
    """Conservative VMEM estimate for one int8 stack call.

    Dominant transients per block: the dy-stacked int8 input (3C lanes,
    or 3*128 per supergroup), the int32 z/acc pair, the f32 epilogue and
    the int8 code tensors."""
    halo = max(len(widths), 1) * radius
    rows = th + 2 * halo
    pad = [(-(-w // 128) * 128) for w in widths]
    wmax = max(pad)
    if w2_super is None:
        w2_super = [w % 128 == 0 for w in widths]
    if radius == 1:
        stack_lanes = min(3 * 128 if all(w2_super) else 3 * wmax, 3 * wmax)
        zacc = (128 if all(w2_super) else wmax) * 4 * 2
    else:
        stack_lanes = 3 * Cp
        zacc = wmax * 4 * 2
    acts = rows * Wt * (Cp * 1              # xs
                        + stack_lanes * 1   # dy-stacked input
                        + zacc              # z + acc int32
                        + wmax * (4 + 1)    # f32 epilogue + codes
                        + Cp * 4 + Cp * 1)  # y f32 + out codes
    weights = 0
    for w, wd, sup in zip(widths, pad, w2_super):
        if radius == 1:
            w2b = 9 * w * 128 if sup else 9 * wd * wd
            weights += (w2b + 2 * Cp * wd) * 1 + 4 * (2 * wd * 2 + Cp * 2)
        else:
            weights += 9 * Cp * w * 2 * 1 + 4 * (w + Cp) * 2
    return acts + weights


def int8_fused_stack_chained(xp, blocks, meta, hwc, radius,
                             h_tile: int = 16, interpret: bool = False):
    """Run K chained int8 residual blocks in one Pallas call.

    xp: (N, R, Wt, Cp) int8 chain buffer, image codes at (halo, halo),
    padding = block 0's input ezp code; halo = K * radius.
    blocks: per block, (w1q, sb1, w2q, sb2) int8/f32 for BasicBlocks
    (radius=2) or (w1q, sb1, w2q, sb2, w3q, sb3) for Bottlenecks
    (radius=1; w2q dense block-diagonal (3,3,Wd,Wd) or supergrouped
    (3,3,S,128,128)); sbX = (2, Cout) f32 [requant scale; folded bias].
    3x3 kernels are re-laid out here into the kernel's dy-stacked form:
    dense (3_dx, 3*Cin, Cout), supergrouped (3_dx, S, 3*128, 128).
    meta: (K, 8) f32 — see _int8_stack_kernel. Returns the same layout
    holding codes on the LAST block's output grid.
    """
    H, W, C = hwc
    N, R, Wt, Cp = xp.shape
    K = len(blocks)
    halo = K * radius
    ngrid = (R - 2 * halo) // h_tile

    def prep3x3(w):
        # (3_dy, 3_dx, Cin, Cout) -> (3_dx, 3*Cin dy-major, Cout)
        return jnp.transpose(w, (1, 0, 2, 3)).reshape(
            3, 3 * w.shape[2], w.shape[3])

    def prep3x3_super(w):
        # (3_dy, 3_dx, S, 128, 128) -> (3_dx, S, 3*128 dy-major, 128)
        return jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(
            3, w.shape[2], 3 * 128, 128)

    widths = []
    flat = []
    for blk in blocks:
        if radius == 1:
            w1, sb1, w2, sb2, w3, sb3 = blk
            width = w1.shape[1]
            Wd = (-(-width // 128) * 128
                  if (not interpret and w2.ndim != 5) else width)
            w1 = jnp.pad(w1, ((0, Cp - C), (0, Wd - width)))
            sb1 = jnp.pad(sb1, ((0, 0), (0, Wd - width)))
            if w2.ndim == 5:
                w2 = prep3x3_super(w2)
            else:
                w2 = prep3x3(jnp.pad(
                    w2, ((0, 0), (0, 0), (0, Wd - width),
                         (0, Wd - width))))
            sb2 = jnp.pad(sb2, ((0, 0), (0, Wd - width)))
            w3 = jnp.pad(w3, ((0, Wd - width), (0, Cp - C)))
            sb3 = jnp.pad(sb3, ((0, 0), (0, Cp - C)))
            widths.append(Wd)
            flat += [w1, sb1, w2, sb2, w3, sb3]
        else:
            w1, sb1, w2, sb2 = blk
            cmid = w1.shape[3]
            w1 = prep3x3(jnp.pad(w1, ((0, 0), (0, 0), (0, Cp - C),
                                      (0, 0))))
            w2 = prep3x3(jnp.pad(w2, ((0, 0), (0, 0), (0, 0),
                                      (0, Cp - C))))
            sb2 = jnp.pad(sb2, ((0, 0), (0, Cp - C)))
            widths.append(cmid)
            flat += [w1, sb1, w2, sb2]

    out = pl.pallas_call(
        functools.partial(_int8_stack_kernel, th=h_tile, w_t=Wt, w_img=W,
                          h_img=H, K=K, radius=radius,
                          widths=tuple(widths), r_rows=R,
                          interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((N, R, Wt, Cp), jnp.int8),
        grid=(N, ngrid),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(flat)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((h_tile + 2 * halo, Wt, Cp), jnp.int8),
            pltpu.VMEM((h_tile, Wt, Cp), jnp.int8),
            pltpu.VMEM((halo, Wt, Cp), jnp.int8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, *flat, meta)
    return out


# ---------------------------------------------------------------------------
# Pure-XLA oracle (tests + fallback): identical integer math, op by op.
# ---------------------------------------------------------------------------

def int8_block_reference(s_in, blk, meta_row, radius, groups=1):
    """One block on stored int8 codes (N, H, W, C) -> codes on the out
    grid. Exact integer/float math twin of the kernel (SAME padding via
    ezp codes). ``groups`` applies to the 3x3 of bottlenecks (w2 given
    as the original grouped kernel here, (3,3,cpg,Wd))."""
    d_in, ezp_in, inv_d1, ezp1, inv_d2, ezp2, inv_do, ezp_o = [
        float(v) for v in meta_row]

    def conv(s, wq, strides=(1, 1), pad_code=0, grp=1):
        xs = jnp.pad(s.astype(jnp.int8),
                     ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=jnp.int8(pad_code))
        dn = jax.lax.conv_dimension_numbers(
            xs.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            xs, wq.astype(jnp.int8), strides, "VALID",
            dimension_numbers=dn, preferred_element_type=jnp.int32,
            feature_group_count=grp)

    def conv1x1(s, wq):
        return jnp.einsum("nhwc,cd->nhwd", s.astype(jnp.int32),
                          wq.astype(jnp.int32))

    def epi(acc, sb, relu=True):
        y = acc.astype(jnp.float32) * sb[0] + sb[1]
        return jnp.maximum(y, 0.0) if relu else y

    def req(y, inv_d, ezp):
        return jnp.clip(jnp.round(y * inv_d) + ezp, -128, 127) \
            .astype(jnp.int8)

    if radius == 1:
        w1, sb1, w2, sb2, w3, sb3 = blk
        h1 = req(epi(conv1x1(s_in, w1), sb1), inv_d1, ezp1)
        h2 = req(epi(conv(h1, w2, pad_code=int(round(ezp1)), grp=groups),
                     sb2), inv_d2, ezp2)
        y = epi(conv1x1(h2, w3), sb3, relu=False)
    else:
        w1, sb1, w2, sb2 = blk
        h1 = req(epi(conv(s_in, w1, pad_code=int(round(ezp_in))), sb1),
                 inv_d1, ezp1)
        y = epi(conv(h1, w2, pad_code=int(round(ezp1))), sb2, relu=False)
    res = (s_in.astype(jnp.float32) - ezp_in) * d_in
    y = jnp.maximum(y + res, 0.0)
    return req(y, inv_do, ezp_o)
