"""Pallas fused residual block: conv3x3+bias+relu -> conv3x3+bias
+ residual + relu in ONE kernel.

Why: the tunneled TPU measures ~68 GB/s HBM read bandwidth (BASELINE.md
device calibration) and the BEV backbones are bandwidth-bound; XLA writes
each conv's activation back to HBM (3 round trips per BasicBlock). This
kernel reads the input tile once into VMEM, runs both convolutions as
9 shifted MXU matmuls each (dot_general over the channel dim), and writes
only the block output — ~3x byte reduction per block.

Mosaic layout note: the W axis is the sublane dim, and sublane slices must
be 8-aligned — so the column shifts of the 3x3 stencil CANNOT be expressed
as `x[:, dx:dx+W]` slices. Instead everything is computed at full padded
width and the dx shifts are `pltpu.roll` sublane rotations; rotation
wraparound lands outside the image border and is zeroed by the SAME-padding
mask (conv1) or discarded by the final trim (conv2/residual).

Inference-path kernel: BatchNorm must be pre-folded into (w, b) (see
quant/int8_engine.fold_conv_bn). Weights layout (3, 3, Cin, Cout).

Grid: (N, H/H_T) row-tiles over a zero-padded input; each step DMAs a
haloed (H_T+4, Wt, C) slice from HBM into VMEM scratch.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, xs, sem,
            *, h_tile: int, w_t: int, w_out: int, h_orig: int, cmid: int,
            cout: int, interpret: bool):
    n = pl.program_id(0)
    i = pl.program_id(1)

    def roll_cols(v, dx):
        # result[p] = v[p + dx] (wraparound handled by masking/trim);
        # pltpu.roll requires a non-negative shift, so use the cyclic
        # equivalent w_t - dx. Mosaic only rotates 32-bit data — bf16
        # round-trips through f32 for the rotate (vector casts, cheap next
        # to the 9 MXU dots).
        if dx == 0:
            return v
        if interpret:
            return jnp.roll(v, -dx, axis=1)
        if v.dtype.itemsize == 4:
            return pltpu.roll(v, w_t - dx, axis=1)
        return pltpu.roll(v.astype(jnp.float32), w_t - dx,
                          axis=1).astype(v.dtype)

    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(i * h_tile, h_tile + 4)], xs, sem)
    dma.start()
    dma.wait()

    H1 = h_tile + 2          # conv1 output rows (feeds conv2)

    # conv1 at full width: h1[r, p] = conv1 output at global
    # (row i*h_tile + r - 1, col p - 1); inputs live at xs[r + dy, p + dx]
    acc1 = jnp.zeros((H1, w_t, cmid), jnp.float32)
    for dy in range(3):
        rows = xs[dy:dy + H1]
        for dx in range(3):
            acc1 = acc1 + jax.lax.dot_general(
                roll_cols(rows, dx), w1_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    h1 = jnp.maximum(acc1 + b1_ref[:].astype(jnp.float32), 0.0)
    # SAME-padding parity: the intermediate only exists INSIDE the image;
    # conv2 must see zeros beyond the borders (relu(bias) would otherwise
    # leak in). The mask also kills rotation wraparound (cols >= w_out).
    # 32-bit 0/1 multiply — Mosaic cannot reshape i1 vectors to add a minor
    # dim, and relu output is >= 0 so multiply == where.
    row = (i * h_tile - 1
           + jax.lax.broadcasted_iota(jnp.int32, (H1, w_t, 1), 0))
    col = jax.lax.broadcasted_iota(jnp.int32, (H1, w_t, 1), 1) - 1
    inside = ((row >= 0) & (row < h_orig) & (col >= 0) &
              (col < w_out)).astype(jnp.float32)
    h1 = (h1 * inside).astype(xs.dtype)

    # conv2 on the VMEM-resident intermediate: out[r, u] needs
    # h1[r + dy, u + dx]
    acc2 = jnp.zeros((h_tile, w_t, cout), jnp.float32)
    for dy in range(3):
        rows = h1[dy:dy + h_tile]
        for dx in range(3):
            acc2 = acc2 + jax.lax.dot_general(
                roll_cols(rows, dx), w2_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    # residual: x at global (i*h_tile + r, u) = xs[r + 2, u + 2]
    residual = roll_cols(xs[2:2 + h_tile], 2).astype(jnp.float32)
    y = jnp.maximum(acc2 + b2_ref[:].astype(jnp.float32) + residual, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16M scoped limit


def _fit_h_tile(h_tile: int, per_row_bytes: int, fixed_bytes: int) -> int:
    """Shrink h_tile until the kernel's working set fits scoped VMEM.

    Wide full-BEV inputs (e.g. 352x100 backbone stages) overflow the 16M
    scoped-vmem limit at h_tile=16; halving the row tile trades grid steps
    for fit (each step still DMAs full rows, so bytes moved are unchanged).
    """
    while h_tile > 4 and fixed_bytes + (h_tile + 4) * per_row_bytes > \
            _VMEM_BUDGET:
        h_tile //= 2
    return h_tile


@functools.partial(jax.jit, static_argnames=("h_tile", "interpret"))
def fused_basic_block(x, w1, b1, w2, b2, h_tile: int = 16,
                      interpret: bool = False):
    """Fused y = relu(conv(relu(conv(x, w1) + b1), w2) + b2 + x).

    x: (N, H, W, C); w1: (3, 3, C, C); w2: (3, 3, C, C); b: (C,).
    Residual requires Cin == Cout (the backbone BasicBlock case).
    SAME padding, stride 1.
    """
    N, H, W, C = x.shape
    assert w1.shape[2] == C and w2.shape[3] == C, "residual needs Cin==Cout"
    cmid = w1.shape[3]
    Wt0 = -(-(W + 4) // 8) * 8
    Cp0 = -(-C // 128) * 128 if not interpret else C
    # xs + acc1(f32) + h1 + acc2(f32) + out + residual(f32), per tile row
    per_row = Wt0 * (Cp0 * 2 + cmid * 6 + Cp0 * 4 + Cp0 * 2 + Cp0 * 4)
    h_tile = _fit_h_tile(h_tile, per_row, 2 * 9 * C * cmid * 2)
    Hp = -(-H // h_tile) * h_tile           # round H up to tile multiple
    Wt = -(-(W + 4) // 8) * 8               # sublane-aligned full width
    # Mosaic's manual-DMA memref slices require the lane dim to be a
    # multiple of 128 even at full extent — pad C (costs extra bytes only
    # for the C=64 stage; the fused single round trip still nets out)
    Cp = -(-C // 128) * 128 if not interpret else C
    xp = jnp.pad(x, ((0, 0), (2, 2 + Hp - H), (2, Wt - W - 2), (0, Cp - C)))
    w1p = jnp.pad(w1, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
    w2p = jnp.pad(w2, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
    b2p = jnp.pad(b2, (0, Cp - C))

    grid = (N, Hp // h_tile)
    out = pl.pallas_call(
        functools.partial(_kernel, h_tile=h_tile, w_t=Wt, w_out=W,
                          h_orig=H, cmid=cmid, cout=Cp, interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((N, Hp, Wt, Cp), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b2
        ],
        out_specs=pl.BlockSpec(
            (1, h_tile, Wt, Cp),
            lambda n, i: (n, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((h_tile + 4, Wt, Cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w1p, b1, w2p, b2p)
    return out[:, :H, :W, :C]


def _bottleneck_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                       out_ref, xs, sem, *, h_tile: int, w_t: int,
                       w_out: int, h_orig: int, width: int, cout: int,
                       interpret: bool):
    n = pl.program_id(0)
    i = pl.program_id(1)

    def roll_cols(v, dx):
        if dx == 0:
            return v
        if interpret:
            return jnp.roll(v, -dx, axis=1)
        if v.dtype.itemsize == 4:
            return pltpu.roll(v, w_t - dx, axis=1)
        return pltpu.roll(v.astype(jnp.float32), w_t - dx,
                          axis=1).astype(v.dtype)

    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(i * h_tile, h_tile + 2)], xs, sem)
    dma.start()
    dma.wait()

    H1 = h_tile + 2          # rows needed by the 3x3 (halo 1 each side)

    # conv1 (1x1) on every haloed row: h1[r, p] = result at global
    # (i*h_tile + r - 1, col p - 1)
    acc1 = jax.lax.dot_general(
        xs[:], w1_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h1 = jnp.maximum(acc1 + b1_ref[:].astype(jnp.float32), 0.0)
    # SAME-padding parity: a 1x1 conv of a zero input is relu(b1) != 0, but
    # the true intermediate exists only INSIDE the image — zero the border
    # so conv2 sees SAME-padding zeros (also kills rotation wraparound)
    row = (i * h_tile - 1
           + jax.lax.broadcasted_iota(jnp.int32, (H1, w_t, 1), 0))
    col = jax.lax.broadcasted_iota(jnp.int32, (H1, w_t, 1), 1) - 1
    inside = ((row >= 0) & (row < h_orig) & (col >= 0) &
              (col < w_out)).astype(jnp.float32)
    h1 = (h1 * inside).astype(xs.dtype)

    # conv2 (3x3, block-diagonal dense weights) on the VMEM intermediate:
    # out[r, u] at global (i*h_tile + r, u) needs h1[r + dy, u + dx]
    acc2 = jnp.zeros((h_tile, w_t, width), jnp.float32)
    for dy in range(3):
        rows = h1[dy:dy + h_tile]
        for dx in range(3):
            acc2 = acc2 + jax.lax.dot_general(
                roll_cols(rows, dx), w2_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    h2 = jnp.maximum(acc2 + b2_ref[:].astype(jnp.float32),
                     0.0).astype(xs.dtype)

    # conv3 (1x1) + residual + relu; residual x at global
    # (i*h_tile + r, u) = xs[r + 1, u + 1]
    acc3 = jax.lax.dot_general(
        h2, w3_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    residual = roll_cols(xs[1:1 + h_tile], 1).astype(jnp.float32)
    y = jnp.maximum(acc3 + b3_ref[:].astype(jnp.float32) + residual, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h_tile", "interpret"))
def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, h_tile: int = 16,
                     interpret: bool = False):
    """Fused ResNeXt bottleneck (expansion=1, stride 1, Cin == Cout):

        y = relu(conv1x1(relu(conv3x3(relu(conv1x1(x,w1)+b1), w2)+b2), w3)
                 + b3 + x)

    One HBM read of x and one write of y replace XLA's four activation
    round trips (the BW-bound device's dominant cost; BASELINE.md device
    calibration). The reference's grouped 3x3 (groups=32) must be
    pre-materialized to block-diagonal dense ``w2`` (see
    quant/fused_engine.grouped_to_blockdiag) — bit-equal outputs, full MXU
    tiles.

    x: (N, H, W, C); w1: (C, Wd); w2: (3, 3, Wd, Wd); w3: (Wd, C).
    """
    N, H, W, C = x.shape
    assert w1.shape[0] == C and w3.shape[1] == C, "residual needs Cin==Cout"
    width = w1.shape[1]
    Wt0 = -(-(W + 2) // 8) * 8
    Cp0 = -(-C // 128) * 128 if not interpret else C
    Wd0 = -(-width // 128) * 128 if not interpret else width
    # xs + acc1(f32)+h1 + acc2(f32)+h2 + y(f32) + out + residual(f32)
    per_row = Wt0 * (Cp0 * 2 + Wd0 * 6 + Wd0 * 6 + Cp0 * 4 + Cp0 * 2
                     + Cp0 * 4)
    h_tile = _fit_h_tile(h_tile, per_row,
                         (9 * Wd0 * Wd0 + 2 * Cp0 * Wd0) * 2)
    Hp = -(-H // h_tile) * h_tile
    Wt = -(-(W + 2) // 8) * 8
    Cp = -(-C // 128) * 128 if not interpret else C
    Wd = -(-width // 128) * 128 if not interpret else width
    xp = jnp.pad(x, ((0, 0), (1, 1 + Hp - H), (1, Wt - W - 1), (0, Cp - C)))
    w1p = jnp.pad(w1, ((0, Cp - C), (0, Wd - width)))
    b1p = jnp.pad(b1, (0, Wd - width))
    w2p = jnp.pad(w2, ((0, 0), (0, 0), (0, Wd - width), (0, Wd - width)))
    b2p = jnp.pad(b2, (0, Wd - width))
    w3p = jnp.pad(w3, ((0, Wd - width), (0, Cp - C)))
    b3p = jnp.pad(b3, (0, Cp - C))

    grid = (N, Hp // h_tile)
    out = pl.pallas_call(
        functools.partial(_bottleneck_kernel, h_tile=h_tile, w_t=Wt,
                          w_out=W, h_orig=H, width=Wd, cout=Cp,
                          interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((N, Hp, Wt, Cp), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b3
        ],
        out_specs=pl.BlockSpec(
            (1, h_tile, Wt, Cp),
            lambda n, i: (n, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((h_tile + 2, Wt, Cp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w1p, b1p, w2p, b2p, w3p, b3p)
    return out[:, :H, :W, :C]


def bottleneck_reference(x, w1, b1, w2, b2, w3, b3):
    """XLA reference of the fused bottleneck (for tests/benchmarks)."""
    h = jax.nn.relu(
        jnp.einsum("nhwc,cd->nhwd", x, w1) + b1)
    dn = jax.lax.conv_dimension_numbers(h.shape, w2.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    h = jax.lax.conv_general_dilated(h, w2, (1, 1), "SAME",
                                     dimension_numbers=dn)
    h = jax.nn.relu(h + b2)
    y = jnp.einsum("nhwd,dc->nhwc", h, w3) + b3
    return jax.nn.relu(y + x)


def basic_block_reference(x, w1, b1, w2, b2):
    """XLA reference of the same computation (for tests/benchmarks)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w1.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    h = jax.lax.conv_general_dilated(x, w1, (1, 1), "SAME",
                                     dimension_numbers=dn)
    h = jax.nn.relu(h + b1)
    y = jax.lax.conv_general_dilated(h, w2, (1, 1), "SAME",
                                     dimension_numbers=dn)
    return jax.nn.relu(y + b2 + x)
