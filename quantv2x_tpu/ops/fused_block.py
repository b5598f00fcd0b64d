"""Pallas fused residual blocks: a whole BasicBlock / ResNeXt Bottleneck
in ONE kernel, with a chain-friendly padded layout.

Why: the tunneled TPU measures ~68 GB/s HBM read bandwidth (BASELINE.md
device calibration) and the BEV backbones are bandwidth-bound; XLA writes
each conv's activation back to HBM (3-4 round trips per residual block).
These kernels read the input tile once into VMEM, run all convolutions as
shifted MXU matmuls (dot_general over the channel dim), and write only the
block output.

Chain layout: both kernels take AND produce a buffer of shape
(N, R, Wt, Cp) holding the (H, W, C) image at offset (halo, halo) with
zeros everywhere else (halo = receptive-field radius: 2 for BasicBlock's
two 3x3s, 1 for the Bottleneck's 1x1-3x3-1x1). Because input and output
layouts are identical, a stack of same-shape blocks chains directly — the
engine (quant/fused_engine) hands block k's padded output straight to
block k+1, and the per-block pad/slice HBM copies (which cost more than
the convs on a BW-bound device at C=64, where lane padding doubles the
bytes) disappear. The kernels zero their padded region (bias would
otherwise leak there) so the chain invariant holds.

Mosaic layout notes: in the (rows, W, C) tiles, C is the lane dim (must
pad to 128 for manual-DMA memrefs) and W the sublane dim (8-aligned). The
dx shifts of the 3x3 stencil are `pltpu.roll` sublane rotations computed
at full padded width; rotation wraparound lands outside the image border
and is zeroed by the padding mask. The final result is rolled back so the
output's column origin matches the input's.

Inference-path kernels: BatchNorm must be pre-folded into (w, b) (see
quant/int8_engine.fold_conv_bn). Weight layouts: 3x3 convs (3, 3, Cin,
Cout); 1x1 convs (Cin, Cout). Grouped 3x3s must be pre-materialized to
block-diagonal dense (quant/fused_engine.grouped_to_blockdiag) — bit-equal
outputs, full MXU tiles.

Grid: (N, ceil(H / h_tile)) row-tiles; each step manually DMAs a haloed
(h_tile + 2*halo, Wt, Cp) slice HBM->VMEM, computes, and DMAs the
(h_tile, Wt, Cp) output rows back. Tile 0 / the last tile additionally
zero the top / bottom halo rows of the output buffer.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024  # headroom under the 16M scoped limit


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


def _roll_cols(v, dx, w_t, interpret):
    """result[p] = v[p + dx] along the sublane (W) axis; dx may be
    negative (then result[p] = v[p + dx] with low-index wraparound, which
    callers mask/ignore). Mosaic only rotates 32-bit data — bf16
    round-trips through f32 (vector casts, cheap next to the MXU dots)."""
    if dx == 0:
        return v
    if interpret:
        return jnp.roll(v, -dx, axis=1)
    shift = (w_t - dx) % w_t
    if v.dtype.itemsize == 4:
        return pltpu.roll(v, shift, axis=1)
    return pltpu.roll(v.astype(jnp.float32), shift, axis=1).astype(v.dtype)


def chain_geometry(H, W, C, cmid, h_tile, halo, interpret):
    """(h_tile, R, Wt, Cp) for the chain-layout buffer of an (H, W, C)
    image processed by a block with intermediate width ``cmid``."""
    Wt = -(-(W + 2 * halo) // 8) * 8
    Cp = -(-C // 128) * 128 if not interpret else C
    Cm = -(-cmid // 128) * 128 if not interpret else cmid
    # xs + intermediates(f32+bf16) + y(f32) + out scratch, per tile row
    per_row = Wt * (Cp * 2 + Cm * 6 + Cm * 6 + Cp * 4 + Cp * 2 + Cp * 4)
    h_tile = _fit_h_tile(h_tile, per_row,
                         (9 * Cm * Cm + 2 * Cp * Cm) * 2)
    ngrid = -(-H // h_tile)
    R = ngrid * h_tile + 2 * halo
    return h_tile, R, Wt, Cp


def to_chain_layout(x, geom, halo):
    """(N, H, W, C) -> (N, R, Wt, Cp) with the image at (halo, halo)."""
    N, H, W, C = x.shape
    _, R, Wt, Cp = geom
    return jnp.pad(x, ((0, 0), (halo, R - H - halo),
                       (halo, Wt - W - halo), (0, Cp - C)))


def from_chain_layout(xp, hwc, halo):
    H, W, C = hwc
    return xp[:, halo:halo + H, halo:halo + W, :C]


# ---------------------------------------------------------------------------
# BasicBlock: relu(conv3x3(relu(conv3x3(x)+b1))+b2+x), halo = 2
# ---------------------------------------------------------------------------

def _basic_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_hbm,
                  xs, ys, zs, sem_in, sem_out, sem_z, *,
                  h_tile: int, w_t: int, w_img: int, h_img: int,
                  cmid: int, r_rows: int, interpret: bool):
    n = pl.program_id(0)
    i = pl.program_id(1)
    ngrid = pl.num_programs(1)

    roll = functools.partial(_roll_cols, w_t=w_t, interpret=interpret)

    dma_in = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(i * h_tile, h_tile + 4)], xs, sem_in)
    dma_in.start()
    dma_in.wait()

    H1 = h_tile + 2          # conv1 output rows feeding conv2

    # conv1: xs[r] is buffer row i*h_tile + r = image row i*h_tile + r - 2
    # (image at offset 2); h1[r, p] = conv1 at image
    # (i*h_tile + r - 1, col p - 1)
    acc1 = jnp.zeros((H1, w_t, cmid), jnp.float32)
    for dy in range(3):
        rows = xs[dy:dy + H1]
        for dx in range(3):
            acc1 = acc1 + jax.lax.dot_general(
                roll(rows, dx), w1_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    h1 = jnp.maximum(acc1 + b1_ref[:].astype(jnp.float32), 0.0)
    # SAME-padding parity: the intermediate exists only INSIDE the image;
    # zero the border so conv2 sees padding zeros (also kills rotation
    # wraparound). 0/1 f32 multiply — relu output >= 0 so mul == where.
    row = (i * h_tile - 1
           + jax.lax.broadcasted_iota(jnp.int32, (H1, w_t, 1), 0))
    col = jax.lax.broadcasted_iota(jnp.int32, (H1, w_t, 1), 1) - 1
    inside = ((row >= 0) & (row < h_img) & (col >= 0) &
              (col < w_img)).astype(jnp.float32)
    h1 = (h1 * inside).astype(xs.dtype)

    # conv2: out[r, u] = conv2 at image (i*h_tile + r, col u)
    acc2 = jnp.zeros((h_tile, w_t, out_hbm.shape[-1]), jnp.float32)
    for dy in range(3):
        rows = h1[dy:dy + h_tile]
        for dx in range(3):
            acc2 = acc2 + jax.lax.dot_general(
                roll(rows, dx), w2_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y = acc2 + b2_ref[:].astype(jnp.float32)
    # align to the chain layout (lane l <-> col l - 2) BEFORE the residual
    # (xs is already in that layout), then mask the padded region to zero
    y = roll(y, -2)
    residual = xs[2:2 + h_tile].astype(jnp.float32)
    y = jnp.maximum(y + residual, 0.0)
    orow = (i * h_tile
            + jax.lax.broadcasted_iota(jnp.int32, (h_tile, w_t, 1), 0))
    ocol = jax.lax.broadcasted_iota(jnp.int32, (h_tile, w_t, 1), 1) - 2
    out_inside = ((orow < h_img) & (ocol >= 0) &
                  (ocol < w_img)).astype(jnp.float32)
    ys[:] = (y * out_inside).astype(ys.dtype)

    dma_out = pltpu.make_async_copy(
        ys, out_hbm.at[n, pl.ds(2 + i * h_tile, h_tile)], sem_out)
    dma_out.start()
    dma_out.wait()

    # zero the halo rows of the output buffer so the chain invariant holds
    zs[:] = jnp.zeros(zs.shape, zs.dtype)

    @pl.when(i == 0)
    def _():
        d = pltpu.make_async_copy(zs, out_hbm.at[n, pl.ds(0, 2)], sem_z)
        d.start()
        d.wait()

    @pl.when(i == ngrid - 1)
    def _():
        d = pltpu.make_async_copy(
            zs, out_hbm.at[n, pl.ds(r_rows - 2, 2)], sem_z)
        d.start()
        d.wait()


@functools.partial(jax.jit, static_argnames=("hwc", "h_tile", "interpret"))
def fused_basic_block_chained(xp, w1, b1, w2, b2, hwc, h_tile: int = 16,
                              interpret: bool = False):
    """Chain-layout fused BasicBlock. xp: (N, R, Wt, Cp) with the (H, W, C)
    image at offset (2, 2) and zeros elsewhere; returns the same layout.
    w1: (3, 3, C, Cmid); w2: (3, 3, Cmid, C); stride 1, Cin == Cout."""
    H, W, C = hwc
    N, R, Wt, Cp = xp.shape
    cmid = w1.shape[3]
    ngrid = (R - 4) // h_tile
    w1p = jnp.pad(w1, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
    w2p = jnp.pad(w2, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
    b2p = jnp.pad(b2, (0, Cp - C))

    out = pl.pallas_call(
        functools.partial(_basic_kernel, h_tile=h_tile, w_t=Wt, w_img=W,
                          h_img=H, cmid=cmid, r_rows=R,
                          interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((N, R, Wt, Cp), xp.dtype),
        grid=(N, ngrid),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b2
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),    # manual out DMA
        scratch_shapes=[
            pltpu.VMEM((h_tile + 4, Wt, Cp), xp.dtype),
            pltpu.VMEM((h_tile, Wt, Cp), xp.dtype),
            pltpu.VMEM((2, Wt, Cp), xp.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w1p, b1, w2p, b2p)
    return out


def fused_basic_block(x, w1, b1, w2, b2, h_tile: int = 16,
                      interpret: bool = False):
    """Standalone fused y = relu(conv(relu(conv(x, w1) + b1), w2) + b2 + x).

    x: (N, H, W, C); w1: (3, 3, C, Cmid); w2: (3, 3, Cmid, C); SAME
    padding, stride 1, residual requires Cin == Cout. Convenience wrapper:
    pads into the chain layout, runs the kernel, slices back. Stacked
    blocks should chain the padded layout instead (quant/fused_engine
    does this automatically).
    """
    N, H, W, C = x.shape
    assert w1.shape[2] == C and w2.shape[3] == C, "residual needs Cin==Cout"
    geom = chain_geometry(H, W, C, w1.shape[3], h_tile, 2, interpret)
    xp = to_chain_layout(x, geom, 2)
    out = fused_basic_block_chained(xp, w1, b1, w2, b2, (H, W, C),
                                    h_tile=geom[0], interpret=interpret)
    return from_chain_layout(out, (H, W, C), 2)


# ---------------------------------------------------------------------------
# ResNeXt Bottleneck (expansion=1): 1x1 -> 3x3 -> 1x1 + residual, halo = 1
# ---------------------------------------------------------------------------

def _bottleneck_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                       out_hbm, xs, ys, zs, sem_in, sem_out, sem_z, *,
                       h_tile: int, w_t: int, w_img: int, h_img: int,
                       width: int, r_rows: int, interpret: bool):
    n = pl.program_id(0)
    i = pl.program_id(1)
    ngrid = pl.num_programs(1)

    roll = functools.partial(_roll_cols, w_t=w_t, interpret=interpret)

    dma_in = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(i * h_tile, h_tile + 2)], xs, sem_in)
    dma_in.start()
    dma_in.wait()

    H1 = h_tile + 2          # rows needed by the 3x3 (halo 1 each side)

    # conv1 (1x1) on every haloed row: xs[r] = buffer row i*h_tile + r =
    # image row i*h_tile + r - 1; h1[r, p] = conv1 at image
    # (i*h_tile + r - 1, col p - 1)
    acc1 = jax.lax.dot_general(
        xs[:], w1_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h1 = jnp.maximum(acc1 + b1_ref[:].astype(jnp.float32), 0.0)
    # a 1x1 conv of a zero input is relu(b1) != 0, but the true
    # intermediate exists only INSIDE the image — zero the border so the
    # 3x3 sees SAME-padding zeros (also kills rotation wraparound)
    row = (i * h_tile - 1
           + jax.lax.broadcasted_iota(jnp.int32, (H1, w_t, 1), 0))
    col = jax.lax.broadcasted_iota(jnp.int32, (H1, w_t, 1), 1) - 1
    inside = ((row >= 0) & (row < h_img) & (col >= 0) &
              (col < w_img)).astype(jnp.float32)
    h1 = (h1 * inside).astype(xs.dtype)

    # conv2 (3x3, grouped): out[r, u] at image (i*h_tile + r, col u) needs
    # h1[r + dy, u + dx]. Two weight formats:
    #   - (3, 3, Wd, Wd) block-diagonal dense — one full-width dot/tap;
    #   - (3, 3, S, 128, 128) supergroup blocks — the G=32 tiny groups
    #     packed 8-per-128-lane MXU tile; only the (structurally nonzero)
    #     diagonal supergroup blocks are multiplied, cutting the dense-
    #     ification FLOP waste by Wd/128 with bit-identical results.
    supergrouped = len(w2_ref.shape) == 5
    if supergrouped:
        S = w2_ref.shape[2]
        parts = []
        for s in range(S):
            acc_s = jnp.zeros((h_tile, w_t, 128), jnp.float32)
            for dy in range(3):
                rows = h1[dy:dy + h_tile, :, s * 128:(s + 1) * 128]
                for dx in range(3):
                    acc_s = acc_s + jax.lax.dot_general(
                        roll(rows, dx), w2_ref[dy, dx, s],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            parts.append(acc_s)
        acc2 = jnp.concatenate(parts, axis=-1)
    else:
        acc2 = jnp.zeros((h_tile, w_t, width), jnp.float32)
        for dy in range(3):
            rows = h1[dy:dy + h_tile]
            for dx in range(3):
                acc2 = acc2 + jax.lax.dot_general(
                    roll(rows, dx), w2_ref[dy, dx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    h2 = jnp.maximum(acc2 + b2_ref[:].astype(jnp.float32),
                     0.0).astype(xs.dtype)

    # conv3 (1x1) + layout roll + residual + relu + padded-region mask
    acc3 = jax.lax.dot_general(
        h2, w3_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = roll(acc3 + b3_ref[:].astype(jnp.float32), -1)
    residual = xs[1:1 + h_tile].astype(jnp.float32)
    y = jnp.maximum(y + residual, 0.0)
    orow = (i * h_tile
            + jax.lax.broadcasted_iota(jnp.int32, (h_tile, w_t, 1), 0))
    ocol = jax.lax.broadcasted_iota(jnp.int32, (h_tile, w_t, 1), 1) - 1
    out_inside = ((orow < h_img) & (ocol >= 0) &
                  (ocol < w_img)).astype(jnp.float32)
    ys[:] = (y * out_inside).astype(ys.dtype)

    dma_out = pltpu.make_async_copy(
        ys, out_hbm.at[n, pl.ds(1 + i * h_tile, h_tile)], sem_out)
    dma_out.start()
    dma_out.wait()

    zs[:] = jnp.zeros(zs.shape, zs.dtype)

    @pl.when(i == 0)
    def _():
        d = pltpu.make_async_copy(zs, out_hbm.at[n, pl.ds(0, 1)], sem_z)
        d.start()
        d.wait()

    @pl.when(i == ngrid - 1)
    def _():
        d = pltpu.make_async_copy(
            zs, out_hbm.at[n, pl.ds(r_rows - 1, 1)], sem_z)
        d.start()
        d.wait()


@functools.partial(jax.jit, static_argnames=("hwc", "h_tile", "interpret"))
def fused_bottleneck_chained(xp, w1, b1, w2, b2, w3, b3, hwc,
                             h_tile: int = 16, interpret: bool = False):
    """Chain-layout fused Bottleneck. xp: (N, R, Wt, Cp) with the
    (H, W, C) image at offset (1, 1), zeros elsewhere; same layout out.
    w1: (C, Wd); w2: (3, 3, Wd, Wd) block-diagonal dense; w3: (Wd, C)."""
    H, W, C = hwc
    N, R, Wt, Cp = xp.shape
    width = w1.shape[1]
    Wd = -(-width // 128) * 128 if not interpret else width
    ngrid = (R - 2) // h_tile
    w1p = jnp.pad(w1, ((0, Cp - C), (0, Wd - width)))
    b1p = jnp.pad(b1, (0, Wd - width))
    if w2.ndim == 5:
        # supergroup block format (3, 3, S, 128, 128): width is already
        # 128-aligned by construction (engine only emits it then)
        assert width == Wd == w2.shape[2] * 128, "supergroups need 128-mult"
        w2p = w2
    else:
        w2p = jnp.pad(w2, ((0, 0), (0, 0), (0, Wd - width),
                           (0, Wd - width)))
    b2p = jnp.pad(b2, (0, Wd - width))
    w3p = jnp.pad(w3, ((0, Wd - width), (0, Cp - C)))
    b3p = jnp.pad(b3, (0, Cp - C))

    out = pl.pallas_call(
        functools.partial(_bottleneck_kernel, h_tile=h_tile, w_t=Wt,
                          w_img=W, h_img=H, width=Wd, r_rows=R,
                          interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((N, R, Wt, Cp), xp.dtype),
        grid=(N, ngrid),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b3
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),    # manual out DMA
        scratch_shapes=[
            pltpu.VMEM((h_tile + 2, Wt, Cp), xp.dtype),
            pltpu.VMEM((h_tile, Wt, Cp), xp.dtype),
            pltpu.VMEM((1, Wt, Cp), xp.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w1p, b1p, w2p, b2p, w3p, b3p)
    return out


def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, h_tile: int = 16,
                     interpret: bool = False):
    """Standalone fused ResNeXt bottleneck (expansion=1, stride 1,
    Cin == Cout):

        y = relu(conv1x1(relu(conv3x3(relu(conv1x1(x,w1)+b1), w2)+b2), w3)
                 + b3 + x)

    Convenience wrapper over the chain-layout kernel (pad + slice); the
    engine chains stacked blocks on the padded layout instead.
    """
    N, H, W, C = x.shape
    assert w1.shape[0] == C and w3.shape[1] == C, "residual needs Cin==Cout"
    geom = chain_geometry(H, W, C, w1.shape[1], h_tile, 1, interpret)
    xp = to_chain_layout(x, geom, 1)
    out = fused_bottleneck_chained(xp, w1, b1, w2, b2, w3, b3, (H, W, C),
                                   h_tile=geom[0], interpret=interpret)
    return from_chain_layout(out, (H, W, C), 1)


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


# ---------------------------------------------------------------------------
# Multi-block stage kernels: a run of K same-shape residual blocks in ONE
# pallas call. Intermediates never touch HBM and the per-kernel dispatch
# cost (significant on the tunneled backend) is paid once per run instead
# of once per block. Halo = K * radius; each block consumes `radius` rows
# top+bottom of the in-flight tile and the column layout is kept invariant
# by rolling every block's result back (as in the single-block kernels).
# ---------------------------------------------------------------------------

def _stack_kernel(x_hbm, *refs, th, w_t, w_img, h_img, K, radius,
                  widths, r_rows, interpret):
    """Shared multi-block kernel body. refs layout:
    [per-block weight refs...] + [out_hbm, xs, ys, zs, sem_in, sem_out,
    sem_z]; per-block refs are 4 (basic: w1,b1,w2,b2) or 6 (bottleneck:
    w1,b1,w2,b2,w3,b3) entries, selected by ``radius`` (2=basic,
    1=bottleneck)."""
    per = 4 if radius == 2 else 6
    wrefs = refs[:K * per]
    out_hbm, xs, ys, zs, sem_in, sem_out, sem_z = refs[K * per:]
    n = pl.program_id(0)
    i = pl.program_id(1)
    ngrid = pl.num_programs(1)
    halo = K * radius
    roll = functools.partial(_roll_cols, w_t=w_t, interpret=interpret)

    dma_in = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(i * th, th + 2 * halo)], xs, sem_in)
    dma_in.start()
    dma_in.wait()

    cur = xs[:]                       # rows: buffer [i*th, i*th + th+2*halo)
    off = 0                           # rows consumed at the top so far
    for j in range(K):
        rows_in = th + 2 * halo - 2 * radius * j
        rows_out = rows_in - 2 * radius
        # image row of cur[r] = i*th - halo + off + r; lane l <-> col l-halo
        if radius == 1:
            w1r, b1r, w2r, b2r, w3r, b3r = wrefs[j * per:(j + 1) * per]
            acc1 = jax.lax.dot_general(
                cur, w1r[:],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            h1 = jnp.maximum(acc1 + b1r[:].astype(jnp.float32), 0.0)
            row = (i * th - halo + off
                   + jax.lax.broadcasted_iota(jnp.int32,
                                              (rows_in, w_t, 1), 0))
            col = (jax.lax.broadcasted_iota(jnp.int32,
                                            (rows_in, w_t, 1), 1) - halo)
            inside = ((row >= 0) & (row < h_img) & (col >= 0) &
                      (col < w_img)).astype(jnp.float32)
            h1 = (h1 * inside).astype(xs.dtype)
            wd = widths[j]
            acc2 = jnp.zeros((rows_out, w_t, wd), jnp.float32)
            if len(w2r.shape) == 5:
                S = w2r.shape[2]
                parts = []
                for s in range(S):
                    acc_s = jnp.zeros((rows_out, w_t, 128), jnp.float32)
                    for dy in range(3):
                        rows = h1[dy:dy + rows_out, :,
                                  s * 128:(s + 1) * 128]
                        for dx in range(3):
                            acc_s = acc_s + jax.lax.dot_general(
                                roll(rows, dx - 1), w2r[dy, dx, s],
                                dimension_numbers=(((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                    parts.append(acc_s)
                acc2 = jnp.concatenate(parts, axis=-1)
            else:
                for dy in range(3):
                    rows = h1[dy:dy + rows_out]
                    for dx in range(3):
                        acc2 = acc2 + jax.lax.dot_general(
                            roll(rows, dx - 1), w2r[dy, dx],
                            dimension_numbers=(((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
            h2 = jnp.maximum(acc2 + b2r[:].astype(jnp.float32),
                             0.0).astype(xs.dtype)
            acc3 = jax.lax.dot_general(
                h2, w3r[:],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = acc3 + b3r[:].astype(jnp.float32)
            residual = cur[1:1 + rows_out].astype(jnp.float32)
            y = jnp.maximum(y + residual, 0.0)
        else:
            w1r, b1r, w2r, b2r = wrefs[j * per:(j + 1) * per]
            cmid = widths[j]
            H1 = rows_in - 2
            acc1 = jnp.zeros((H1, w_t, cmid), jnp.float32)
            for dy in range(3):
                rows = cur[dy:dy + H1]
                for dx in range(3):
                    acc1 = acc1 + jax.lax.dot_general(
                        roll(rows, dx - 1), w1r[dy, dx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            h1 = jnp.maximum(acc1 + b1r[:].astype(jnp.float32), 0.0)
            row = (i * th - halo + off + 1
                   + jax.lax.broadcasted_iota(jnp.int32, (H1, w_t, 1), 0))
            col = (jax.lax.broadcasted_iota(jnp.int32,
                                            (H1, w_t, 1), 1) - halo)
            inside = ((row >= 0) & (row < h_img) & (col >= 0) &
                      (col < w_img)).astype(jnp.float32)
            h1 = (h1 * inside).astype(xs.dtype)
            acc2 = jnp.zeros((rows_out, w_t, cur.shape[-1]), jnp.float32)
            for dy in range(3):
                rows = h1[dy:dy + rows_out]
                for dx in range(3):
                    acc2 = acc2 + jax.lax.dot_general(
                        roll(rows, dx - 1), w2r[dy, dx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            y = acc2 + b2r[:].astype(jnp.float32)
            residual = cur[2:2 + rows_out].astype(jnp.float32)
            y = jnp.maximum(y + residual, 0.0)
        # zero outside-image so the invariant holds for the next block
        orow = (i * th - halo + off + radius
                + jax.lax.broadcasted_iota(jnp.int32,
                                           (rows_out, w_t, 1), 0))
        ocol = (jax.lax.broadcasted_iota(jnp.int32,
                                         (rows_out, w_t, 1), 1) - halo)
        out_inside = ((orow >= 0) & (orow < h_img) & (ocol >= 0) &
                      (ocol < w_img)).astype(jnp.float32)
        cur = (y * out_inside).astype(xs.dtype)
        off += radius

    ys[:] = cur
    dma_out = pltpu.make_async_copy(
        ys, out_hbm.at[n, pl.ds(halo + i * th, th)], sem_out)
    dma_out.start()
    dma_out.wait()

    zs[:] = jnp.zeros(zs.shape, zs.dtype)

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


def _stack_vmem_bytes(th, Wt, Cp, widths, radius, itemsize=2,
                      w2_super=None):
    """Estimate one chained-stack call's VMEM footprint.

    widths are the RAW bottleneck widths; bottleneck w2 occupies
    9*w*128 when supergroup-packed (3,3,S,128,128 — only possible at
    w % 128 == 0) but 9*Wd*Wd when it falls back to a dense
    block-diagonal padded to Wd = roundup(w, 128). w2_super: per-block
    bools; default infers supergroup from divisibility."""
    halo = max(len(widths), 1) * radius
    rows = th + 2 * halo
    pad = [(-(-w // 128) * 128) for w in widths]
    acts = rows * Wt * (Cp * itemsize            # xs
                        + max(pad if radius == 1 else widths)
                        * (4 + itemsize) * 2     # acc/h1/h2
                        + Cp * 4 + Cp * itemsize)            # y + ys
    if w2_super is None:
        w2_super = [w % 128 == 0 for w in widths]
    weights = 0
    for w, wd, sup in zip(widths, pad, w2_super):
        if radius == 1:
            w2b = 9 * w * 128 if sup else 9 * wd * wd
            weights += (w2b + 2 * Cp * wd) * itemsize
        else:
            weights += 9 * Cp * w * 2 * itemsize
    return acts + weights


def fused_stack_chained(xp, blocks, hwc, radius, h_tile: int = 16,
                        interpret: bool = False):
    """Run K chained residual blocks in one kernel.

    xp: (N, R, Wt, Cp) chain layout with the image at (halo, halo),
    halo = K * radius; blocks: tuple of weight tuples — (w1, b1, w2, b2)
    for BasicBlocks (radius=2), (w1, b1, w2, b2, w3, b3) for Bottlenecks
    (radius=1, w2 dense block-diagonal or supergrouped (3,3,S,128,128)).
    Returns the same layout.
    """
    H, W, C = hwc
    N, R, Wt, Cp = xp.shape
    K = len(blocks)
    halo = K * radius
    ngrid = (R - 2 * halo) // h_tile
    widths = []
    flat = []
    for blk in blocks:
        if radius == 1:
            w1, b1, w2, b2, w3, b3 = blk
            width = w1.shape[1]
            Wd = (-(-width // 128) * 128
                  if (not interpret and w2.ndim != 5) else width)
            w1 = jnp.pad(w1, ((0, Cp - C), (0, Wd - width)))
            b1 = jnp.pad(b1, (0, Wd - width))
            if w2.ndim != 5:
                w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, Wd - width),
                                  (0, Wd - width)))
            b2 = jnp.pad(b2, (0, Wd - width))
            w3 = jnp.pad(w3, ((0, Wd - width), (0, Cp - C)))
            b3 = jnp.pad(b3, (0, Cp - C))
            widths.append(Wd)
            flat += [w1, b1, w2, b2, w3, b3]
        else:
            w1, b1, w2, b2 = blk
            cmid = w1.shape[3]
            w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
            w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
            b2 = jnp.pad(b2, (0, Cp - C))
            widths.append(cmid)
            flat += [w1, b1, w2, b2]

    out = pl.pallas_call(
        functools.partial(_stack_kernel, th=h_tile, w_t=Wt, w_img=W,
                          h_img=H, K=K, radius=radius,
                          widths=tuple(widths), r_rows=R,
                          interpret=interpret),
        out_shape=jax.ShapeDtypeStruct((N, R, Wt, Cp), xp.dtype),
        grid=(N, ngrid),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(flat),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((h_tile + 2 * halo, Wt, Cp), xp.dtype),
            pltpu.VMEM((h_tile, Wt, Cp), xp.dtype),
            pltpu.VMEM((halo, Wt, Cp), xp.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, *flat)
    return out
