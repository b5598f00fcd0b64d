"""Pallas fused residual block: conv3x3+bias+relu -> conv3x3+bias
+ residual + relu in ONE kernel.

Why: the tunneled TPU measures ~68 GB/s HBM read bandwidth (BASELINE.md
device calibration) and the BEV backbones are bandwidth-bound; XLA writes
each conv's activation back to HBM (3 round trips per BasicBlock). This
kernel reads the input tile once into VMEM, runs both convolutions as
9 shifted MXU matmuls each (dot_general over the channel dim), and writes
only the block output — ~3x byte reduction per block.

Inference-path kernel: BatchNorm must be pre-folded into (w, b) (see
quant/int8_engine.fold_conv_bn). Weights layout (3, 3, Cin, Cout).

Grid: (N, H/H_T) row-tiles over a zero-padded input; each step DMAs a
haloed (H_T+4, W+4, C) slice from HBM into VMEM scratch.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, xs, sem,
            *, h_tile: int, w_out: int, h_orig: int, cin: int, cmid: int,
            cout: int):
    n = pl.program_id(0)
    i = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[n, pl.ds(i * h_tile, h_tile + 4)], xs, sem)
    dma.start()
    dma.wait()

    H1 = h_tile + 2          # conv1 output rows (feeds conv2)
    W1 = w_out + 2

    # conv1: 9 shifted matmuls, f32 accumulation on the MXU
    acc1 = jnp.zeros((H1, W1, cmid), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xs[dy:dy + H1, dx:dx + W1, :]
            acc1 = acc1 + jax.lax.dot_general(
                patch, w1_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    h1 = jnp.maximum(acc1 + b1_ref[:].astype(jnp.float32), 0.0)
    # SAME-padding parity: the intermediate only exists INSIDE the image;
    # conv2 must see zeros in the halo ring beyond the image borders
    # (relu(bias) would otherwise leak in from outside)
    row = (i * h_tile - 1
           + jax.lax.broadcasted_iota(jnp.int32, (H1, W1), 0))
    col = jax.lax.broadcasted_iota(jnp.int32, (H1, W1), 1) - 1
    inside = ((row >= 0) & (row < h_orig) & (col >= 0) & (col < w_out))
    h1 = jnp.where(inside[..., None], h1, 0.0).astype(xs.dtype)

    # conv2 on the VMEM-resident intermediate
    acc2 = jnp.zeros((h_tile, w_out, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = h1[dy:dy + h_tile, dx:dx + w_out, :]
            acc2 = acc2 + jax.lax.dot_general(
                patch, w2_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    residual = xs[2:2 + h_tile, 2:2 + w_out, :].astype(jnp.float32)
    y = jnp.maximum(acc2 + b2_ref[:].astype(jnp.float32) + residual, 0.0)
    out_ref[0] = y.astype(out_ref.dtype)


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
    Hp = -(-H // h_tile) * h_tile           # round H up to tile multiple
    xp = jnp.pad(x, ((0, 0), (2, 2 + Hp - H), (2, 2), (0, 0)))

    grid = (N, Hp // h_tile)
    out = pl.pallas_call(
        functools.partial(_kernel, h_tile=h_tile, w_out=W, h_orig=H,
                          cin=C, cmid=cmid, cout=C),
        out_shape=jax.ShapeDtypeStruct((N, Hp, W, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b2
        ],
        out_specs=pl.BlockSpec(
            (1, h_tile, W, C),
            lambda n, i: (n, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((h_tile + 4, W + 4, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w1, b1, w2, b2)
    return out[:, :H]


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
