"""Tests for the Pallas fused residual block (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.ops.fused_block import (
    basic_block_reference,
    fused_basic_block,
)


def _setup(N=1, H=12, W=16, C=8, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32), dtype)
    w1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, C)).astype(np.float32),
                     dtype)
    w2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, C)).astype(np.float32),
                     dtype)
    b1 = jnp.asarray(rng.normal(0, 0.1, (C,)).astype(np.float32), dtype)
    b2 = jnp.asarray(rng.normal(0, 0.1, (C,)).astype(np.float32), dtype)
    return x, w1, b1, w2, b2


class TestFusedBlock:
    def test_matches_xla_reference(self):
        x, w1, b1, w2, b2 = _setup()
        ref = basic_block_reference(x, w1, b1, w2, b2)
        got = fused_basic_block(x, w1, b1, w2, b2, h_tile=4,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_ragged_height(self):
        # H not a multiple of h_tile exercises the pad+slice path
        x, w1, b1, w2, b2 = _setup(H=10)
        ref = basic_block_reference(x, w1, b1, w2, b2)
        got = fused_basic_block(x, w1, b1, w2, b2, h_tile=4,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_multi_batch(self):
        x, w1, b1, w2, b2 = _setup(N=3, H=8, W=8, C=8, seed=2)
        ref = basic_block_reference(x, w1, b1, w2, b2)
        got = fused_basic_block(x, w1, b1, w2, b2, h_tile=8,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_bf16(self):
        x, w1, b1, w2, b2 = _setup(C=8, dtype=jnp.bfloat16)
        ref = basic_block_reference(x, w1, b1, w2, b2)
        got = fused_basic_block(x, w1, b1, w2, b2, h_tile=4,
                                interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=0.05, atol=0.05)

    def test_zero_input_zero_output_without_bias(self):
        x, w1, b1, w2, b2 = _setup()
        z = jnp.zeros_like(x)
        zb = jnp.zeros_like(b1)
        got = fused_basic_block(z, w1, zb, w2, zb, h_tile=4,
                                interpret=True)
        assert float(jnp.abs(got).sum()) == 0.0


class TestFusedBottleneck:
    """Fused ResNeXt bottleneck kernel (1x1 -> 3x3 -> 1x1 + residual)."""

    def _setup(self, N=1, H=12, W=16, C=8, Wd=12, seed=0,
               dtype=jnp.float32):
        rng = np.random.default_rng(seed)
        a = lambda s: jnp.asarray(
            rng.normal(0, 0.1, s).astype(np.float32), dtype)
        x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32),
                        dtype)
        return (x, a((C, Wd)), a((Wd,)), a((3, 3, Wd, Wd)), a((Wd,)),
                a((Wd, C)), a((C,)))

    def test_matches_xla_reference(self):
        from quantv2x_tpu.ops.fused_block import (
            bottleneck_reference, fused_bottleneck)
        args = self._setup()
        ref = bottleneck_reference(*args)
        got = fused_bottleneck(*args, h_tile=4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_ragged_height_and_width(self):
        from quantv2x_tpu.ops.fused_block import (
            bottleneck_reference, fused_bottleneck)
        args = self._setup(N=2, H=11, W=13, C=8, Wd=16, seed=1)
        ref = bottleneck_reference(*args)
        got = fused_bottleneck(*args, h_tile=4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_border_bias_does_not_leak(self):
        # relu(b1) at out-of-image positions must NOT feed the 3x3: with
        # zero input + positive biases, interior output = relu(b3 + conv2
        # constant) everywhere, and a wrong border handling shows up as
        # different edge vs center values being *missing*. Compare against
        # the XLA reference which applies true SAME padding.
        from quantv2x_tpu.ops.fused_block import (
            bottleneck_reference, fused_bottleneck)
        x, w1, b1, w2, b2, w3, b3 = self._setup(seed=2)
        x = jnp.zeros_like(x)
        b1 = jnp.abs(b1) + 0.5
        args = (x, w1, b1, w2, b2, w3, b3)
        ref = bottleneck_reference(*args)
        got = fused_bottleneck(*args, h_tile=4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16(self):
        from quantv2x_tpu.ops.fused_block import (
            bottleneck_reference, fused_bottleneck)
        args = self._setup(dtype=jnp.bfloat16, seed=3)
        ref = bottleneck_reference(*args)
        got = fused_bottleneck(*args, h_tile=4, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=0.1, atol=0.05)


class TestChainLayout:
    """Chain-layout invariants: identical in/out layout, zeroed padding."""

    def test_chained_stack_matches_standalone(self):
        from quantv2x_tpu.ops.fused_block import (
            chain_geometry, from_chain_layout, fused_basic_block,
            fused_basic_block_chained, to_chain_layout)
        rng = np.random.default_rng(0)
        N, H, W, C = 2, 11, 13, 8
        x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
        ws = [tuple(jnp.asarray(rng.normal(0, 0.1, s).astype(np.float32))
                    for s in ((3, 3, C, C), (C,), (3, 3, C, C), (C,)))
              for _ in range(3)]
        # standalone: pad+slice per block
        y_ref = x
        for w1, b1, w2, b2 in ws:
            y_ref = fused_basic_block(y_ref, w1, b1, w2, b2, h_tile=4,
                                      interpret=True)
        # chained: one pad, three kernels, one slice
        geom = chain_geometry(H, W, C, C, 4, 2, True)
        xp = to_chain_layout(x, geom, 2)
        for w1, b1, w2, b2 in ws:
            xp = fused_basic_block_chained(xp, w1, b1, w2, b2, (H, W, C),
                                           h_tile=geom[0], interpret=True)
        y = from_chain_layout(xp, (H, W, C), 2)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_padded_region_stays_zero(self):
        from quantv2x_tpu.ops.fused_block import (
            chain_geometry, fused_bottleneck_chained, to_chain_layout)
        rng = np.random.default_rng(1)
        N, H, W, C, Wd = 1, 10, 12, 8, 16
        x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32))
        a = lambda s: jnp.asarray(
            rng.normal(0, 0.1, s).astype(np.float32))
        # positive biases would leak into the padding if unmasked
        args = (a((C, Wd)), jnp.abs(a((Wd,))) + 1, a((3, 3, Wd, Wd)),
                jnp.abs(a((Wd,))) + 1, a((Wd, C)), jnp.abs(a((C,))) + 1)
        geom = chain_geometry(H, W, C, Wd, 4, 1, True)
        xp = to_chain_layout(x, geom, 1)
        yp = fused_bottleneck_chained(xp, *args, (H, W, C),
                                      h_tile=geom[0], interpret=True)
        yp = np.asarray(yp)
        mask = np.zeros(yp.shape, bool)
        mask[:, 1:1 + H, 1:1 + W, :C] = True
        assert np.all(yp[~mask] == 0.0), "halo/padding region not zeroed"
