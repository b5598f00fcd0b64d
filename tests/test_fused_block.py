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
