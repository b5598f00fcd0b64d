"""Tests for the TPU-native deformable convolution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.ops.deform_conv import DeformableConv2d, bilinear_sample_nhwc


class TestBilinearSample:
    def test_exact_at_integer_positions(self):
        x = jnp.arange(12, dtype=jnp.float32).reshape(3, 4, 1)
        v = bilinear_sample_nhwc(x, jnp.array([1.0]), jnp.array([2.0]))
        assert float(v[0, 0]) == 6.0

    def test_midpoint(self):
        x = jnp.zeros((2, 2, 1)).at[0, 0, 0].set(2.0).at[1, 0, 0].set(4.0)
        v = bilinear_sample_nhwc(x, jnp.array([0.5]), jnp.array([0.0]))
        assert float(v[0, 0]) == pytest.approx(3.0)

    def test_outside_zero(self):
        x = jnp.ones((2, 2, 1))
        v = bilinear_sample_nhwc(x, jnp.array([-5.0]), jnp.array([0.0]))
        assert float(v[0, 0]) == 0.0


class TestDeformableConv:
    def test_zero_offsets_equal_regular_conv(self):
        """With the offset head at its zero init, the deformable conv must
        reproduce an ordinary 3x3 convolution with the same kernel."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
        m = DeformableConv2d(6)
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)

        k = np.asarray(v["params"]["kernel"]).reshape(3, 3, 4, 6)
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        ref = jax.lax.conv_general_dilated(
            x, jnp.asarray(k), (1, 1), "SAME", dimension_numbers=dn
        ) + v["params"]["bias"]
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_offsets_receive_gradient(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 6, 6, 3)).astype(np.float32))
        m = DeformableConv2d(4)
        v = m.init(jax.random.PRNGKey(0), x)

        def loss(params):
            return (m.apply({"params": params}, x) ** 2).sum()

        g = jax.grad(loss)(v["params"])
        assert float(jnp.abs(g["offset"]["kernel"]).sum()) > 0

    def test_stamp_deformable_block(self):
        from quantv2x_tpu.models.stamp import ConvNextBlock

        x = jnp.asarray(np.random.default_rng(2).normal(
            size=(1, 8, 8, 8)).astype(np.float32))
        blk = ConvNextBlock(8, deformable=True)
        v = blk.init(jax.random.PRNGKey(0), x)
        y = blk.apply(v, x)
        assert y.shape == x.shape
        assert "dw_deform" in v["params"]
