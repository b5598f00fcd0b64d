"""Tests for CBAM / AutoEncoder / MobileNetV2 / MNASNet / RegNet trunks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.models.backbones_lib import (
    AutoEncoder,
    CBAMBlock,
    ChannelAttention,
    InvertedResidual,
    MNASNetTrunk,
    MobileNetV2Trunk,
    RegNetTrunk,
    SpatialAttention,
)


def _x(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def _run(module, x, **kw):
    v = module.init(jax.random.PRNGKey(0), x, **kw)
    return module.apply(v, x, **kw)


class TestCBAM:
    def test_channel_attention_gates(self):
        x = _x((2, 8, 8, 32))
        y = _run(ChannelAttention(), x)
        assert y.shape == x.shape
        # gate in (0,1): |y| <= |x| elementwise
        assert (np.abs(np.asarray(y)) <= np.abs(np.asarray(x)) + 1e-6).all()

    def test_spatial_attention_gates(self):
        x = _x((2, 8, 8, 16))
        y = _run(SpatialAttention(), x)
        assert y.shape == x.shape
        assert (np.abs(np.asarray(y)) <= np.abs(np.asarray(x)) + 1e-6).all()

    def test_block_stride_and_projection(self):
        x = _x((1, 16, 16, 8))
        y = _run(CBAMBlock(features=24, strides=2), x, train=False)
        assert y.shape == (1, 8, 8, 24)
        assert np.isfinite(np.asarray(y)).all()


class TestAutoEncoder:
    def test_roundtrip_shape(self):
        x = _x((1, 16, 16, 32))
        ae = AutoEncoder(feature_num=32, layer_num=2)
        y = _run(ae, x, train=False)
        assert y.shape == x.shape

    def test_bottleneck_compression(self):
        x = _x((1, 16, 16, 32))
        ae = AutoEncoder(feature_num=32, layer_num=2)
        v = ae.init(jax.random.PRNGKey(0), x, train=False)
        z = ae.apply(v, x, train=False, method=ae.encode)
        # 2 layers: spatial /4, channels /4 -> 64x compression
        assert z.shape == (1, 4, 4, 8)


class TestTrunks:
    @pytest.mark.parametrize("cls", [MobileNetV2Trunk, MNASNetTrunk,
                                     RegNetTrunk])
    def test_stride2_bev_output(self, cls):
        x = _x((1, 32, 32, 10))
        y = _run(cls(out_channels=48), x, train=False)
        assert y.shape == (1, 16, 16, 48)
        assert np.isfinite(np.asarray(y)).all()

    def test_inverted_residual_skip(self):
        x = _x((1, 8, 8, 16))
        y = _run(InvertedResidual(features=16, strides=1), x, train=False)
        assert y.shape == x.shape
        y2 = _run(InvertedResidual(features=24, strides=2), x, train=False)
        assert y2.shape == (1, 4, 4, 24)
