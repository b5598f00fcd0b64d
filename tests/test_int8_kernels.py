import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.ops import int8_kernels as k8
from quantv2x_tpu.quant import quantizer as qz


def _quantize_sym_per_channel(w, bits=8):
    """Symmetric per-output-channel weight quantization."""
    amax = jnp.abs(w).max(axis=0, keepdims=True)
    delta = jnp.maximum(amax / (2 ** (bits - 1) - 1), 1e-8)
    wq = jnp.clip(jnp.round(w / delta), -(2 ** (bits - 1) - 1),
                  2 ** (bits - 1) - 1).astype(jnp.int8)
    return wq, delta[0]


class TestInt8MatmulMath:
    def _setup(self, M=64, K=48, N=40, seed=0):
        rng = jax.random.PRNGKey(seed)
        x = jax.random.normal(rng, (M, K)) * 2.0 + 0.3
        w = jax.random.normal(jax.random.fold_in(rng, 1), (K, N)) * 0.2
        b = jax.random.normal(jax.random.fold_in(rng, 2), (N,))
        dx, zx = qz.init_minmax(x, 8)
        xq = qz.quantize_int(x, dx, zx, 8)
        wq, dw = _quantize_sym_per_channel(w)
        scale = dx * dw
        return x, w, b, xq, wq, zx, scale

    def test_reference_matches_fp_within_quant_error(self):
        x, w, b, xq, wq, zx, scale = self._setup()
        y_fp = x @ w + b
        y_q = k8.int8_matmul_reference(xq, wq, zx, scale, bias=b)
        err = np.abs(np.asarray(y_q - y_fp))
        assert err.mean() < 0.05
        assert np.corrcoef(np.asarray(y_q).ravel(),
                           np.asarray(y_fp).ravel())[0, 1] > 0.999

    def test_relu_and_requant(self):
        x, w, b, xq, wq, zx, scale = self._setup(seed=1)
        y = np.asarray(k8.int8_matmul_reference(xq, wq, zx, scale, bias=b,
                                                relu=True))
        assert y.min() >= 0
        out_delta, out_zp = 0.05, 10.0
        yq = np.asarray(
            k8.int8_matmul_reference(xq, wq, zx, scale, bias=b, relu=True,
                                     out_delta=out_delta, out_zp=out_zp)
        )
        assert yq.min() >= 0 and yq.max() <= 255
        np.testing.assert_allclose(yq, np.round(yq), atol=1e-5)

    def test_pallas_interpret_matches_reference(self):
        x, w, b, xq, wq, zx, scale = self._setup(M=128, K=128, N=128, seed=2)
        y_ref = k8.int8_matmul_reference(xq, wq, zx, scale, bias=b, relu=True,
                                         out_delta=0.04, out_zp=12.0)
        y_pal = k8.int8_matmul_requant(
            xq, wq, zx, scale, bias=b, relu=True, out_delta=0.04, out_zp=12.0,
            interpret=True, tm=64, tn=64, tk=64,
        )
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                                   atol=1.0)  # off-by-one code tolerance
        # and bitwise-close: >99% exact
        exact = (np.asarray(y_pal) == np.asarray(y_ref)).mean()
        assert exact > 0.99

    def test_pallas_interpret_unpadded_shapes(self):
        x, w, b, xq, wq, zx, scale = self._setup(M=100, K=70, N=50, seed=3)
        y_ref = k8.int8_matmul_reference(xq, wq, zx, scale, bias=b)
        y_pal = k8.int8_matmul_requant(
            xq, wq, zx, scale, bias=b, interpret=True, tm=32, tn=32, tk=32,
        )
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-4)


class TestInt8Conv:
    def test_conv_matches_fp_within_quant_error(self):
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (1, 16, 24, 8)) + 0.5
        w = jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 8, 16)) * 0.2
        dx, zx = qz.init_minmax(x, 8)
        xq = qz.quantize_int(x, dx, zx, 8)
        wq, dw = _quantize_sym_per_channel(w.reshape(-1, 16))
        wq = wq.reshape(3, 3, 8, 16)
        y_fp = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC")),
        )
        y_q = k8.int8_conv_requant(xq, wq, zx, dx * dw)
        err = np.abs(np.asarray(y_q - y_fp))
        rel = err.mean() / (np.abs(np.asarray(y_fp)).mean() + 1e-9)
        assert rel < 0.05
        assert np.corrcoef(np.asarray(y_q).ravel(),
                           np.asarray(y_fp).ravel())[0, 1] > 0.999

    def test_conv_stride2(self):
        rng = jax.random.PRNGKey(1)
        x = jnp.abs(jax.random.normal(rng, (1, 16, 16, 4)))
        w = jax.random.normal(jax.random.fold_in(rng, 1), (3, 3, 4, 8)) * 0.3
        dx, zx = qz.init_minmax(x, 8)
        xq = qz.quantize_int(x, dx, zx, 8)
        wq, dw = _quantize_sym_per_channel(w.reshape(-1, 8))
        wq = wq.reshape(3, 3, 4, 8)
        y = k8.int8_conv_requant(xq, wq, zx, dx * dw, strides=(2, 2))
        assert y.shape == (1, 8, 8, 8)


def test_matmul_requant_sub8bit_out():
    """out_bits < 8 must clip to the smaller grid (kernel == reference)."""
    import numpy as np
    from quantv2x_tpu.ops.int8_kernels import (
        int8_matmul_reference, int8_matmul_requant,
    )
    rng = np.random.default_rng(0)
    x_q = jnp.asarray(rng.integers(0, 255, (32, 64)), jnp.int32)
    w_q = jnp.asarray(rng.integers(-127, 127, (64, 16)), jnp.int32)
    scale = jnp.asarray(rng.uniform(1e-4, 1e-3, (16,)), jnp.float32)
    kw = dict(x_zp=3.0, scale=scale, relu=True, out_delta=0.02, out_zp=2.0,
              out_bits=4)
    ref = int8_matmul_reference(x_q, w_q, **kw)
    got = int8_matmul_requant(x_q, w_q, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)
    assert float(ref.max()) <= 15.0
