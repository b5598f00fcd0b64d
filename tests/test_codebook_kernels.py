"""Fused codebook wire kernels (ops/codebook_kernels.py) vs the flax
UMGMCodebook reference path (models/codebook.py).

The fused kernels must reproduce the flax encode/decode semantics
(reference parity chain: opencood/models/sub_modules/codebook.py:330-343)
— exactly in f32, and within bf16 rounding (rare distance ties may flip
codes) in the model compute dtype.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.models.codebook import CodebookCompressor, UMGMCodebook


def _pair(dtype, channel=64, seg=2, dicts=(256, 256, 256)):
    ref = UMGMCodebook(channel=channel, seg_num=seg, dict_sizes=dicts,
                       dtype=dtype, use_fused="never")
    fus = UMGMCodebook(channel=channel, seg_num=seg, dict_sizes=dicts,
                       dtype=dtype, use_fused="always")
    x = jax.random.normal(jax.random.PRNGKey(1), (2000, channel),
                          jnp.float32)
    variables = ref.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(2)},
        x[:16], train=True)
    return ref, fus, variables, x.astype(dtype)


def test_fused_encode_exact_f32():
    ref, fus, variables, x = _pair(jnp.float32)
    codes_ref = ref.apply(variables, x, method="encode")
    codes_fus = fus.apply(variables, x, method="encode")
    assert codes_fus.shape == codes_ref.shape == (x.shape[0], 3, 2)
    np.testing.assert_array_equal(np.asarray(codes_ref),
                                  np.asarray(codes_fus))


def test_fused_decode_exact_f32():
    ref, fus, variables, x = _pair(jnp.float32)
    codes = ref.apply(variables, x, method="encode")
    dec_ref = ref.apply(variables, codes, method="decode")
    dec_fus = fus.apply(variables, codes, method="decode")
    np.testing.assert_allclose(np.asarray(dec_ref), np.asarray(dec_fus),
                               atol=1e-5, rtol=1e-5)


def test_fused_bf16_parity():
    ref, fus, variables, x = _pair(jnp.bfloat16)
    codes_ref = ref.apply(variables, x, method="encode")
    codes_fus = fus.apply(variables, x, method="encode")
    match = float((np.asarray(codes_ref) == np.asarray(codes_fus)).mean())
    assert match > 0.98, match           # bf16 distance ties only
    dec_ref = ref.apply(variables, codes_ref, method="decode")
    dec_fus = fus.apply(variables, codes_ref, method="decode")
    err = np.max(np.abs(np.asarray(dec_ref, np.float32)
                        - np.asarray(dec_fus, np.float32)))
    scale = np.max(np.abs(np.asarray(dec_ref, np.float32)))
    assert err < 0.05 * max(scale, 1.0), (err, scale)


def test_auto_threshold_uses_flax_path_for_small_n():
    # below _FUSED_MIN_ROWS "auto" must match the flax path bit-for-bit
    auto = UMGMCodebook(channel=64, dtype=jnp.float32, use_fused="auto")
    never = UMGMCodebook(channel=64, dtype=jnp.float32, use_fused="never")
    x = jax.random.normal(jax.random.PRNGKey(3), (64, 64))
    variables = never.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(2)},
        x[:8], train=True)
    np.testing.assert_array_equal(
        np.asarray(auto.apply(variables, x, method="encode")),
        np.asarray(never.apply(variables, x, method="encode")))


def test_compressor_roundtrip_with_fused():
    comp = CodebookCompressor(channel=64, dtype=jnp.float32)
    feats = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 40, 40, 64))
    variables = comp.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(2)},
        feats, train=True)
    out, aux = comp.apply(variables, feats, train=False)
    assert out.shape == feats.shape
    assert aux["codebook_codes"].shape == (1, 2, 40, 40, 6)
    # restored features correlate with the input (learned-free sanity)
    assert np.isfinite(np.asarray(out)).all()
