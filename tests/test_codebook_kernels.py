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


def test_fused_encode_decode_wide_wire_configs():
    """RD-sweep wire shapes beyond the default 2x3: seg_num*levels can
    exceed the 8-column int32 tile (4x3 = 12 codes) and seg_num=1 / 2
    levels must also round-trip (r5 sweep configs)."""
    for seg, dicts in ((4, (64,) * 3), (1, (64,) * 3), (2, (64,) * 2)):
        ref, fus, variables, x = _pair(jnp.float32, seg=seg, dicts=dicts)
        codes_ref = ref.apply(variables, x, method="encode")
        codes_fus = fus.apply(variables, x, method="encode")
        assert codes_fus.shape == (x.shape[0], len(dicts), seg)
        np.testing.assert_array_equal(np.asarray(codes_ref),
                                      np.asarray(codes_fus))
        dec_ref = ref.apply(variables, codes_ref, method="decode")
        dec_fus = fus.apply(variables, codes_ref, method="decode")
        np.testing.assert_allclose(np.asarray(dec_ref),
                                   np.asarray(dec_fus),
                                   atol=1e-5, rtol=1e-5)


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


def test_soft_roundtrip_pure_matches_module_path():
    """The scope-free train forward (soft_roundtrip_pure, used under
    lax.map+checkpoint) must match the flax submodule soft path bit for
    bit given the same rng."""
    from quantv2x_tpu.models.codebook import soft_roundtrip_pure

    cb = UMGMCodebook(channel=64, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(5), (256, 64))
    variables = cb.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(2)},
        x[:8], train=True)
    rng = jax.random.PRNGKey(9)

    def module_path(mdl, xx):
        return mdl._module_soft_chunk(xx, rng)

    fm, cm, sqm, cntm = cb.apply(variables, x, method=module_path)
    fp, cp, sqp, cntp = soft_roundtrip_pure(
        variables["params"], 2, (256, 256, 256), x, rng,
        jnp.ones((x.shape[0],), bool), jnp.float32)
    np.testing.assert_allclose(np.asarray(fm), np.asarray(fp),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(cp))
    np.testing.assert_allclose(float(sqm), float(sqp), rtol=1e-5)
    for a, b in zip(cntm, cntp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-5)


def test_chunked_train_forward_grads_and_loss():
    """Chunked (lax.map + checkpoint) train forward: loss matches the
    single-chunk path and gradients flow to every level's params."""
    cb_small = UMGMCodebook(channel=64, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(6), (300, 64))
    variables = cb_small.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(2)},
        x[:8], train=True)

    chunked = UMGMCodebook(channel=64, dtype=jnp.float32)
    chunked._TRAIN_CHUNK_ROWS  # class attr; patch via subclassing instead

    class Tiny(UMGMCodebook):
        _TRAIN_CHUNK_ROWS = 128   # forces 3 chunks (two padded rows masked)

    tiny = Tiny(channel=64, dtype=jnp.float32)

    def loss(params, model):
        out, _, code_loss = model.apply(
            {**variables, "params": params}, x, train=True,
            rngs={"gumbel": jax.random.PRNGKey(3)},
            mutable=["codebook_stats"])[0]
        return code_loss

    l1 = float(loss(variables["params"], cb_small))
    l2 = float(loss(variables["params"], tiny))
    # same loss definition; rng folding differs per chunk so allow slack
    assert np.isfinite(l1) and np.isfinite(l2)
    assert abs(l1 - l2) / max(abs(l1), 1e-6) < 0.5, (l1, l2)

    g = jax.grad(lambda p: loss(p, tiny))(variables["params"])
    leaves = jax.tree_util.tree_leaves_with_path(g)
    nz = {jax.tree_util.keystr(p): float(jnp.abs(v).sum())
          for p, v in leaves}
    for lvl in ("level0", "level1", "level2"):
        tot = sum(v for k, v in nz.items() if lvl in k)
        assert np.isfinite(tot) and tot > 0, (lvl, tot)
