"""Deformable attention + DETR encoder (parity: sub_modules/ms_deform_attn
.py:30-120, detr_module.py:8-129, stamp adapter.py:353-497)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.ops.deform_attn import (
    DeformableSpatialAttentionLayer,
    DeformableTransformerEncoder,
    MSDeformAttn,
    deformable_attention,
    position_embedding_sine_2d,
    reference_points_2d,
)


def test_deformable_attention_identity_sampling():
    """Weights concentrated on a single point sampling exactly at pixel
    centers must reproduce the value map."""
    rng = np.random.default_rng(0)
    H, W, nH, dph, P = 6, 5, 2, 4, 3
    v = jnp.asarray(rng.normal(size=(1, H, W, nH, dph)), jnp.float32)
    ref = reference_points_2d(H, W)                      # (HW, 2) (x, y)
    loc = jnp.broadcast_to(ref[None, :, None, None, None, :],
                           (1, H * W, nH, 1, P, 2))
    w = jnp.zeros((1, H * W, nH, 1, P)).at[..., 0].set(1.0)
    out = deformable_attention(
        [v], loc, w).reshape(1, H, W, nH * dph)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(v.reshape(1, H, W, nH * dph)),
        atol=1e-5)


def test_deformable_attention_out_of_range_is_zero():
    v = jnp.ones((1, 4, 4, 1, 2))
    loc = jnp.full((1, 1, 1, 1, 1, 2), 5.0)     # way outside [0, 1]
    w = jnp.ones((1, 1, 1, 1, 1))
    out = deformable_attention([v], loc, w)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_msdeform_attn_multilevel_shapes_and_grad():
    rng = jax.random.PRNGKey(0)
    B, Nq, C = 2, 10, 32
    levels = [jnp.ones((B, 8, 8, C)), jnp.ones((B, 4, 4, C))]
    q = jax.random.normal(rng, (B, Nq, C))
    ref = jnp.broadcast_to(
        jnp.array([[0.5, 0.5]]), (B, Nq, 2))[:, :, None, :]
    ref = jnp.broadcast_to(ref, (B, Nq, 2, 2))
    m = MSDeformAttn(d_model=C, n_levels=2, n_heads=4, n_points=2)
    vs = m.init(rng, q, ref, levels)
    out = m.apply(vs, q, ref, levels)
    assert out.shape == (B, Nq, C)
    # grads flow to offsets (through bilinear sampling positions)
    def loss(p):
        return jnp.sum(m.apply({"params": p}, q, ref, levels) ** 2)
    g = jax.grad(loss)(vs["params"])
    gnorm = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.abs(l).sum()), g, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_msdeform_attn_padding_mask_zeroes_values():
    B, C = 1, 8
    lvl = jnp.ones((B, 4, 4, C))
    mask = jnp.ones((B, 4, 4), bool)           # everything padded
    q = jnp.ones((B, 3, C))
    ref = jnp.full((B, 3, 1, 2), 0.5)
    m = MSDeformAttn(d_model=C, n_levels=1, n_heads=2, n_points=2)
    vs = m.init(jax.random.PRNGKey(1), q, ref, [lvl], [mask])
    out = m.apply(vs, q, ref, [lvl], [mask])
    # value fully masked -> only the output bias reaches the output
    b = vs["params"]["output_proj"]["bias"]
    np.testing.assert_allclose(np.asarray(out),
                               np.broadcast_to(b, out.shape), atol=1e-6)


def test_dsa_layer_residual_at_init():
    """attention_weights kernel inits to 0 => uniform weights; with zero
    value map the layer must reduce to the residual (identity)."""
    B, H, W, Cin, Cout = 1, 6, 6, 16, 16
    q = jnp.asarray(np.random.default_rng(2).normal(
        size=(B, H * W, Cout)), jnp.float32)
    v = jnp.zeros((B, H, W, Cin))
    layer = DeformableSpatialAttentionLayer(Cout, n_heads=4, n_points=2)
    vs = layer.init(jax.random.PRNGKey(0), q, v, (H, W))
    out = layer.apply(vs, q, v, (H, W))
    np.testing.assert_allclose(np.asarray(out), np.asarray(q), atol=1e-5)


def test_position_embedding_sine_shapes():
    e = position_embedding_sine_2d(5, 7, 32)
    assert e.shape == (5, 7, 32)
    assert float(jnp.max(jnp.abs(e))) <= 1.0 + 1e-6
    # distinct positions get distinct codes
    assert not np.allclose(np.asarray(e[0, 0]), np.asarray(e[4, 6]))


def test_deformable_transformer_encoder_end_to_end():
    B, C = 1, 16
    levels = [jnp.asarray(np.random.default_rng(3).normal(
        size=(B, 6, 8, C)), jnp.float32),
        jnp.asarray(np.random.default_rng(4).normal(
            size=(B, 3, 4, C)), jnp.float32)]
    enc = DeformableTransformerEncoder(num_layers=2, d_model=C, d_ffn=32,
                                       n_heads=4, n_points=2)
    vs = enc.init(jax.random.PRNGKey(0), levels)
    out = enc.apply(vs, levels)
    assert len(out) == 2
    assert out[0].shape == (B, 6, 8, C) and out[1].shape == (B, 3, 4, C)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
