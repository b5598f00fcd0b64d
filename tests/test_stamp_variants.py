"""STAMP adapter variant family (parity: stamp_modules/adapter.py:93-856:
identity/conv/fc/convnext/att/dsa + the Adapter(args) dispatcher)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.models.stamp import (
    AdapterGeom, StampBridge, build_adapter,
)


def _spec(method, in_ch=8, out_ch=8, in_shape=(10, 16), out_shape=(10, 16),
          in_range=(-51.2, -25.6, -3, 51.2, 25.6, 1),
          out_range=(-51.2, -25.6, -3, 51.2, 25.6, 1), sub=None):
    return {
        "core_method": method,
        "args": {
            "in_channels": in_ch, "out_channels": out_ch,
            "in_cav_lidar_range": list(in_range),
            "out_cav_lidar_range": list(out_range),
            "in_feature_shape": list(in_shape),
            "out_feature_shape": list(out_shape),
            "submodule_args": sub or {},
        },
    }


ALL = ["identity", "adapterconv", "adapterfc", "adapterconvnext",
       "adapteratt", "adapterdsa"]


@pytest.mark.parametrize("method", ALL)
def test_variant_same_geometry_shapes(method):
    sub = {"patch_size": 4, "depth": 1} if method == "adapteratt" else (
        {"n_layers": 1, "num_heads": 2, "num_points": 2}
        if method == "adapterdsa" else {"depth": 1})
    m = build_adapter(_spec(method, sub=sub))
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 10, 16, 8)), jnp.float32)
    vs = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vs, x)
    assert y.shape == (2, 10, 16, 8)
    assert np.isfinite(np.asarray(y)).all()


def test_identity_passthrough_same_space():
    m = build_adapter(_spec("identity"))
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 10, 16, 8)), jnp.float32)
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_geometry_pad_smaller_to_larger_range():
    """in covers ±25.6 m at 64 px, out covers ±51.2 m at 128 px: same
    meters/pixel, so the map embeds centered with zero padding around."""
    geom_spec = _spec(
        "identity", in_shape=(32, 64), out_shape=(64, 128),
        in_range=(-25.6, -12.8, -3, 25.6, 12.8, 1),
        out_range=(-51.2, -25.6, -3, 51.2, 25.6, 1))
    m = build_adapter(geom_spec)
    x = jnp.ones((1, 32, 64, 8))
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 64, 128, 8)
    # center block is the input, border is zeros
    np.testing.assert_allclose(np.asarray(y[0, 16:48, 32:96, 0]), 1.0)
    assert float(y[0, :16].sum()) == 0.0 and float(y[0, 48:].sum()) == 0.0
    assert float(y[0, :, :32].sum()) == 0.0
    assert float(y[0, :, 96:].sum()) == 0.0


def test_geometry_resize_resolution_mismatch():
    """Same range, half the pixels: feat_ratio 2 upsamples to the
    protocol grid."""
    m = build_adapter(_spec("adapterconv", in_shape=(5, 8),
                            out_shape=(10, 16)))
    x = jnp.ones((1, 5, 8, 8))
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 10, 16, 8)


def test_fc_is_position_dependent():
    m = build_adapter(_spec("adapterfc", in_shape=(4, 4), out_shape=(4, 4)))
    x = jnp.ones((1, 4, 4, 8))
    vs = m.init(jax.random.PRNGKey(3), x)
    y = np.asarray(m.apply(vs, x))
    # per-pixel weights: constant input need not give constant output
    assert not np.allclose(y[0, 0, 0], y[0, 3, 3])


def test_dispatcher_rejects_unknown():
    with pytest.raises(ValueError, match="unknown adapter"):
        build_adapter({"core_method": "nope", "args": {}})


def test_bridge_with_variant_specs_multiagent():
    """StampBridge accepts hypes-style specs and handles (B, L, H, W, C)."""
    spec_a = _spec("adapterconv", in_ch=8, out_ch=12)
    spec_r = _spec("adapterconv", in_ch=12, out_ch=8)
    bridge = StampBridge(protocol_channels=12, local_channels=8,
                         adapter_spec=spec_a, reverter_spec=spec_r)
    x = jnp.asarray(np.random.default_rng(4).normal(
        size=(2, 3, 10, 16, 8)), jnp.float32)
    vs = bridge.init(jax.random.PRNGKey(0), x)
    protocol, restored = bridge.apply(vs, x)
    assert protocol.shape == (2, 3, 10, 16, 12)
    assert restored.shape == (2, 3, 10, 16, 8)


def test_variants_are_trainable():
    m = build_adapter(_spec("adapterdsa",
                            sub={"n_layers": 1, "num_heads": 2,
                                 "num_points": 2}))
    x = jnp.asarray(np.random.default_rng(5).normal(
        size=(1, 10, 16, 8)), jnp.float32)
    tgt = jnp.zeros((1, 10, 16, 8))
    vs = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.mean((m.apply({"params": p}, x) - tgt) ** 2)

    g = jax.grad(loss)(vs["params"])
    gnorm = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.abs(l).sum()), g, 0.0)
    assert np.isfinite(gnorm) and gnorm > 0
