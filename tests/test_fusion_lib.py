import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.models import fusion_lib as fl

B, L, H, W, C = 2, 3, 16, 24, 8


@pytest.fixture(scope="module")
def inputs():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, L, H, W, C))
    agent_mask = jnp.array([[True, True, False], [True, False, False]])
    eye = jnp.broadcast_to(
        jnp.array([[1.0, 0, 0], [0, 1.0, 0]]), (B, L, L, 2, 3)
    )
    return x, agent_mask, eye


@pytest.mark.parametrize("name", list(fl.FUSION_REGISTRY))
def test_fusion_shapes_and_finiteness(inputs, name):
    x, mask, affine = inputs
    cls = fl.FUSION_REGISTRY[name]
    mod = cls(C) if name != "max" and name != "f_cooper" else cls()
    variables = mod.init(jax.random.PRNGKey(1), x, mask, affine)
    out = mod.apply(variables, x, mask, affine)
    assert out.shape == (B, H, W, C)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("name", ["max", "att", "disconet", "where2comm"])
def test_padding_invariance(inputs, name):
    """Changing features of masked agents must not change the output."""
    x, mask, affine = inputs
    cls = fl.FUSION_REGISTRY[name]
    mod = cls(C) if name != "max" else cls()
    variables = mod.init(jax.random.PRNGKey(1), x, mask, affine)
    out1 = mod.apply(variables, x, mask, affine)
    x2 = x.at[:, 2].set(99.0).at[1, 1].set(-55.0)
    out2 = mod.apply(variables, x2, mask, affine)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_max_fusion_identity_matches_max(inputs):
    x, mask, affine = inputs
    mod = fl.MaxFusion()
    variables = mod.init(jax.random.PRNGKey(0), x, mask, affine)
    out = np.asarray(mod.apply(variables, x, mask, affine))
    # batch 0 has agents 0,1 valid with identity transforms
    expect = np.maximum(np.asarray(x[0, 0]), np.asarray(x[0, 1]))
    np.testing.assert_allclose(out[0], expect, atol=1e-5)
    # batch 1: single agent -> passthrough
    np.testing.assert_allclose(out[1], np.asarray(x[1, 0]), atol=1e-5)


def test_att_single_agent_passthrough(inputs):
    x, mask, affine = inputs
    mod = fl.AttFusion(C)
    variables = mod.init(jax.random.PRNGKey(0), x, mask, affine)
    out = np.asarray(mod.apply(variables, x, mask, affine))
    # batch 1 has only the ego agent: attention over a single key = identity
    np.testing.assert_allclose(out[1], np.asarray(x[1, 0]), atol=1e-4)
