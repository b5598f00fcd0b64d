import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.models.transformer_fusion import CoBEVTFusion, V2XViTFusion

B, L, H, W, C = 2, 3, 16, 16, 32


@pytest.fixture(scope="module")
def inputs():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, H, W, C))
    # zero out padded agents' features like the real pipeline does
    mask = jnp.array([[True, True, False], [True, False, False]])
    x = jnp.where(mask[:, :, None, None, None], x, 0.0)
    eye = jnp.broadcast_to(
        jnp.array([[1.0, 0, 0], [0, 1.0, 0]]), (B, L, L, 2, 3)
    )
    return x, mask, eye


@pytest.mark.parametrize("cls", [V2XViTFusion, CoBEVTFusion])
def test_shapes_and_finiteness(inputs, cls):
    x, mask, affine = inputs
    mod = cls(C)
    variables = mod.init(jax.random.PRNGKey(1), x, mask, affine)
    out = mod.apply(variables, x, mask, affine)
    assert out.shape == (B, H, W, C)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("cls", [V2XViTFusion, CoBEVTFusion])
def test_padding_invariance(inputs, cls):
    x, mask, affine = inputs
    mod = cls(C)
    variables = mod.init(jax.random.PRNGKey(1), x, mask, affine)
    out1 = mod.apply(variables, x, mask, affine)
    x2 = x.at[:, 2].set(7.0).at[1, 1].set(-3.0)
    out2 = mod.apply(variables, x2, mask, affine)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=2e-5)


def test_v2xvit_gradients_flow(inputs):
    x, mask, affine = inputs
    mod = V2XViTFusion(C, depth=1)
    variables = mod.init(jax.random.PRNGKey(1), x, mask, affine)

    def loss(params):
        return jnp.sum(mod.apply({"params": params}, x, mask, affine) ** 2)

    g = jax.grad(loss)(variables["params"])
    gmax = max(float(jnp.abs(v).max()) for v in jax.tree.leaves(g))
    assert np.isfinite(gmax) and gmax > 0
