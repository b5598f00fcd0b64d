import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.models.codebook import CodebookCompressor, UMGMCodebook


@pytest.fixture(scope="module")
def cb():
    model = UMGMCodebook(channel=16, seg_num=2, dict_sizes=(32, 32, 32))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 16))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(2)},
        x, train=True,
    )
    return model, variables, x


def test_encode_decode_shapes(cb):
    model, variables, x = cb
    codes = model.apply(variables, x, method=model.encode)
    assert codes.shape == (64, 3, 2)
    assert codes.dtype == jnp.int32
    assert int(codes.max()) < 32 and int(codes.min()) >= 0
    y = model.apply(variables, codes, method=model.decode)
    assert y.shape == x.shape


def test_eval_call_matches_encode_decode(cb):
    model, variables, x = cb
    y_call, codes_call, loss = model.apply(variables, x, train=False)
    codes = model.apply(variables, x, method=model.encode)
    y = model.apply(variables, codes, method=model.decode)
    np.testing.assert_allclose(np.asarray(y_call), np.asarray(y), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(codes_call), np.asarray(codes))
    assert float(loss) == 0.0


def test_train_updates_freq_and_has_gradient(cb):
    model, variables, x = cb

    def loss_fn(params):
        (restored, codes, code_loss), mut = model.apply(
            {"params": params, "codebook_stats": variables["codebook_stats"]},
            x, train=True,
            rngs={"gumbel": jax.random.PRNGKey(5)},
            mutable=["codebook_stats"],
        )
        return code_loss + jnp.mean(restored ** 2), mut

    (val, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(val))
    # codebooks must receive gradients through the straight-through estimator
    g = grads["level0"]["codebook"]
    assert float(jnp.abs(g).max()) > 0
    # freq EMA moved away from uniform
    f = np.asarray(mut["codebook_stats"]["freq_ema_0"])
    assert not np.allclose(f, f[0, 0])


def test_training_reduces_reconstruction_error(cb):
    """A few adam steps on the codebook should fit a small fixed batch."""
    import optax

    model, variables, x = cb
    tx = optax.adam(3e-3)
    params = variables["params"]
    stats = variables["codebook_stats"]
    opt = tx.init(params)

    def loss_fn(p, stats, rng):
        (restored, _, code_loss), mut = model.apply(
            {"params": p, "codebook_stats": stats}, x, train=True,
            rngs={"gumbel": rng}, mutable=["codebook_stats"],
        )
        recon = jnp.mean((restored - x) ** 2)
        return recon + code_loss, (mut["codebook_stats"], recon)

    @jax.jit
    def step(p, stats, opt, rng):
        (_, (stats2, recon)), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, stats, rng
        )
        up, opt2 = tx.update(g, opt, p)
        return optax.apply_updates(p, up), stats2, opt2, recon

    first = None
    for i in range(150):
        params, stats, opt, recon = step(
            params, stats, opt, jax.random.PRNGKey(i)
        )
        if first is None:
            first = float(recon)
    assert float(recon) < first * 0.7


def test_compressor_adapter_shapes():
    comp = CodebookCompressor(channel=8, seg_num=2, dict_sizes=(16, 16, 16))
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 4, 6, 8))
    variables = comp.init(
        {"params": jax.random.PRNGKey(1), "gumbel": jax.random.PRNGKey(2)},
        feats, train=True,
    )
    out, aux = comp.apply(variables, feats, train=False)
    assert out.shape == feats.shape
    assert aux["codebook_codes"].shape == (2, 2, 4, 6, 3 * 2)


def test_bits_per_vector():
    model = UMGMCodebook(channel=64, seg_num=2, dict_sizes=(256, 256, 256))
    assert model.bits_per_vector == 3 * 2 * 8  # 48 bits (BASELINE.md)
