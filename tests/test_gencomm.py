import jax
import jax.numpy as jnp
import numpy as np

from quantv2x_tpu.models.gencomm import GenComm, GenCommCfg


def _setup():
    cfg = GenCommCfg(channels=16, message_channels=4, timesteps=20,
                     sample_steps=5)
    gc = GenComm(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
    variables = gc.init(jax.random.PRNGKey(1), feats, jax.random.PRNGKey(2))
    return cfg, gc, feats, variables


def test_extract_and_loss():
    cfg, gc, feats, variables = _setup()
    msg = gc.apply(variables, feats, method=gc.extract)
    assert msg.shape == (2, 8, 8, 4)
    loss = gc.apply(variables, feats, msg, jax.random.PRNGKey(3), False,
                    method=gc.denoise_loss)
    assert np.isfinite(float(loss))


def test_generate_shapes_and_missing_message():
    cfg, gc, feats, variables = _setup()
    msg = gc.apply(variables, feats, method=gc.extract)
    out = gc.apply(variables, msg, feats.shape, jax.random.PRNGKey(4),
                   method=gc.generate)
    assert out.shape == feats.shape
    assert np.isfinite(np.asarray(out)).all()
    out2 = gc.apply(variables, msg, feats.shape, jax.random.PRNGKey(4),
                    False, method=gc.generate)
    # unconditional generation differs from conditioned
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_denoiser_trains():
    import optax
    cfg, gc, feats, variables = _setup()
    msg = gc.apply(variables, feats, method=gc.extract)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, bs, opt, rng):
        def loss(p):
            out, mut = gc.apply(
                {"params": p, "batch_stats": bs}, feats, msg, rng, True,
                method=gc.denoise_loss, mutable=["batch_stats"],
            )
            return out, mut["batch_stats"]
        (val, bs2), g = jax.value_and_grad(loss, has_aux=True)(p)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(p, up), bs2, opt, val

    first = None
    for i in range(30):
        params, bs, opt, val = step(params, bs, opt, jax.random.PRNGKey(i))
        if first is None:
            first = float(val)
    assert float(val) < first
