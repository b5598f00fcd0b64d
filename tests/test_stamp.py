import jax
import jax.numpy as jnp
import numpy as np

from quantv2x_tpu.models.stamp import Adapter, Reverter, StampBridge


def test_adapter_reshapes_and_projects():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 24, 32))
    ad = Adapter(out_channels=64, out_hw=(8, 12))
    v = ad.init(jax.random.PRNGKey(1), x)
    y = ad.apply(v, x)
    assert y.shape == (2, 3, 8, 12, 64)
    assert np.isfinite(np.asarray(y)).all()


def test_bridge_cycle_trainable():
    import optax
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 32))
    bridge = StampBridge(protocol_channels=64, local_channels=32)
    v = bridge.init(jax.random.PRNGKey(1), x)
    tx = optax.adam(1e-3)
    params = v["params"]
    opt = tx.init(params)

    @jax.jit
    def step(p, opt):
        def loss(p):
            l, _ = bridge.apply({"params": p}, x, method=bridge.cycle_loss)
            return l
        val, g = jax.value_and_grad(loss)(p)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(p, up), opt, val

    first = None
    for i in range(40):
        params, opt, val = step(params, opt)
        if first is None:
            first = float(val)
    assert float(val) < first * 0.5
