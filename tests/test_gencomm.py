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


def test_collab_wrapper_stages():
    """GenCommCollabModel: reconstruction path + stage-2 freeze scopes."""
    import optax
    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.data.voxelizer import VoxelCfg
    from quantv2x_tpu.models.collab_model import ModelCfg, PyramidCollabModel
    from quantv2x_tpu.models.gencomm import GenCommCollabModel
    from quantv2x_tpu.train.trainer import OptimCfg, create_train_state

    rng_range = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)
    voxel = VoxelCfg(lidar_range=rng_range, voxel_size=(0.4, 0.4, 4.0),
                     max_points_per_voxel=8, max_voxels=512)
    frame = make_frame(SyntheticCfg(lidar_range=rng_range, num_agents=2,
                                    num_objects=4, points_per_agent=3000,
                                    seed=5))
    batch = frame_to_batch(frame, voxel, max_cav=2)
    base = PyramidCollabModel(ModelCfg(voxel=voxel, max_cav=2),
                              name="base_model")
    cfg = GenCommCfg(channels=64, message_channels=4, timesteps=20,
                     sample_steps=4)
    model = GenCommCollabModel(base_model=base, cfg=cfg)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), batch, OptimCfg(steps_per_epoch=2),
        trainable_predicate=lambda p: p.startswith("gencomm/extractor"),
        init_rngs={"diffusion": jax.random.PRNGKey(7)},
    )
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch, train=False, rngs={"diffusion": jax.random.PRNGKey(1)})
    assert out["pred_feature"].shape == out["gt_feature"].shape
    assert np.isfinite(float(out["ddpm_loss"]))
    assert np.isfinite(np.asarray(out["cls_preds"])).all()

    def loss(p):
        o, _ = model.apply({"params": p, "batch_stats": state.batch_stats},
                           batch, train=True, mutable=["batch_stats"],
                           rngs={"diffusion": jax.random.PRNGKey(2)})
        return o["ddpm_loss"] + ((o["gt_feature"] - o["pred_feature"]) ** 2).mean()

    grads = jax.jit(jax.grad(loss))(state.params)
    up, _ = tx.update(grads, state.opt_state, state.params)
    new = optax.apply_updates(state.params, up)
    # stage-2 freeze: base model and denoiser unchanged, extractor moves
    for a, b in zip(jax.tree.leaves(state.params["base_model"]),
                    jax.tree.leaves(new["base_model"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.params["gencomm"]["denoiser"]),
                    jax.tree.leaves(new["gencomm"]["denoiser"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(jax.tree.leaves(state.params["gencomm"]["extractor"]),
                             jax.tree.leaves(new["gencomm"]["extractor"]))]
    assert any(moved)


def test_enhancer_standalone_and_in_collab():
    """Enhancer (enhancer.py FRFN/Enhancer parity): shape-preserving,
    input-sensitive, and wired into GenCommCollabModel via use_enhancer."""
    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.data.voxelizer import VoxelCfg
    from quantv2x_tpu.models.collab_model import ModelCfg, PyramidCollabModel
    from quantv2x_tpu.models.gencomm import Enhancer, GenCommCollabModel

    enh = Enhancer(window_sizes=(2, 4), num_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 20, 16))
    v = enh.init(jax.random.PRNGKey(1), x)
    y = enh.apply(v, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    y2 = enh.apply(v, x + 1.0)
    assert not np.allclose(np.asarray(y), np.asarray(y2))

    rng_range = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)
    voxel = VoxelCfg(lidar_range=rng_range, voxel_size=(0.4, 0.4, 4.0),
                     max_points_per_voxel=8, max_voxels=512)
    batch = frame_to_batch(
        make_frame(SyntheticCfg(lidar_range=rng_range, num_agents=2,
                                num_objects=4, points_per_agent=3000,
                                seed=6)), voxel, max_cav=2)
    base = PyramidCollabModel(ModelCfg(voxel=voxel, max_cav=2),
                              name="base_model")
    model = GenCommCollabModel(
        base_model=base,
        cfg=GenCommCfg(channels=64, message_channels=4, timesteps=10,
                       sample_steps=3),
        use_enhancer=True)
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0),
         "diffusion": jax.random.PRNGKey(7)}, b, train=False))(batch)
    assert "enhancer" in variables["params"]
    out = model.apply(variables, batch, train=False,
                      rngs={"diffusion": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out["cls_preds"])).all()
