import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.models.layers import ConvBNReLU
from quantv2x_tpu.quant.int8_engine import (
    build_int8_engine,
    fold_conv_bn,
    quantize_weight_sym,
)


def test_bn_fold_exact():
    """Folded conv+bias must equal conv->BN in eval mode."""
    import flax.linen as nn

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 4))
    mod = ConvBNReLU(6, 3, act=False)
    variables = mod.init(rng, x, train=False)
    # give BN non-trivial running stats
    variables = jax.tree.map(lambda v: v, variables)
    bs = {"bn": {"mean": jnp.array([0.1, -0.2, 0.3, 0.0, 0.5, -0.4]),
                 "var": jnp.array([1.2, 0.8, 2.0, 1.0, 0.5, 1.5])}}
    variables = {"params": variables["params"], "batch_stats": bs}
    y_ref = mod.apply(variables, x, train=False)

    w, b = fold_conv_bn(
        variables["params"]["conv"]["kernel"], None,
        variables["params"]["bn"]["scale"], variables["params"]["bn"]["bias"],
        bs["bn"]["mean"], bs["bn"]["var"],
    )
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y_fold = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn
    ) + b
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               atol=2e-5)


def test_weight_sym_quant_error():
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 16)) * 0.3
    wq, delta = quantize_weight_sym(w)
    back = wq.astype(jnp.float32) * delta[None, None, None, :]
    assert float(jnp.abs(back - w).max()) <= float(delta.max()) / 2 + 1e-6


class TestEngineEndToEnd:
    @pytest.fixture(scope="class")
    def setup(self):
        from quantv2x_tpu.data.pipeline import frame_to_batch
        from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
        from quantv2x_tpu.data.voxelizer import VoxelCfg
        from quantv2x_tpu.models.collab_model import ModelCfg, PyramidCollabModel

        rng_range = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)
        voxel = VoxelCfg(lidar_range=rng_range, voxel_size=(0.4, 0.4, 4.0),
                         max_points_per_voxel=8, max_voxels=1024)
        model = PyramidCollabModel(ModelCfg(voxel=voxel, max_cav=2))
        batches = [
            frame_to_batch(
                make_frame(SyntheticCfg(lidar_range=rng_range, num_agents=2,
                                        num_objects=4, points_per_agent=3000,
                                        seed=s)),
                voxel, max_cav=2,
            )
            for s in range(3)
        ]
        variables = model.init(jax.random.PRNGKey(0), batches[0], train=False)
        return model, variables, batches

    def test_engine_tables_cover_conv_units(self, setup):
        model, variables, batches = setup
        tables, _ = build_int8_engine(model, variables, batches[:1])
        assert len(tables) > 20
        assert any("pyramid" in p for p in tables)
        assert any("backbone" in p for p in tables)
        # ResNeXt grouped conv units present
        assert any("conv2" in p for p in tables)

    def test_int8_apply_tracks_fp(self, setup):
        model, variables, batches = setup
        tables, int8_apply = build_int8_engine(model, variables, batches[:2])
        fp = model.apply(variables, batches[2], train=False)
        q = jax.jit(int8_apply)(variables, batches[2])
        a = np.asarray(fp["cls_preds"]).ravel()
        b = np.asarray(q["cls_preds"]).ravel()
        assert np.isfinite(b).all()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.98, f"corr {corr}"
