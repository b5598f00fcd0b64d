import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.quant import quantizer as qz
from quantv2x_tpu.quant.ptq import PTQConfig, ptq_calibrate


class TestQuantizerMath:
    def test_fake_quant_roundtrip_exact_grid(self):
        delta, zp = jnp.float32(0.1), jnp.float32(5.0)
        x = (jnp.arange(10, dtype=jnp.float32) - 5) * 0.1
        y = qz.fake_quant(x, delta, zp, 8)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    def test_quant_error_bounded_by_half_delta(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1000,))
        delta, zp = qz.init_minmax(x, 8)
        y = qz.fake_quant(x, delta, zp, 8)
        assert float(jnp.abs(y - x).max()) <= float(delta) / 2 + 1e-6

    def test_per_channel_beats_per_tensor(self):
        # one channel 100x larger: per-channel must quantize better
        rng = jax.random.PRNGKey(1)
        w = jax.random.normal(rng, (3, 3, 8, 16))
        w = w.at[..., 0].mul(100.0)
        d_t, z_t = qz.init_minmax(w, 8)
        d_c, z_c = qz.init_minmax(w, 8, per_channel_axis=3)
        err_t = float(jnp.mean((qz.fake_quant(w, d_t, z_t, 8) - w) ** 2))
        err_c = float(jnp.mean((qz.fake_quant(w, d_c, z_c, 8) - w) ** 2))
        assert err_c < err_t / 10

    def test_mse_beats_minmax_on_outliers(self):
        rng = jax.random.PRNGKey(2)
        x = jax.random.normal(rng, (4096,))
        x = x.at[0].set(80.0)  # single huge outlier
        d_mm, z_mm = qz.init_minmax(x, 8)
        d_ms, z_ms = qz.init_mse(x, 8)
        e_mm = float(jnp.mean(jnp.abs(qz.fake_quant(x, d_mm, z_mm, 8) - x) ** 2.4))
        e_ms = float(jnp.mean(jnp.abs(qz.fake_quant(x, d_ms, z_ms, 8) - x) ** 2.4))
        assert e_ms < e_mm

    def test_int_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (64,))
        delta, zp = qz.init_minmax(x, 8)
        xi = qz.quantize_int(x, delta, zp, 8)
        assert xi.dtype == jnp.uint8
        y = qz.dequantize_int(xi, delta, zp)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(qz.fake_quant(x, delta, zp, 8)), atol=1e-6
        )

    def test_ste_gradient(self):
        f = lambda x: qz.fake_quant(x, jnp.float32(0.1), jnp.float32(0.0), 8).sum()
        g = jax.grad(f)(jnp.array([0.33]))
        np.testing.assert_allclose(np.asarray(g), [1.0], atol=1e-6)


class TestEndToEndPTQ:
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

    def test_ptq_preserves_predictions_approximately(self, setup):
        model, variables, batches = setup
        qvars, act_scales, qapply = ptq_calibrate(
            model, variables, batches[:2]
        )
        fp = model.apply(variables, batches[2], train=False)
        q = qapply(qvars, act_scales, batches[2])
        fp_cls = np.asarray(fp["cls_preds"])
        q_cls = np.asarray(q["cls_preds"])
        # W8A8 should track FP closely on in-distribution data
        err = np.abs(fp_cls - q_cls).mean()
        ref = np.abs(fp_cls).mean() + 1e-6
        assert err / ref < 0.25, f"relative error {err/ref:.3f} too high"
        corr = np.corrcoef(fp_cls.ravel(), q_cls.ravel())[0, 1]
        assert corr > 0.99

    def test_act_scales_cover_units(self, setup):
        model, variables, batches = setup
        qvars, act_scales, qapply = ptq_calibrate(model, variables, batches[:1])
        paths = list(act_scales)
        # encoder, backbone, pyramid, shrink units observed
        assert any("vfe" in p for p in paths)
        assert any("backbone" in p for p in paths)
        assert any("pyramid" in p for p in paths)
        assert any("shrink" in p for p in paths)
        # detection heads NOT act-quantized
        assert not any("cls_head" in p or "reg_head" in p or "dir_head" in p
                       for p in paths)

    def test_weight_scales_skip_codebook(self, setup):
        from quantv2x_tpu.quant.ptq import quantize_weights

        model, variables, batches = setup
        _, scales = quantize_weights(variables["params"])
        assert len(scales) > 20
        assert not any("codebook" in p for p in scales)


def test_entropy_init_clips_outliers():
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (8192,))
    x = x.at[0].set(60.0)
    d_e, zp_e = qz.init_entropy(x, 8)
    d_m, _ = qz.init_minmax(x, 8)
    # entropy calibration must choose a much tighter range than minmax
    assert float(d_e) < float(d_m) * 0.5


class TestHistogramObserver:
    """Histogram observer (PTQConfig.observer='histogram'): O(N)
    scatter-add percentile/entropy clips (parity quant_layer.py:273-319)."""

    def test_percentile_matches_quantile(self):
        import numpy as np
        from quantv2x_tpu.quant.ptq import (_percentile_clip_from_hist)
        rng = np.random.default_rng(0)
        x = rng.normal(0, 1, 200000).astype(np.float32)
        lo, hi = float(x.min()), float(x.max())
        counts, _ = np.histogram(x, bins=512, range=(lo, hi))
        clo, chi = _percentile_clip_from_hist(counts, lo, hi, 0.999)
        qlo, qhi = np.quantile(x, [0.001, 0.999])
        width = (hi - lo) / 512
        assert abs(clo - qlo) < 2 * width and abs(chi - qhi) < 2 * width

    def test_entropy_clip_tightens_outliers(self):
        import numpy as np
        from quantv2x_tpu.quant.ptq import _entropy_clip_from_hist
        rng = np.random.default_rng(1)
        x = np.concatenate([rng.normal(0, 1, 100000),
                            np.array([80.0])]).astype(np.float32)
        lo, hi = float(x.min()), float(x.max())
        counts, _ = np.histogram(x, bins=512, range=(lo, hi))
        _, chi = _entropy_clip_from_hist(counts, lo, hi, 8)
        assert chi < 0.5 * hi     # the lone outlier gets clipped away

    def test_ptq_calibrate_histogram_backend(self):
        import dataclasses
        import jax
        import jax.numpy as jnp
        import numpy as np
        from quantv2x_tpu.quant import ptq as ptq_mod
        import flax.linen as nn
        from quantv2x_tpu.models.layers import ConvBNReLU

        class M(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                x = ConvBNReLU(8, 3, name="c1")(x, train)
                return ConvBNReLU(8, 3, name="c2")(x, train)

        m = M()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        cfg = ptq_mod.PTQConfig(observer="histogram", hist_bins=256)
        qv, scales, qapply = ptq_mod.ptq_calibrate(m, v, [x], cfg)
        assert set(scales) == {"c1", "c2"}
        y = qapply(qv, scales, x)
        yf = m.apply(v, x, train=False)
        corr = np.corrcoef(np.asarray(y).ravel(),
                           np.asarray(yf).ravel())[0, 1]
        assert corr > 0.99
