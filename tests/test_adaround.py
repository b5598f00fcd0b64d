import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.quant import adaround as ar
from quantv2x_tpu.quant.quantizer import init_minmax


class TestAdaRoundMath:
    def test_alpha_init_matches_remainder(self):
        w = jnp.array([0.17, -0.42, 1.06])
        delta = jnp.float32(0.1)
        alpha = ar.alpha_init(w, delta)
        h = ar.rect_sigmoid(alpha)
        rest = w / delta - jnp.floor(w / delta)
        np.testing.assert_allclose(np.asarray(h), np.asarray(rest), atol=1e-3)

    def test_soft_equals_fp_at_init(self):
        """With alpha at init, soft AdaRound reproduces the FP weight
        (up to one-delta clipping at the range edges, where zero-point
        rounding can push the extreme code past 2^b - 1)."""
        w = jax.random.normal(jax.random.PRNGKey(0), (32,))
        delta, zp = init_minmax(w, 8)
        alpha = ar.alpha_init(w, delta)
        wq = ar.adaround_weight(w, delta, zp, 8, alpha, hard=False)
        err = np.abs(np.asarray(wq - w))
        assert err.max() <= float(delta) + 1e-6
        interior = np.asarray(
            (w > w.min() + 2 * delta) & (w < w.max() - 2 * delta)
        )
        np.testing.assert_allclose(np.asarray(wq)[interior],
                                   np.asarray(w)[interior], atol=2e-3)

    def test_hard_rounding_on_grid(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (64,))
        delta, zp = init_minmax(w, 8)
        alpha = ar.alpha_init(w, delta)
        wq = ar.adaround_weight(w, delta, zp, 8, alpha, hard=True)
        codes = np.asarray(wq / delta + zp)
        np.testing.assert_allclose(codes, np.round(codes), atol=1e-4)

    def test_round_loss_zero_at_binary(self):
        alpha_hi = jnp.full((8,), 10.0)   # h = 1
        alpha_lo = jnp.full((8,), -10.0)  # h = 0
        assert float(ar.round_loss(alpha_hi, 2.0)) < 1e-5
        assert float(ar.round_loss(alpha_lo, 2.0)) < 1e-5
        alpha_mid = jnp.zeros((8,))       # h = 0.5 -> max penalty (mean form)
        assert float(ar.round_loss(alpha_mid, 2.0)) > 0.99


class TestAdaRoundReconstruction:
    def test_beats_nearest_rounding_on_layer(self):
        """AdaRound on a single Dense layer should beat round-to-nearest
        reconstruction error (the core AdaRound claim)."""
        import flax.linen as nn
        import optax

        rng = jax.random.PRNGKey(0)
        lin = nn.Dense(24)
        x = jax.random.normal(rng, (256, 16))
        variables = lin.init(rng, x)
        w = variables["params"]["kernel"]
        y_fp = lin.apply(variables, x)

        # 4-bit makes rounding decisions matter
        delta, zp = init_minmax(w, 4, per_channel_axis=1)

        def forward(wq):
            return x @ wq + variables["params"]["bias"]

        nearest = forward(
            ar.adaround_weight(w, delta, zp, 4, ar.alpha_init(w, delta) * 1e3,
                               hard=True)
        )
        # note: alpha*1e3 saturates h to {0,1} at the init remainder —
        # equivalent to nearest rounding
        err_nearest = float(jnp.mean((nearest - y_fp) ** 2))

        alpha = ar.alpha_init(w, delta)
        tx = optax.adam(1e-2)
        opt = tx.init(alpha)

        @jax.jit
        def step(alpha, opt, beta):
            def loss(a):
                wq = ar.adaround_weight(w, delta, zp, 4, a, hard=False)
                rec = jnp.mean((forward(wq) - y_fp) ** 2)
                return rec + 0.01 * ar.round_loss(a, beta)
            g = jax.grad(loss)(alpha)
            up, opt2 = tx.update(g, opt)
            return optax.apply_updates(alpha, up), opt2

        for it in range(600):
            beta = 20.0 if it < 120 else 20.0 - 18.0 * (it - 120) / 480
            alpha, opt = step(alpha, opt, jnp.float32(beta))

        learned = forward(ar.adaround_weight(w, delta, zp, 4, alpha, hard=True))
        err_learned = float(jnp.mean((learned - y_fp) ** 2))
        assert err_learned < err_nearest * 0.99

    def test_full_model_pipeline(self):
        """adaround_reconstruct runs end-to-end and doesn't degrade vs minmax."""
        from quantv2x_tpu.data.pipeline import frame_to_batch
        from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
        from quantv2x_tpu.data.voxelizer import VoxelCfg
        from quantv2x_tpu.models.collab_model import ModelCfg, PyramidCollabModel
        from quantv2x_tpu.quant.ptq import ptq_calibrate

        rng_range = (-9.6, -9.6, -3.0, 9.6, 9.6, 1.0)
        voxel = VoxelCfg(lidar_range=rng_range, voxel_size=(0.4, 0.4, 4.0),
                         max_points_per_voxel=8, max_voxels=256)
        model = PyramidCollabModel(ModelCfg(voxel=voxel, max_cav=2))
        batches = [
            frame_to_batch(
                make_frame(SyntheticCfg(lidar_range=rng_range, num_agents=2,
                                        num_objects=3, points_per_agent=1500,
                                        seed=s)),
                voxel, max_cav=2,
            )
            for s in range(2)
        ]
        variables = model.init(jax.random.PRNGKey(0), batches[0], train=False)
        fp = model.apply(variables, batches[1], train=False)

        qv0, as0, qapply0 = ptq_calibrate(model, variables, batches[:1])
        base = qapply0(qv0, as0, batches[1])

        # one-shot capture keeps this full-model test fast (69 units x
        # per-unit forward re-capture is the sequential mode's cost); the
        # dedicated sequential test below covers re-capture semantics
        qv, asc, qapply = ar.adaround_reconstruct(
            model, variables, batches[:1],
            rcfg=ar.ReconCfg(iters=200, sequential=False),
        )
        refined = qapply(qv, asc, batches[1])

        fp_cls = np.asarray(fp["cls_preds"]).ravel()
        r = np.asarray(refined["cls_preds"]).ravel()
        assert np.isfinite(r).all()
        # On an UNTRAINED model the quantization errors are noise-level and
        # the one-shot capture approximation (inputs captured before any unit
        # is updated; the reference re-captures per block) dominates, so we
        # assert tracking rather than strict improvement; the single-layer
        # test above demonstrates the genuine AdaRound gain.
        assert np.corrcoef(r, fp_cls)[0, 1] > 0.99


class TestSequentialRecapture:
    """Sequential per-unit input re-capture (reference block_recon parity)."""

    def _small_model(self):
        import flax.linen as nn
        from quantv2x_tpu.models.layers import ConvBNReLU

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x, train: bool = False):
                x = ConvBNReLU(8, 3, name="c1")(x, train)
                x = ConvBNReLU(8, 3, name="c2")(x, train)
                return ConvBNReLU(4, 1, act=False, name="c3")(x, train)

        return Tiny()

    def test_capture_order_and_early_exit(self):
        from quantv2x_tpu.quant import ptq as ptq_mod

        model = self._small_model()
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 8, 8, 4)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        cfg = ptq_mod.PTQConfig()
        store = ar.capture_fp_outputs(model, variables, [x], cfg)
        assert list(store) == ["c1", "c2", "c3"]  # execution order

        qv, asc, _ = ptq_mod.ptq_calibrate(model, variables, [x], cfg)
        run_cap, statics = ar.make_sequential_capturer(model, cfg)
        ins, extras = ar.capture_unit_inputs(
            run_cap, statics, qv, asc, [x], "c2")
        assert len(ins) == 1 and ins[0].shape == (2, 8, 8, 8)

    def test_recaptured_input_reflects_refined_predecessor(self):
        """After zeroing c1's params in the quant tree, c2's re-captured
        input must change — proving inputs flow through the current
        partially-reconstructed model, not a stale one-shot capture."""
        from quantv2x_tpu.quant import ptq as ptq_mod

        model = self._small_model()
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 8, 8, 4)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        cfg = ptq_mod.PTQConfig()
        qv, asc, _ = ptq_mod.ptq_calibrate(model, variables, [x], cfg)

        run_cap, statics = ar.make_sequential_capturer(model, cfg)
        ins_before, _ = ar.capture_unit_inputs(
            run_cap, statics, qv, asc, [x], "c2")
        zeroed = jax.tree.map(jnp.zeros_like, qv["params"]["c1"])
        qv2 = dict(qv, params=dict(qv["params"], c1=zeroed))
        # SAME compiled program, refreshed params — the no-recompile path
        ins_after, _ = ar.capture_unit_inputs(
            run_cap, statics, qv2, asc, [x], "c2")
        assert not np.allclose(ins_before[0], ins_after[0])

    def test_sequential_pipeline_tracks_fp(self):
        from quantv2x_tpu.quant import ptq as ptq_mod

        model = self._small_model()
        rng = np.random.default_rng(2)
        xs = [jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
              for _ in range(2)]
        variables = model.init(jax.random.PRNGKey(0), xs[0], train=False)
        fp = model.apply(variables, xs[1], train=False)
        qv, asc, qapply = ar.adaround_reconstruct(
            model, variables, xs[:1],
            rcfg=ar.ReconCfg(iters=100, sequential=True))
        out = qapply(qv, asc, xs[1])
        r = np.asarray(out).ravel()
        assert np.isfinite(r).all()
        assert np.corrcoef(r, np.asarray(fp).ravel())[0, 1] > 0.99


class TestPredictionTerms:
    """Prediction-level reconstruction terms (block_recon.py:262-312 KL +
    misalignment, pyramid_recon.py:382 SoftBoundingBoxLoss)."""

    def test_pred_loss_zero_when_identical(self):
        import jax
        import jax.numpy as jnp
        from quantv2x_tpu.quant.adaround import ReconCfg, make_pred_loss

        rng = jax.random.PRNGKey(0)
        heads = {
            "cls_head": (jax.random.normal(rng, (1, 1, 16, 18)),
                         jnp.zeros((18,))),
            "reg_head": (jax.random.normal(rng, (1, 1, 16, 42)),
                         jnp.zeros((42,))),
        }
        ploss = make_pred_loss(heads, ReconCfg())
        y = jax.random.normal(rng, (2, 8, 8, 16))
        assert float(ploss(y, y)) < 1e-6
        y2 = y + 0.5 * jax.random.normal(jax.random.fold_in(rng, 1),
                                         y.shape)
        assert float(ploss(y2, y)) > 1e-3

    def test_head_params_found_and_terms_applied(self):
        """adaround_reconstruct locates the detection heads next to the
        shrink unit and runs without error with pred terms on."""
        import jax
        import numpy as np
        from quantv2x_tpu.data.pipeline import frame_to_batch
        from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
        from quantv2x_tpu.data.voxelizer import VoxelCfg
        from quantv2x_tpu.models.collab_model import (ModelCfg,
                                                      PyramidCollabModel)
        from quantv2x_tpu.quant.adaround import (ReconCfg,
                                                 adaround_reconstruct)
        from quantv2x_tpu.quant.ptq import PTQConfig

        rng_range = (-9.6, -9.6, -3.0, 9.6, 9.6, 1.0)
        voxel = VoxelCfg(lidar_range=rng_range, voxel_size=(0.4, 0.4, 4.0),
                         max_points_per_voxel=4, max_voxels=256)
        model = PyramidCollabModel(ModelCfg(
            voxel=voxel, max_cav=2, pyramid_layers=(1,),
            pyramid_strides=(1,), pyramid_filters=(16,),
            pyramid_up_strides=(1,), pyramid_up_filters=(16,),
            pillar_filters=(16,), backbone_layers=(1,),
            backbone_strides=(2,), backbone_filters=(16,), shrink_dim=16))
        frame = make_frame(SyntheticCfg(
            lidar_range=rng_range, num_agents=2, num_objects=3,
            points_per_agent=1500, seed=3))
        batch = frame_to_batch(frame, voxel, max_cav=2)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        rcfg = ReconCfg(iters=8, sequential=False, pred_terms=True)
        qvars, act_scales, qapply = adaround_reconstruct(
            model, variables, [batch], cfg=PTQConfig(observer="quantile"),
            rcfg=rcfg)
        out = qapply(qvars, act_scales, batch)
        assert np.isfinite(np.asarray(out["cls_preds"])).all()
