"""Tests for the auxiliary loss family (uncertainty KL, DiscoNet KD, depth).

Parity targets: reference loss/point_pillar_uncertainty_loss.py (KLLoss),
loss/point_pillar_disconet_loss.py, loss/point_pillar_depth_loss.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.loss.aux_losses import (
    UncertaintyCfg,
    _kl_angular,
    _kl_l1,
    _kl_l2,
    depth_focal_loss,
    disconet_kd_loss,
    uncertainty_loss,
)


def _label_dict(B=2, h=4, w=4, S=2, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, size=(B, h, w, S)).astype(np.int32)
    targets = rng.normal(size=(B, h, w, S, 7)).astype(np.float32)
    return {"labels": jnp.asarray(labels), "targets": jnp.asarray(targets)}


def _outputs(B=2, h=4, w=4, S=2, dim=3, seed=1):
    rng = np.random.default_rng(seed)
    return {
        "reg_preds": jnp.asarray(
            rng.normal(size=(B, h, w, S * 7)).astype(np.float32)),
        "unc_preds": jnp.asarray(
            rng.normal(size=(B, h, w, S * dim)).astype(np.float32)),
    }


class TestKLTerms:
    def test_l2_closed_form(self):
        d, s = jnp.float32(0.5), jnp.float32(-1.0)
        expected = 0.5 * (np.exp(1.0) * 0.25 + (-1.0))
        assert np.allclose(_kl_l2(d, s), expected, rtol=1e-6)

    def test_l1_closed_form(self):
        d, s = jnp.float32(-0.5), jnp.float32(2.0)
        expected = 0.5 * np.exp(-2.0) * 0.5 + 2.0
        assert np.allclose(_kl_l1(d, s), expected, rtol=1e-6)

    def test_angular_matches_scipy_i0(self):
        from scipy.special import i0
        d, s = 0.3, -0.7
        kappa = np.exp(-s)
        expected = (np.log(i0(kappa)) - kappa * np.cos(d)
                    + 0.001 * (s - 1.0 if s > 1.0 else np.expm1(s - 1.0)))
        got = _kl_angular(jnp.float32(d), jnp.float32(s), 0.001, 1.0)
        assert np.allclose(got, expected, rtol=1e-5)

    def test_angular_minimized_at_zero_diff(self):
        s = jnp.float32(0.0)
        at_zero = _kl_angular(jnp.float32(0.0), s, 0.001, 1.0)
        away = _kl_angular(jnp.float32(1.0), s, 0.001, 1.0)
        assert float(at_zero) < float(away)

    def test_large_kappa_stable(self):
        # naive log(I0(e^{-s})) overflows for s ~ -100; i0e form must not
        v = _kl_angular(jnp.float32(0.1), jnp.float32(-50.0), 0.001, 1.0)
        assert np.isfinite(float(v))


class TestUncertaintyLoss:
    @pytest.mark.parametrize("dim", [2, 3, 7])
    def test_finite_scalar(self, dim):
        cfg = UncertaintyCfg(dim=dim)
        loss = uncertainty_loss(_outputs(dim=dim), _label_dict(), cfg)
        assert loss.shape == () and np.isfinite(float(loss))

    def test_grad_flows_to_both_heads(self):
        cfg = UncertaintyCfg(dim=3)
        out = _outputs(dim=3)
        ld = _label_dict()

        g = jax.grad(
            lambda o: uncertainty_loss(o, ld, cfg))(out)
        assert float(jnp.abs(g["reg_preds"]).sum()) > 0
        assert float(jnp.abs(g["unc_preds"]).sum()) > 0

    def test_only_positives_contribute(self):
        cfg = UncertaintyCfg(dim=2)
        ld = _label_dict()
        ld["labels"] = jnp.zeros_like(ld["labels"])
        loss = uncertainty_loss(_outputs(dim=2), ld, cfg)
        assert np.allclose(float(loss), 0.0)

    def test_high_variance_discounts_error(self):
        # for a fixed large diff, raising s (predicted log-variance) must
        # lower the data term: the model can "pay" s to discount bad regions
        cfg = UncertaintyCfg(dim=2, xy_loss_type="l2")
        out = _outputs(dim=2)
        ld = _label_dict()
        ld["targets"] = ld["targets"] + 100.0
        lo = uncertainty_loss(
            {**out, "unc_preds": jnp.full_like(out["unc_preds"], 10.0)},
            ld, cfg)
        hi = uncertainty_loss(
            {**out, "unc_preds": jnp.full_like(out["unc_preds"], 0.0)},
            ld, cfg)
        assert float(lo) < float(hi)


class TestDiscoNetKD:
    def test_identical_features_zero(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 16)),
                        dtype=jnp.float32)
        assert np.allclose(float(disconet_kd_loss(x, x)), 0.0, atol=1e-6)

    def test_divergent_positive(self):
        rng = np.random.default_rng(0)
        stu = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), dtype=jnp.float32)
        tea = jnp.asarray(rng.normal(size=(2, 8, 8, 16)), dtype=jnp.float32)
        assert float(disconet_kd_loss(stu, tea)) > 0

    def test_head_terms_add(self):
        rng = np.random.default_rng(1)
        stu = jnp.asarray(rng.normal(size=(1, 4, 4, 8)), dtype=jnp.float32)
        tea = jnp.asarray(rng.normal(size=(1, 4, 4, 8)), dtype=jnp.float32)
        base = float(disconet_kd_loss(stu, tea))
        with_heads = float(disconet_kd_loss(
            stu, tea, student_heads=[stu], teacher_heads=[tea]))
        assert with_heads > base


class TestDepthFocal:
    def test_perfect_prediction_near_zero(self):
        D = 16
        gt = jnp.asarray(np.random.default_rng(0).integers(0, D, (2, 8, 8)))
        logits = 50.0 * jax.nn.one_hot(gt, D)
        assert float(depth_focal_loss(logits, gt)) < 1e-6

    def test_wrong_prediction_positive(self):
        D = 16
        gt = jnp.zeros((2, 8, 8), dtype=jnp.int32)
        logits = 50.0 * jax.nn.one_hot(jnp.full((2, 8, 8), D - 1), D)
        assert float(depth_focal_loss(logits, gt)) > 1.0

    def test_fg_mask_zeroes_background(self):
        D = 8
        gt = jnp.zeros((1, 4, 4), dtype=jnp.int32)
        logits = jnp.asarray(
            np.random.default_rng(2).normal(size=(1, 4, 4, D)),
            dtype=jnp.float32)
        masked = depth_focal_loss(logits, gt,
                                  fg_mask=jnp.zeros((1, 4, 4)))
        assert np.allclose(float(masked), 0.0)


class TestUncertaintyHead:
    def test_collab_model_unc_output(self):
        import dataclasses

        from quantv2x_tpu.data.pipeline import frame_to_batch
        from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
        from quantv2x_tpu.models.collab_model import PyramidCollabModel
        from tests.test_model import TINY_MODEL, TINY_RANGE, TINY_VOXEL

        cfg = dataclasses.replace(TINY_MODEL, uncertainty_dim=3)
        frame = make_frame(SyntheticCfg(
            lidar_range=TINY_RANGE, num_agents=2, num_objects=2,
            points_per_agent=1000, seed=5))
        batch = frame_to_batch(frame, TINY_VOXEL, max_cav=2)
        model = PyramidCollabModel(cfg)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        out = model.apply(variables, batch, train=False)
        S = cfg.anchor_num * cfg.num_class
        assert out["unc_preds"].shape[-1] == S * 3


class TestClipLoss:
    def test_matched_pairs_lower_than_shuffled(self):
        from quantv2x_tpu.loss.aux_losses import clip_loss

        rng = np.random.default_rng(0)
        e = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
        matched = clip_loss(e, e, jnp.float32(2.0))
        shuffled = clip_loss(e, e[::-1], jnp.float32(2.0))
        assert float(matched) < float(shuffled)

    def test_gradient_flows_to_scale(self):
        from quantv2x_tpu.loss.aux_losses import clip_loss

        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        g = jax.grad(lambda s: clip_loss(a, b, s))(jnp.float32(0.0))
        assert np.isfinite(float(g))
