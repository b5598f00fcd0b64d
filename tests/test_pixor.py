"""Tests for the PIXOR anchor-free BEV detector family."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.models.pixor import (
    PIXOR,
    PixorCfg,
    bev_occupancy_raster,
    decode_pixor,
    pixor_label_map,
    pixor_loss,
)

TINY = PixorCfg(lidar_range=(-6.4, -6.4, -3.0, 6.4, 6.4, 1.0), res=0.2)


class TestRaster:
    def test_occupancy_and_intensity(self):
        pts = jnp.array([
            [0.1, 0.1, -2.9, 0.5],
            [0.1, 0.1, 0.9, 0.7],    # same pillar, top slice
            [100.0, 0.0, 0.0, 1.0],  # out of range
        ])
        bev = bev_occupancy_raster(pts, jnp.ones(3, bool), TINY)
        H, W = TINY.bev_hw
        Z = TINY.z_bins
        assert bev.shape == (H, W, Z + 1)
        xi = int((0.1 + 6.4) / 0.2)
        col = np.asarray(bev[xi, xi])
        assert col[0] == 1.0 and col[Z - 1] == 1.0
        assert col[1:Z - 1].sum() == 0
        assert col[-1] == pytest.approx(0.6)  # mean intensity
        assert float(bev.sum()) == pytest.approx(2 + 0.6)

    def test_masked_points_ignored(self):
        pts = jnp.ones((5, 4))
        bev = bev_occupancy_raster(pts, jnp.zeros(5, bool), TINY)
        assert float(bev.sum()) == 0.0


class TestLabelMap:
    def test_pixels_inside_box_positive(self):
        boxes = jnp.array([[0.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.0]])
        lm = pixor_label_map(boxes, jnp.ones(1, bool), TINY)
        h, w = TINY.label_hw
        assert lm.shape == (h, w, 7)
        ci, cj = h // 2, w // 2
        assert lm[ci, cj, 0] == 1.0
        # far corner is background
        assert lm[0, 0, 0] == 0.0
        # cos/sin of yaw=0
        assert lm[ci, cj, 1] == pytest.approx(1.0)
        assert lm[ci, cj, 2] == pytest.approx(0.0)
        # log sizes
        assert lm[ci, cj, 5] == pytest.approx(np.log(2.0))
        assert lm[ci, cj, 6] == pytest.approx(np.log(4.0))

    def test_rotated_box_membership(self):
        boxes = jnp.array([[0.0, 0.0, -1.0, 6.0, 1.0, 1.5, np.pi / 4]])
        lm = pixor_label_map(boxes, jnp.ones(1, bool), TINY)
        h, w = TINY.label_hw
        stride = TINY.res * TINY.downsample_rate
        # a point along the rotated major axis is inside
        d = int(1.5 / stride)
        assert lm[h // 2 + d, w // 2 + d, 0] == 1.0
        # same offset along x only is outside the narrow box
        assert lm[h // 2 + d * 2, w // 2, 0] == 0.0

    def test_masked_boxes_ignored(self):
        boxes = jnp.array([[0.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.0]])
        lm = pixor_label_map(boxes, jnp.zeros(1, bool), TINY)
        assert float(lm[..., 0].sum()) == 0.0


class TestModelAndLoss:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = TINY
        model = PIXOR(cfg)
        rng = np.random.default_rng(0)
        H, W = cfg.bev_hw
        bev = jnp.asarray(
            rng.random((H, W, cfg.z_bins + 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), bev, train=False)
        return cfg, model, variables, bev

    def test_output_shapes(self, setup):
        cfg, model, variables, bev = setup
        out = model.apply(variables, bev, train=False)
        h, w = cfg.label_hw
        assert out["cls"].shape == (h, w, 1)
        assert out["reg"].shape == (h, w, 6)

    def test_loss_and_grad(self, setup):
        cfg, model, variables, bev = setup
        boxes = jnp.array([[0.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.3]])
        lm = pixor_label_map(boxes, jnp.ones(1, bool), cfg)
        out = model.apply(variables, bev, train=False)
        total, parts = pixor_loss(out, lm)
        assert np.isfinite(float(total)) and float(total) > 0
        g = jax.grad(lambda o: pixor_loss(o, lm)[0])(out)
        assert float(jnp.abs(g["reg"]).sum()) > 0

    def test_decode_recovers_planted_box(self, setup):
        cfg = TINY
        h, w = cfg.label_hw
        boxes = jnp.array([[1.0, -2.0, -1.0, 4.0, 2.0, 1.5, 0.5]])
        lm = pixor_label_map(boxes, jnp.ones(1, bool), cfg)
        # perfect outputs: logits +-10, reg = targets
        out = {"cls": jnp.where(lm[..., :1] > 0, 10.0, -10.0),
               "reg": lm[..., 1:]}
        dec, scores = decode_pixor(out, cfg, top_k=16)
        best = np.asarray(dec[0])
        assert scores[0] > 0.99
        np.testing.assert_allclose(best[[0, 1]], [1.0, -2.0], atol=1e-4)
        np.testing.assert_allclose(best[[3, 4]], [4.0, 2.0], atol=1e-4)
        assert best[6] == pytest.approx(0.5, abs=1e-4)


class TestPIXORIntermediate:
    def test_two_agent_fusion_forward(self):
        from quantv2x_tpu.models.pixor import PIXORIntermediate

        cfg = TINY
        H, W = cfg.bev_hw
        rng = np.random.default_rng(4)
        bev = jnp.asarray(
            rng.random((1, 2, H, W, cfg.z_bins + 1)).astype(np.float32))
        mask = jnp.ones((1, 2), bool)
        model = PIXORIntermediate(cfg)
        v = model.init(jax.random.PRNGKey(0), bev, mask, train=False)
        out = model.apply(v, bev, mask, train=False)
        h, w = cfg.label_hw
        assert out["cls"].shape == (1, h, w, 1)
        assert out["reg"].shape == (1, h, w, 6)

    def test_masked_agent_ignored(self):
        from quantv2x_tpu.models.pixor import PIXORIntermediate

        cfg = TINY
        H, W = cfg.bev_hw
        rng = np.random.default_rng(5)
        base = rng.random((1, 1, H, W, cfg.z_bins + 1)).astype(np.float32)
        junk = 100 * np.ones((1, 1, H, W, cfg.z_bins + 1), np.float32)
        bev = jnp.asarray(np.concatenate([base, junk], axis=1))
        model = PIXORIntermediate(cfg)
        m_both = jnp.ones((1, 2), bool)
        m_solo = jnp.array([[True, False]])
        v = model.init(jax.random.PRNGKey(0), bev, m_both, train=False)
        out_solo = model.apply(v, bev, m_solo, train=False)
        bev_clean = jnp.asarray(np.concatenate([base, base], axis=1))
        out_clean = model.apply(v, bev_clean, m_solo, train=False)
        np.testing.assert_allclose(np.asarray(out_solo["cls"]),
                                   np.asarray(out_clean["cls"]), atol=1e-4)
