"""Tests for visualization extras (sequence render, t-SNE, scatter)."""

import os

import numpy as np
import pytest

from quantv2x_tpu.tools.vis_extras import (
    ap_fps_scatter,
    bev_feature_to_map,
    render_sequence,
    save_bev_feature,
    tsne_feature_plot,
)


class TestBevFeatureMap:
    def test_channel_reduce(self):
        f = np.stack([np.ones((4, 4)), 3 * np.ones((4, 4))], axis=-1)
        m = bev_feature_to_map(f)
        assert m.shape == (4, 4)
        assert m[0, 0] == pytest.approx(2.0)

    def test_normalize(self):
        f = np.arange(16, dtype=np.float32).reshape(4, 4)
        m = bev_feature_to_map(f, normalize=True)
        assert m.min() == 0.0 and m.max() == 1.0

    def test_batch_dim(self):
        f = np.zeros((1, 4, 4, 3))
        assert bev_feature_to_map(f).shape == (4, 4)

    def test_save(self, tmp_path):
        p = str(tmp_path / "f.png")
        save_bev_feature(p, np.random.default_rng(0).random((8, 16, 4)))
        assert os.path.getsize(p) > 0


class TestSequence:
    def test_renders_frames(self, tmp_path):
        rng = np.random.default_rng(0)
        frames = [{"points": rng.uniform(-10, 10, (200, 4))}
                  for _ in range(3)]
        out = render_sequence(frames, str(tmp_path), make_gif=False,
                              lidar_range=(-10, -10, -3, 10, 10, 1))
        assert len(out) == 3
        assert all(os.path.getsize(p) > 0 for p in out)

    def test_every_skips(self, tmp_path):
        frames = [{"points": np.zeros((1, 4))} for _ in range(4)]
        out = render_sequence(frames, str(tmp_path), make_gif=False,
                              every=2, lidar_range=(-1, -1, -1, 1, 1, 1))
        assert len(out) == 2


class TestTsne:
    def test_separable_clusters(self, tmp_path):
        rng = np.random.default_rng(0)
        a = rng.normal(0, 0.1, (40, 16))
        b = rng.normal(5, 0.1, (40, 16))
        X = np.concatenate([a, b])
        y = np.array([0] * 40 + [1] * 40)
        p = str(tmp_path / "tsne.png")
        emb = tsne_feature_plot(X, y, p, label_names=["m1", "m2"],
                                perplexity=10)
        assert emb.shape == (80, 2)
        assert os.path.getsize(p) > 0
        # clusters separated in embedding space
        d_within = np.linalg.norm(emb[:40] - emb[:40].mean(0), axis=1).mean()
        d_between = np.linalg.norm(emb[:40].mean(0) - emb[40:].mean(0))
        assert d_between > d_within

    def test_pca_fallback_small_n(self, tmp_path):
        X = np.random.default_rng(1).normal(size=(10, 8))
        y = np.zeros(10)
        emb = tsne_feature_plot(X, y, str(tmp_path / "p.png"),
                                perplexity=30)
        assert emb.shape == (10, 2)


class TestScatter:
    def test_writes_png(self, tmp_path):
        p = str(tmp_path / "s.png")
        ap_fps_scatter([{"name": "ours", "ap": 0.9, "fps": 13.7},
                        {"name": "ref", "ap": 0.905, "fps": 24.0}], p)
        assert os.path.getsize(p) > 0
