"""Tests for the CPM wire-size analyzer (draco_compression parity)."""

import numpy as np
import pytest

from quantv2x_tpu.tools.cpm_analysis import (
    analyze_ply_dir,
    codebook_wire_bytes,
    compress_point_cloud,
    decompress_coords,
    load_ply,
    save_ply,
)


def _cloud(n=200, seed=0):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(-50, 50, (n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, 32)).astype(np.float32)
    return coords, feats


class TestPly:
    def test_roundtrip(self, tmp_path):
        coords, feats = _cloud(50)
        p = str(tmp_path / "a.ply")
        save_ply(p, coords, feats)
        c2, f2 = load_ply(p)
        np.testing.assert_allclose(c2, coords, rtol=1e-5)
        np.testing.assert_allclose(f2, feats, rtol=1e-4, atol=1e-5)


class TestCodec:
    def test_coord_roundtrip_within_quantization_error(self):
        coords, feats = _cloud(500)
        blob = compress_point_cloud(coords, feats, coord_bits=11)
        dec = decompress_coords(blob, coord_bits=11)
        # 11 bits over a 100 m box -> ~5 cm cells; codec reorders points,
        # so check every decoded point has an original within the cell size
        from scipy.spatial import cKDTree
        span = coords.max(0) - coords.min(0)
        tol = float(span.max()) / (2 ** 11 - 1) * np.sqrt(3)
        d, _ = cKDTree(coords).query(np.asarray(dec))
        assert d.max() < tol

    def test_compresses_below_raw(self):
        coords, feats = _cloud(2000)
        raw = coords.nbytes + feats.nbytes
        blob = compress_point_cloud(coords, feats)
        assert len(blob) < raw * 0.6

    def test_empty_cloud(self):
        blob = compress_point_cloud(np.zeros((0, 3)), None)
        assert isinstance(blob, bytes)


class TestAnalyze:
    def test_dir_stats(self, tmp_path):
        for i in range(3):
            coords, feats = _cloud(100 + i, seed=i)
            save_ply(str(tmp_path / f"{i}.ply"), coords, feats)
        stats = analyze_ply_dir(str(tmp_path))
        assert stats["num_frames"] == 3
        assert stats["avg_keypoints"] == pytest.approx(101.0)
        assert stats["avg_cpm_bytes"] > 0
        assert stats["avg_compression_ratio"] > 1.0


class TestCodebookWire:
    def test_default_matches_reference_knobs(self):
        w = codebook_wire_bytes(100, 352)
        assert w["bits_per_pixel"] == 48       # 3 levels x 2 seg x 8 bit
        assert w["compression_ratio"] == pytest.approx(2048 / 48)
