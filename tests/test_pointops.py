"""Tests for fixed-capacity point-set ops (pointnet2/roiaware equivalents)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.ops.pointops import (
    ball_query_group,
    bilinear_from_bev,
    farthest_point_sample,
    group_points,
    points_in_boxes_index,
    roiaware_pool,
    three_nn_interpolate,
)


class TestFPS:
    def test_spreads_over_clusters(self):
        # two tight clusters far apart; 2 samples must hit both
        rng = np.random.default_rng(0)
        a = rng.normal(0, 0.01, (50, 3))
        b = rng.normal(0, 0.01, (50, 3)) + 100.0
        pts = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
        idx = farthest_point_sample(pts, jnp.ones(100, bool), 2)
        sides = {int(i) < 50 for i in np.asarray(idx)}
        assert sides == {True, False}

    def test_never_selects_invalid(self):
        pts = jnp.asarray(
            np.random.default_rng(1).normal(size=(20, 3)).astype(np.float32))
        mask = jnp.arange(20) < 5
        idx = np.asarray(farthest_point_sample(pts, mask, 5))
        assert (idx < 5).all()
        assert len(set(idx.tolist())) == 5

    def test_jits(self):
        pts = jnp.zeros((16, 3))
        f = jax.jit(lambda p: farthest_point_sample(p, jnp.ones(16, bool), 4))
        assert f(pts).shape == (4,)


class TestBallQuery:
    def test_finds_neighbors_in_radius(self):
        pts = jnp.array([[0.0, 0, 0], [0.5, 0, 0], [3.0, 0, 0]])
        centers = jnp.array([[0.0, 0, 0]])
        idx, gm = ball_query_group(
            centers, jnp.ones(1, bool), pts, jnp.ones(3, bool),
            radius=1.0, nsample=4)
        got = set(np.asarray(idx)[0][np.asarray(gm)[0]].tolist())
        assert got == {0, 1}

    def test_nearest_first_when_capped(self):
        pts = jnp.array([[0.9, 0, 0], [0.1, 0, 0], [0.5, 0, 0]])
        centers = jnp.array([[0.0, 0, 0]])
        idx, gm = ball_query_group(
            centers, jnp.ones(1, bool), pts, jnp.ones(3, bool),
            radius=1.0, nsample=2)
        assert np.asarray(idx)[0].tolist() == [1, 2]  # two closest

    def test_masked_points_excluded(self):
        pts = jnp.zeros((4, 3))
        centers = jnp.zeros((1, 3))
        idx, gm = ball_query_group(
            centers, jnp.ones(1, bool), pts,
            jnp.array([True, False, False, False]), radius=1.0, nsample=4)
        assert np.asarray(gm)[0].sum() == 1

    def test_chunking_matches_direct(self):
        rng = np.random.default_rng(2)
        pts = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        centers = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))
        i1, m1 = ball_query_group(centers, jnp.ones(40, bool), pts,
                                  jnp.ones(64, bool), 1.0, 8, chunk=16)
        i2, m2 = ball_query_group(centers, jnp.ones(40, bool), pts,
                                  jnp.ones(64, bool), 1.0, 8, chunk=64)
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        np.testing.assert_array_equal(
            np.asarray(i1)[np.asarray(m1)], np.asarray(i2)[np.asarray(m2)])


class TestGroupAndInterp:
    def test_group_points_relative_coords(self):
        pts = jnp.array([[1.0, 1, 1], [2.0, 2, 2]])
        feats = jnp.array([[10.0], [20.0]])
        centers = jnp.array([[1.0, 1, 1]])
        idx = jnp.array([[0, 1]])
        gm = jnp.array([[True, True]])
        g = np.asarray(group_points(pts, feats, idx, gm, centers))
        np.testing.assert_allclose(g[0, 0], [0, 0, 0, 10.0])
        np.testing.assert_allclose(g[0, 1], [1, 1, 1, 20.0])

    def test_three_nn_exact_at_support(self):
        sup = jnp.array([[0.0, 0, 0], [1.0, 0, 0], [0.0, 1, 0], [5.0, 5, 5]])
        feats = jnp.array([[1.0], [2.0], [3.0], [4.0]])
        q = jnp.array([[0.0, 0, 0]])
        out = three_nn_interpolate(q, jnp.ones(1, bool), sup,
                                   jnp.ones(4, bool), feats)
        # query coincides with support 0 -> weight collapses there
        assert float(out[0, 0]) == pytest.approx(1.0, abs=1e-3)


class TestBilinearBEV:
    def test_exact_at_cell_centers(self):
        # canvas: rows index y, cols index x
        H, W = 8, 8
        bev = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W, 1)
        rng_box = (-8.0, -8.0, -3.0, 8.0, 8.0, 1.0)
        # metric position of row 3 (y), col 5 (x) with 2 m stride
        xy = jnp.array([[-8.0 + 5 * 2.0, -8.0 + 3 * 2.0]])
        out = bilinear_from_bev(bev, xy, rng_box, (2.0, 2.0))
        assert float(out[0, 0]) == pytest.approx(3 * W + 5)

    def test_midpoint_average(self):
        # rows 1 and 2 at col 1 -> midpoint in y averages them
        bev = jnp.zeros((4, 4, 1)).at[1, 1, 0].set(1.0).at[2, 1, 0].set(3.0)
        rng_box = (0.0, 0.0, -1.0, 4.0, 4.0, 1.0)
        xy = jnp.array([[1.0, 1.5]])
        out = bilinear_from_bev(bev, xy, rng_box, (1.0, 1.0))
        assert float(out[0, 0]) == pytest.approx(2.0)


class TestRoiAware:
    def test_pool_places_point_features(self):
        pts = jnp.array([[0.0, 0.0, 0.0], [10.0, 0, 0]])
        feats = jnp.array([[5.0], [9.0]])
        boxes = jnp.array([[0.0, 0, 0, 2.0, 2.0, 2.0, 0.0]])
        out = np.asarray(roiaware_pool(
            pts, jnp.ones(2, bool), feats, boxes, jnp.ones(1, bool),
            grid_size=2, pool="max"))
        assert out.shape == (1, 2, 2, 2, 1)
        # center point falls in upper cell block; its feature present once
        assert out.max() == 5.0
        assert (out > 0).sum() == 1

    def test_avg_pool(self):
        pts = jnp.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2]])
        feats = jnp.array([[2.0], [4.0]])
        boxes = jnp.array([[0.0, 0, 0, 1.0, 1.0, 1.0, 0.0]])
        out = np.asarray(roiaware_pool(
            pts, jnp.ones(2, bool), feats, boxes, jnp.ones(1, bool),
            grid_size=1, pool="avg"))
        assert out[0, 0, 0, 0, 0] == pytest.approx(3.0)

    def test_rotated_membership(self):
        # point on rotated major axis, outside axis-aligned box extent in y
        boxes = jnp.array([[0.0, 0, 0, 6.0, 1.0, 2.0, np.pi / 2]])
        pts = jnp.array([[0.0, 2.5, 0.0]])
        idx = points_in_boxes_index(pts, boxes, jnp.ones(1, bool))
        assert int(idx[0]) == 0
        idx2 = points_in_boxes_index(
            jnp.array([[2.5, 0.0, 0.0]]), boxes, jnp.ones(1, bool))
        assert int(idx2[0]) == -1

    def test_points_in_boxes_first_match(self):
        boxes = jnp.array([[0.0, 0, 0, 2.0, 2.0, 2.0, 0.0],
                           [0.0, 0, 0, 4.0, 4.0, 4.0, 0.0]])
        pts = jnp.array([[0.0, 0, 0], [1.5, 0, 0], [10.0, 0, 0]])
        idx = np.asarray(points_in_boxes_index(pts, boxes,
                                               jnp.ones(2, bool)))
        assert idx.tolist() == [0, 1, -1]
