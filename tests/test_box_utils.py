import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.utils import box_utils as bu
from quantv2x_tpu.utils.common import limit_period
from quantv2x_tpu.utils import transformation as tfm


def _mc_iou_bev(box_a, box_b, n=200_000, seed=0):
    """Monte-Carlo BEV IoU oracle (independent of the clipping code)."""
    rng = np.random.default_rng(seed)
    boxes = np.stack([box_a, box_b])
    quads = np.asarray(bu.box_to_bev_quad(jnp.asarray(boxes)))
    lo = quads.reshape(-1, 2).min(0) - 0.1
    hi = quads.reshape(-1, 2).max(0) + 0.1
    pts = rng.uniform(lo, hi, size=(n, 2))

    def inside(quad, p):
        m = np.ones(len(p), bool)
        for k in range(4):
            a, b = quad[k], quad[(k + 1) % 4]
            m &= (b[0] - a[0]) * (p[:, 1] - a[1]) - (b[1] - a[1]) * (p[:, 0] - a[0]) >= 0
        return m

    in_a = inside(quads[0], pts)
    in_b = inside(quads[1], pts)
    area = np.prod(hi - lo)
    inter = in_a & in_b
    union = in_a | in_b
    if union.sum() == 0:
        return 0.0
    return inter.sum() / union.sum()


class TestCorners:
    def test_roundtrip_lwh(self):
        rng = np.random.default_rng(0)
        boxes = np.concatenate(
            [
                rng.uniform(-50, 50, (32, 3)),
                rng.uniform(1, 5, (32, 3)),
                rng.uniform(-np.pi, np.pi, (32, 1)),
            ],
            axis=1,
        ).astype(np.float32)
        corners = bu.boxes_to_corners_3d(jnp.asarray(boxes), "lwh")
        back = np.asarray(bu.corners_to_boxes_3d(corners, "lwh"))
        np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-3)
        dyaw = np.asarray(limit_period(back[:, 6] - boxes[:, 6], 0.5, 2 * np.pi))
        np.testing.assert_allclose(dyaw, 0, atol=1e-3)

    def test_hwl_equals_reordered_lwh(self):
        box_lwh = jnp.array([[1.0, 2.0, 0.5, 4.0, 2.0, 1.5, 0.3]])
        box_hwl = box_lwh[:, jnp.array([0, 1, 2, 5, 4, 3, 6])]
        np.testing.assert_allclose(
            bu.boxes_to_corners_3d(box_lwh, "lwh"),
            bu.boxes_to_corners_3d(box_hwl, "hwl"),
            atol=1e-6,
        )

    def test_axis_aligned_unit_box(self):
        box = jnp.array([[0.0, 0.0, 0.0, 2.0, 1.0, 1.0, 0.0]])
        corners = np.asarray(bu.boxes_to_corners_3d(box, "lwh"))[0]
        assert corners[:, 0].max() == pytest.approx(1.0)
        assert corners[:, 1].max() == pytest.approx(0.5)
        assert corners[:, 2].min() == pytest.approx(-0.5)
        # BEV footprint is CCW
        quad = corners[:4, :2]
        area = 0.0
        for k in range(4):
            a, b = quad[k], quad[(k + 1) % 4]
            area += a[0] * b[1] - b[0] * a[1]
        assert area > 0


class TestIoU:
    def test_axis_aligned_matrix(self):
        a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
        b = jnp.array([[1.0, 1.0, 3.0, 3.0], [10.0, 10.0, 11.0, 11.0]])
        iou = np.asarray(bu.iou_matrix_axis_aligned(a, b))
        assert iou[0, 0] == pytest.approx(1.0 / 7.0)
        assert iou[0, 1] == 0.0

    def test_rotated_identical(self):
        box = jnp.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.7]])
        iou = np.asarray(bu.iou_matrix_rotated_bev(box, box))
        assert iou[0, 0] == pytest.approx(1.0, abs=1e-5)

    def test_rotated_disjoint(self):
        a = jnp.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.3]])
        b = jnp.array([[100.0, 0.0, 0.0, 4.0, 2.0, 1.5, 1.0]])
        assert np.asarray(bu.iou_matrix_rotated_bev(a, b))[0, 0] == 0.0

    def test_rotated_45deg_cross(self):
        # two unit squares, one rotated 45 deg: analytic IoU = (8*sqrt(2)-8)/...(known: 2*(sqrt2-1)/(2-(2*sqrt2-2)))
        a = np.array([0, 0, 0, 1, 1, 1, 0], dtype=np.float32)
        b = np.array([0, 0, 0, 1, 1, 1, np.pi / 4], dtype=np.float32)
        iou = float(bu.iou_matrix_rotated_bev(jnp.asarray([a]), jnp.asarray([b]))[0, 0])
        inter = 4 * (np.sqrt(2) - 1) * 0.5  # octagon area = 2*(sqrt(2)-1)*... compute via MC instead
        mc = _mc_iou_bev(a, b)
        assert iou == pytest.approx(mc, abs=0.01)

    @pytest.mark.parametrize("seed", range(6))
    def test_rotated_random_vs_monte_carlo(self, seed):
        rng = np.random.default_rng(seed)
        a = np.array([0, 0, 0, rng.uniform(2, 5), rng.uniform(1, 3), 1.5,
                      rng.uniform(-np.pi, np.pi)], dtype=np.float32)
        b = np.array([rng.uniform(-2, 2), rng.uniform(-2, 2), 0,
                      rng.uniform(2, 5), rng.uniform(1, 3), 1.5,
                      rng.uniform(-np.pi, np.pi)], dtype=np.float32)
        iou = float(bu.iou_matrix_rotated_bev(jnp.asarray([a]), jnp.asarray([b]))[0, 0])
        mc = _mc_iou_bev(a, b, seed=seed)
        assert iou == pytest.approx(mc, abs=0.01)

    def test_3d_identical_and_z_offset(self):
        a = jnp.array([[0.0, 0.0, 0.0, 4.0, 2.0, 2.0, 0.5]])
        b = jnp.array([[0.0, 0.0, 1.0, 4.0, 2.0, 2.0, 0.5]])
        assert float(bu.iou_matrix_3d(a, a)[0, 0]) == pytest.approx(1.0, abs=1e-5)
        # z overlap 1 of 2 -> inter = V/2, union = 3V/2 -> IoU 1/3
        assert float(bu.iou_matrix_3d(a, b)[0, 0]) == pytest.approx(1 / 3, abs=1e-5)

    def test_containment(self):
        big = np.array([0, 0, 0, 4, 4, 2, 0.3], dtype=np.float32)
        small = np.array([0, 0, 0, 2, 2, 2, 0.3], dtype=np.float32)
        iou = float(bu.iou_matrix_rotated_bev(jnp.asarray([big]), jnp.asarray([small]))[0, 0])
        assert iou == pytest.approx(4.0 / 16.0, abs=1e-4)


class TestNMS:
    def test_suppresses_overlapping(self):
        boxes = jnp.array(
            [
                [0.0, 0.0, 0, 4, 2, 1.5, 0.0],
                [0.1, 0.05, 0, 4, 2, 1.5, 0.02],  # near-duplicate of 0
                [20.0, 0.0, 0, 4, 2, 1.5, 0.0],
            ]
        )
        scores = jnp.array([0.9, 0.8, 0.7])
        valid = jnp.ones(3, bool)
        keep = np.asarray(bu.nms_rotated(boxes, scores, valid, 0.15))
        assert keep.tolist() == [True, False, True]

    def test_respects_validity_and_padding(self):
        boxes = jnp.zeros((8, 7)).at[:, 3:6].set(1.0)
        scores = jnp.linspace(1, 0.1, 8)
        valid = jnp.zeros(8, bool).at[0].set(True)
        keep = np.asarray(bu.nms_rotated(boxes, scores, valid, 0.15))
        assert keep.sum() == 1 and keep[0]

    def test_low_score_survivor_order(self):
        # highest score wins among overlapping cluster regardless of input order
        boxes = jnp.array(
            [
                [0.1, 0.0, 0, 4, 2, 1.5, 0.0],
                [0.0, 0.0, 0, 4, 2, 1.5, 0.0],
            ]
        )
        scores = jnp.array([0.5, 0.9])
        keep = np.asarray(bu.nms_rotated(boxes, scores, jnp.ones(2, bool), 0.15))
        assert keep.tolist() == [False, True]


class TestTransforms:
    def test_pose_roundtrip(self):
        pose = jnp.array([10.0, -5.0, 1.0, 2.0, 30.0, -3.0])
        T = tfm.pose_to_world(pose)
        Tinv = tfm.inverse_rigid(T)
        np.testing.assert_allclose(np.asarray(T @ Tinv), np.eye(4), atol=1e-5)

    def test_pairwise_consistency(self):
        rng = np.random.default_rng(1)
        poses = jnp.asarray(
            np.concatenate(
                [rng.uniform(-30, 30, (3, 3)), rng.uniform(-10, 10, (3, 3))], axis=1
            )
        )
        P = tfm.pairwise_transformation(poses)
        # T[i,j] maps i-frame points into j-frame: T[i,j] = T[k,j] @ T[i,k]
        np.testing.assert_allclose(
            np.asarray(P[0, 2]), np.asarray(P[1, 2] @ P[0, 1]), atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(P[1, 1]), np.eye(4), atol=1e-6)

    def test_pairwise_point_projection(self):
        posesA = jnp.array([[0.0, 0.0, 0, 0, 0.0, 0]])
        posesB = jnp.array([[5.0, 0.0, 0, 0, 90.0, 0]])
        P = tfm.pairwise_transformation(jnp.concatenate([posesA, posesB]))
        # origin of agent1 (at world (5,0)) in agent0 frame = (5, 0)
        p = tfm.project_points(jnp.zeros((1, 3)), P[1, 0])
        np.testing.assert_allclose(np.asarray(p)[0, :2], [5.0, 0.0], atol=1e-5)
        # world x-axis point (6,0) is local +y for agent1 (yaw 90):
        p2 = tfm.project_points(jnp.array([[6.0, 0.0, 0.0]]), P[0, 1])
        np.testing.assert_allclose(np.asarray(p2)[0, :2], [0.0, -1.0], atol=1e-5)

    def test_normalize_affine_identity(self):
        T = jnp.eye(4)[None]
        A = tfm.normalize_pairwise_tfm(T, 100, 352, 0.4, 2)
        np.testing.assert_allclose(
            np.asarray(A)[0], np.array([[1.0, 0, 0], [0, 1.0, 0]]), atol=1e-6
        )


class TestFilters:
    def test_large_and_z(self):
        ok = bu.boxes_to_corners_3d(jnp.array([[0, 0, -1.0, 4, 2, 1.5, 0.2]]), "lwh")
        huge = bu.boxes_to_corners_3d(jnp.array([[0, 0, -1.0, 40, 20, 10, 0.2]]), "lwh")
        flying = bu.boxes_to_corners_3d(jnp.array([[0, 0, 9.0, 4, 2, 1.5, 0.2]]), "lwh")
        assert bool(bu.mask_large_boxes(ok)[0])
        assert not bool(bu.mask_large_boxes(huge)[0])
        assert bool(bu.mask_abnormal_z(ok)[0])
        assert not bool(bu.mask_abnormal_z(flying)[0])

    def test_range_mask(self):
        corners = bu.boxes_to_corners_3d(
            jnp.array([[0, 0, 0, 4, 2, 1.5, 0.0], [200, 0, 0, 4, 2, 1.5, 0.0]]), "lwh"
        )
        m = np.asarray(bu.mask_boxes_range(corners, [-140.8, -40, -3, 140.8, 40, 1]))
        assert m.tolist() == [True, False]


def test_points_in_rotated_boxes():
    boxes = jnp.array([[0.0, 0, 0, 4, 2, 2, jnp.pi / 2]])  # rotated 90deg
    pts = jnp.array([
        [0.0, 0.0, 0.0],    # center -> in
        [0.9, 0.0, 0.0],    # after rotation box extends 1 in x -> in
        [1.5, 0.0, 0.0],    # beyond rotated half-width -> out
        [0.0, 1.9, 0.0],    # within rotated half-length (2) -> in
        [0.0, 0.0, 2.0],    # above -> out
    ])
    m = np.asarray(bu.points_in_rotated_boxes(pts, boxes))
    assert m[0].tolist() == [True, True, False, True, False]


class TestQuadIntersectionFuzz:
    def test_batch_matches_numpy_clipping_oracle(self):
        """The sort-free batched intersection must match a straightforward
        numpy Sutherland-Hodgman implementation on random rotated pairs."""
        def np_clip_area(qa, qb):
            poly = list(qa)
            for k in range(4):
                p1, p2 = qb[k], qb[(k + 1) % 4]
                edge = p2 - p1
                out = []
                for i in range(len(poly)):
                    cur, nxt = poly[i], poly[(i + 1) % len(poly)]
                    dc = edge[0] * (cur - p1)[1] - edge[1] * (cur - p1)[0]
                    dn = edge[0] * (nxt - p1)[1] - edge[1] * (nxt - p1)[0]
                    if dc >= 0:
                        out.append(cur)
                    if (dc >= 0) != (dn >= 0):
                        t = dc / (dc - dn)
                        out.append(cur + t * (nxt - cur))
                poly = out
                if not poly:
                    return 0.0
            x = np.array([p[0] for p in poly])
            y = np.array([p[1] for p in poly])
            return 0.5 * abs(np.dot(x, np.roll(y, -1))
                             - np.dot(y, np.roll(x, -1)))

        rng = np.random.default_rng(0)
        boxes = np.zeros((64, 7), np.float32)
        boxes[:, :2] = rng.uniform(-3, 3, (64, 2))
        boxes[:, 3] = rng.uniform(1, 5, 64)   # l
        boxes[:, 4] = rng.uniform(1, 3, 64)   # w
        boxes[:, 5] = 1.0
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, 64)
        qa = np.asarray(bu.box_to_bev_quad(jnp.asarray(boxes[:32])))
        qb = np.asarray(bu.box_to_bev_quad(jnp.asarray(boxes[32:])))
        got = np.asarray(bu._quad_intersection_area_batch(
            jnp.asarray(qa), jnp.asarray(qb)))
        want = np.array([np_clip_area(a, b) for a, b in zip(qa, qb)])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
