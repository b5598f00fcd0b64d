import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.ops.pose_graph import (
    box_align,
    estimate_relative_pose_2d,
    solve_pose_graph_2d,
)


def test_kabsch_recovers_transform():
    rng = np.random.default_rng(0)
    src = rng.normal(0, 10, (12, 2)).astype(np.float32)
    theta, t = 0.4, np.array([3.0, -1.5])
    R = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    dst = src @ R.T + t
    est = np.asarray(estimate_relative_pose_2d(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(12)))
    np.testing.assert_allclose(est, [t[0], t[1], theta], atol=1e-4)


def test_kabsch_ignores_padded():
    rng = np.random.default_rng(1)
    src = rng.normal(0, 5, (10, 2)).astype(np.float32)
    dst = src + np.array([2.0, 0.0])
    src_p = np.concatenate([src, rng.normal(0, 99, (4, 2))]).astype(np.float32)
    dst_p = np.concatenate([dst, rng.normal(0, 99, (4, 2))]).astype(np.float32)
    w = np.concatenate([np.ones(10), np.zeros(4)]).astype(np.float32)
    est = np.asarray(estimate_relative_pose_2d(
        jnp.asarray(src_p), jnp.asarray(dst_p), jnp.asarray(w)))
    np.testing.assert_allclose(est, [2.0, 0.0, 0.0], atol=1e-4)


def test_pose_graph_corrects_noise():
    # ground-truth poses
    gt = jnp.array([[0.0, 0.0, 0.0], [10.0, 2.0, 0.3], [-4.0, 8.0, -0.5]])

    def rel(i, j):
        ci, si = jnp.cos(gt[i, 2]), jnp.sin(gt[i, 2])
        dx, dy = gt[j, 0] - gt[i, 0], gt[j, 1] - gt[i, 1]
        return jnp.array([ci * dx + si * dy, -si * dx + ci * dy,
                          gt[j, 2] - gt[i, 2]])

    edges_ij = jnp.array([[0, 1], [0, 2], [1, 2]])
    edges_z = jnp.stack([rel(0, 1), rel(0, 2), rel(1, 2)])
    edges_w = jnp.ones(3) * 10.0
    noisy = gt + jnp.array([[0, 0, 0], [1.5, -0.8, 0.1], [-0.9, 1.2, -0.15]])
    out = np.asarray(solve_pose_graph_2d(noisy, edges_ij, edges_z, edges_w))
    np.testing.assert_allclose(out, np.asarray(gt), atol=1e-3)


def test_box_align_end_to_end():
    """Two agents see the same boxes; noisy collaborator pose is corrected."""
    rng = np.random.default_rng(3)
    world_boxes = rng.uniform(-20, 20, (10, 2)).astype(np.float32)
    gt_poses = np.array([[0.0, 0, 0], [5.0, 3.0, 0.6]], np.float32)

    def to_local(pose, pts):
        c, s = np.cos(pose[2]), np.sin(pose[2])
        R = np.array([[c, -s], [s, c]])
        return (pts - pose[:2]) @ R

    boxes = np.stack([to_local(gt_poses[0], world_boxes),
                      to_local(gt_poses[1], world_boxes)])
    noisy = gt_poses + np.array([[0, 0, 0], [0.8, -0.5, 0.08]], np.float32)
    out = np.asarray(box_align(
        jnp.asarray(noisy), jnp.asarray(boxes), jnp.ones((2, 10), bool),
        jnp.ones(2, bool),
    ))
    np.testing.assert_allclose(out[1], gt_poses[1], atol=0.05)
    np.testing.assert_allclose(out[0], gt_poses[0], atol=1e-3)


def test_box_align_eval_driver():
    """pose_graph_pre_calc/evaluate driver parity: alignment must cut the
    injected localization error substantially."""
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.tools.box_align_eval import evaluate_alignment

    frames = [make_frame(SyntheticCfg(num_agents=3, num_objects=10,
                                      points_per_agent=2000, seed=s))
              for s in range(4)]
    out = evaluate_alignment(frames, pos_std=0.4, yaw_std_deg=2.0,
                             max_cav=3, seed=0)
    assert out["pos_err_after_m"] < out["pos_err_before_m"] * 0.25
    assert out["yaw_err_after_deg"] < out["yaw_err_before_deg"]
