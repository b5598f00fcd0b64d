"""Tests for the V2X-Sim pickle-index dataset loader (synthetic fixture)."""

import os
import pickle

import numpy as np
import pytest

from quantv2x_tpu.data.v2xsim import (
    V2XSIMDataset,
    project_world_boxes_v2x,
    tfm_to_pose,
)


def _yaw_T(x, y, z, yaw):
    T = np.eye(4)
    c, s = np.cos(yaw), np.sin(yaw)
    T[:2, :2] = [[c, -s], [s, c]]
    T[:3, 3] = [x, y, z]
    return T


def _make_fixture(tmp_path, n_scenes=2, agent_num=2):
    info = []
    rng = np.random.default_rng(0)
    for si in range(n_scenes):
        scene = {"agent_num": agent_num}
        for cid in range(1, agent_num + 1):
            pts = np.concatenate(
                [rng.uniform(-20, 20, (500, 3)),
                 rng.random((500, 1)), np.zeros((500, 1))],
                axis=1).astype(np.float32)
            # plant points at the object location in world->agent frame
            path = tmp_path / f"s{si}_a{cid}.bin"
            T = _yaw_T(10.0 * cid, 0.0, 1.9, 0.0)
            obj_world = np.array([10.0 * cid + 5.0, 2.0, 0.0])
            obj_local = (np.linalg.inv(T)[:3, :3] @ obj_world
                         + np.linalg.inv(T)[:3, 3])
            plant = np.tile(np.append(obj_local, [0.5, 0.0]), (20, 1))
            pts = np.concatenate([pts, plant.astype(np.float32)])
            pts.tofile(path)
            scene[f"lidar_path_{cid}"] = str(path)
            scene[f"lidar_pose_{cid}"] = T
            # one box at obj_world with identity quat, one far outside range
            scene[f"labels_{cid}"] = {
                "gt_boxes_global": np.array([
                    [obj_world[0], obj_world[1], obj_world[2],
                     4.0, 2.0, 1.5, 1.0, 0, 0, 0],
                    [500.0, 500.0, 0.0, 4.0, 2.0, 1.5, 1.0, 0, 0, 0],
                ]),
                "gt_object_ids": np.array([1, 2]),
            }
        info.append(scene)
    p = tmp_path / "v2xsim_infos.pkl"
    with open(p, "wb") as f:
        pickle.dump(info, f)
    return str(p)


class TestProjection:
    def test_world_to_ego_translation(self):
        T = _yaw_T(5.0, 0.0, 0.0, 0.0)
        boxes = np.array([[7.0, 1.0, 0.0, 4.0, 2.0, 1.5, 1.0, 0, 0, 0]])
        out, mask = project_world_boxes_v2x(
            boxes, T, (-32, -32, -3, 32, 32, 2), None, 10)
        assert mask[0]
        np.testing.assert_allclose(out[0][:3], [2.0, 1.0, 0.0], atol=1e-6)
        # hwl order
        np.testing.assert_allclose(out[0][3:6], [1.5, 2.0, 4.0], atol=1e-6)

    def test_rotated_ego_yaw_adjusts(self):
        T = _yaw_T(0.0, 0.0, 0.0, np.pi / 2)
        boxes = np.array([[0.0, 4.0, 0.0, 4.0, 2.0, 1.5, 1.0, 0, 0, 0]])
        out, mask = project_world_boxes_v2x(
            boxes, T, (-32, -32, -3, 32, 32, 2), None, 10)
        assert mask[0]
        np.testing.assert_allclose(out[0][:2], [4.0, 0.0], atol=1e-6)
        assert out[0][6] == pytest.approx(-np.pi / 2, abs=1e-6)

    def test_range_filter(self):
        T = np.eye(4)
        boxes = np.array([[100.0, 0.0, 0.0, 4.0, 2.0, 1.5, 1.0, 0, 0, 0]])
        _, mask = project_world_boxes_v2x(
            boxes, T, (-32, -32, -3, 32, 32, 2), None, 10)
        assert not mask.any()

    def test_lidar_hit_filter(self):
        T = np.eye(4)
        boxes = np.array([[5.0, 0.0, 0.0, 4.0, 2.0, 1.5, 1.0, 0, 0, 0]])
        pts_miss = np.array([[20.0, 20.0, 0.0, 1.0]])
        _, m1 = project_world_boxes_v2x(
            boxes, T, (-32, -32, -3, 32, 32, 2), pts_miss, 10)
        assert not m1.any()
        pts_hit = np.array([[5.2, 0.3, 0.2, 1.0]])
        _, m2 = project_world_boxes_v2x(
            boxes, T, (-32, -32, -3, 32, 32, 2), pts_hit, 10)
        assert m2[0]


class TestDataset:
    def test_frame_contract(self, tmp_path):
        p = _make_fixture(tmp_path)
        ds = V2XSIMDataset(p, max_cav=3, max_points=1000, train=False)
        assert len(ds) == 2
        f = ds[0]
        assert f["agent_points"].shape == (3, 1000, 4)
        assert f["agent_mask"].tolist() == [True, True, False]
        assert f["gt_mask"].sum() == 1          # far box filtered
        b = f["gt_boxes"][0]
        # ego = cav 1 at x=10 -> object at world x=15 -> ego x=5
        np.testing.assert_allclose(b[:3], [5.0, 2.0, -1.9], atol=1e-5)

    def test_tfm_pose_roundtrip(self):
        T = _yaw_T(1.0, 2.0, 3.0, 0.7)
        pose = tfm_to_pose(T)
        np.testing.assert_allclose(pose[:3], [1.0, 2.0, 3.0], atol=1e-6)
        # frame-contract order: yaw at index 4 (np_pose_to_world reads it
        # there — a pitch/yaw swap warps collaborators around the wrong axis)
        assert pose[4] == pytest.approx(np.degrees(0.7), abs=1e-4)
        assert pose[5] == pytest.approx(0.0, abs=1e-4)
        # the real invariant: pose_to_world(tfm_to_pose(T)) == T
        from quantv2x_tpu.utils.transformation import np_pose_to_world
        np.testing.assert_allclose(np_pose_to_world(pose), T, atol=1e-5)

    def test_train_permutes_ego(self, tmp_path):
        p = _make_fixture(tmp_path, n_scenes=1, agent_num=4)
        ds = V2XSIMDataset(p, max_cav=4, max_points=1000, train=True,
                           require_lidar_hit=False, seed=1)
        poses = set()
        for _ in range(8):
            f = ds[0]
            poses.add(tuple(np.round(f["agent_poses"][0], 3)))
            ds.reinitialize()
        assert len(poses) > 1  # ego varies across epochs
