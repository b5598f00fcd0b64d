"""Box-align pose correction in the data path (parity:
intermediate_heter_fusion_3class_dataset.py:399-427)."""

import numpy as np
import pytest
import yaml

from quantv2x_tpu.data.box_align import (
    BoxAlignCfg,
    apply_box_align,
    gt_world_centers,
    load_stage1_cache,
    save_stage1_cache,
    simulate_stage1_from_gt,
)


def _make_frame(rng, n_obj=8, n_agents=3):
    """Synthetic-convention frame: ego at origin, world == ego frame."""
    poses = np.zeros((n_agents, 6), np.float32)
    poses[1] = [18.0, -6.0, 0.0, 0.0, 30.0, 0.0]
    poses[2] = [-12.0, 10.0, 0.0, 0.0, -50.0, 0.0]
    gt = np.zeros((n_obj, 7), np.float32)
    # well-separated objects: greedy matching needs unambiguous pairs
    xs, ys = np.meshgrid([-24.0, -8.0, 8.0, 24.0], [-15.0, 15.0])
    gt[:, 0] = xs.ravel()[:n_obj]
    gt[:, 1] = ys.ravel()[:n_obj]
    gt[:, 3:6] = [1.6, 1.9, 4.5]
    return {
        "agent_poses": poses,
        "agent_mask": np.ones(n_agents, bool),
        "gt_boxes": gt,
        "gt_classes": np.ones(n_obj, np.int32),
        "gt_mask": np.ones(n_obj, bool),
    }


def test_apply_box_align_recovers_pose_noise():
    rng = np.random.default_rng(0)
    frame = _make_frame(rng)
    cfg = BoxAlignCfg(enabled=True)
    world = gt_world_centers(frame["gt_boxes"], frame["agent_poses"][0])
    centers, mask = simulate_stage1_from_gt(
        world, frame["gt_mask"], frame["agent_poses"],
        frame["agent_mask"], cfg.max_boxes)

    noisy = dict(frame)
    poses = np.copy(frame["agent_poses"])
    poses[1, 0] += 0.8
    poses[1, 1] -= 0.5
    poses[1, 4] += 3.0
    poses[2, 0] -= 0.6
    poses[2, 4] -= 2.0
    noisy["agent_poses"] = poses

    out = apply_box_align(noisy, centers, mask, cfg)
    # ego gauge-fixed
    np.testing.assert_allclose(out["agent_poses"][0],
                               frame["agent_poses"][0], atol=1e-5)
    # collaborators recovered to well under the injected error
    for a in (1, 2):
        pos_err = np.linalg.norm(out["agent_poses"][a, :2]
                                 - frame["agent_poses"][a, :2])
        yaw_err = abs(out["agent_poses"][a, 4] - frame["agent_poses"][a, 4])
        assert pos_err < 0.1, f"agent {a}: pos_err {pos_err}"
        assert yaw_err < 0.3, f"agent {a}: yaw_err {yaw_err}"


def test_stage1_cache_roundtrip(tmp_path):
    centers = np.random.default_rng(1).normal(0, 10, (2, 5, 2)).astype(
        np.float32)
    mask = np.array([[1, 1, 0, 0, 0], [1, 1, 1, 0, 0]], bool)
    save_stage1_cache(str(tmp_path), "scene_x", "000068", ["1", "-2"],
                      centers, mask)
    got = load_stage1_cache(str(tmp_path), "scene_x", "000068")
    assert set(got) == {"1", "-2"}
    np.testing.assert_allclose(got["-2"][0], centers[1])
    assert load_stage1_cache(str(tmp_path), "scene_x", "999999") is None


def test_dataset_getitem_corrects_noisy_yaml_pose(tmp_path):
    """A tree whose cav-2 yaml pose carries localization error; the stage-1
    cache is built from the TRUE geometry — __getitem__ must return the
    corrected pose, not the yaml one."""
    from quantv2x_tpu.data.dataset import V2XDataset

    rng = np.random.default_rng(2)
    true_pose_2 = np.array([20.0, 8.0, 1.9, 0.0, 45.0, 0.0])
    noisy_pose_2 = true_pose_2 + [0.9, -0.7, 0.0, 0.0, 4.0, 0.0]
    objs = {}
    xs, ys = np.meshgrid([-22.0, -7.0, 7.0, 22.0], [-14.0, 14.0])
    obj_xy = np.stack([xs.ravel(), ys.ravel()], axis=-1)
    for i, (x, y) in enumerate(obj_xy):
        objs[str(10 + i)] = {
            "location": [float(x), float(y), 0.0],
            "extent": [2.25, 0.95, 0.8],
            "angle": [0.0, float(rng.uniform(-90, 90)), 0.0],
            "obj_type": "Car",
        }
    root = tmp_path / "ba_root"
    for cav, pose in (("1", [0.0] * 6), ("2", noisy_pose_2.tolist())):
        d = root / "s0" / cav
        d.mkdir(parents=True)
        (d / "000068.yaml").write_text(yaml.safe_dump(
            {"lidar_pose": pose, "vehicles": objs}))
        np.zeros((10, 4), np.float32).tofile(d / "000068.bin")

    # stage-1 cache from TRUE poses (world == yaml locations here)
    true_poses = np.zeros((2, 6), np.float32)
    true_poses[1] = true_pose_2
    world = np.asarray(obj_xy, np.float32)
    centers, mask = simulate_stage1_from_gt(
        world, np.ones(len(world), bool), true_poses, np.ones(2, bool), 32)
    stage1 = tmp_path / "stage1"
    save_stage1_cache(str(stage1), "s0", "000068", ["1", "2"], centers, mask)

    cfg = BoxAlignCfg(enabled=True, stage1_dir=str(stage1))
    ds = V2XDataset(str(root), "v2v", max_cav=2, max_points=20,
                    box_align=cfg)
    frame = ds[0]
    got = frame["agent_poses"][1]
    assert np.linalg.norm(got[:2] - true_pose_2[:2]) < 0.15
    assert abs(got[4] - true_pose_2[4]) < 0.5

    # without the cfg the yaml (noisy) pose passes through
    ds_off = V2XDataset(str(root), "v2v", max_cav=2, max_points=20)
    off = ds_off[0]["agent_poses"][1]
    assert np.linalg.norm(off[:2] - noisy_pose_2[:2]) < 1e-4


def test_box_align_cfg_from_hypes():
    assert BoxAlignCfg.from_hypes(None) is None
    assert BoxAlignCfg.from_hypes(False) is None
    c = BoxAlignCfg.from_hypes(True)
    assert c.enabled and c.stage1_dir is None
    c = BoxAlignCfg.from_hypes({"stage1_dir": "/x", "gn_iters": 5})
    assert c.enabled and c.stage1_dir == "/x" and c.gn_iters == 5
