"""On-disk synthetic dataset roundtrip + streaming-train smoke test."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from quantv2x_tpu.data.dataset import V2XDataset
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.tools.make_synthetic_dataset import generate, write_frame

RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)


def test_roundtrip_matches_make_frame(tmp_path):
    """Writing a frame to disk and re-loading it reproduces the in-memory
    contract: points, poses, and ego-frame GT boxes (hwl + yaw)."""
    cfg = SyntheticCfg(lidar_range=RANGE, num_agents=2, num_objects=5,
                       points_per_agent=2000, seed=7)
    frame, world = make_frame(cfg, return_world=True)
    scen = tmp_path / "scene0000"
    write_frame(frame, world, str(scen), "000000", ["641", "650"])

    ds = V2XDataset(str(tmp_path), max_cav=2, max_points=4000,
                    max_objects=150)
    got = ds[0]
    # points roundtrip exactly (float32 tofile/fromfile)
    n0 = frame["agent_points_mask"][0].sum()
    np.testing.assert_allclose(
        got["agent_points"][0][:n0], frame["agent_points"][0][:n0],
        rtol=1e-6)
    np.testing.assert_allclose(got["agent_poses"][:2],
                               frame["agent_poses"], atol=1e-5)
    # ego-frame GT: same boxes up to ordering (dict merge may reorder)
    n_gt = int(frame["gt_mask"].sum())
    a = np.asarray(frame["gt_boxes"][:n_gt])
    b = np.asarray(got["gt_boxes"][:n_gt])
    order_a = np.lexsort((a[:, 1], a[:, 0]))
    order_b = np.lexsort((b[:, 1], b[:, 0]))
    a, b = a[order_a], b[order_b]
    np.testing.assert_allclose(a[:, :6], b[:, :6], atol=1e-3)
    # yaw equal mod 2pi
    dyaw = np.abs(np.angle(np.exp(1j * (a[:, 6] - b[:, 6]))))
    assert dyaw.max() < 1e-3
    assert (np.asarray(got["gt_classes"][:n_gt])[order_b]
            == np.asarray(frame["gt_classes"][:n_gt])[order_a]).all()


def test_streaming_train_from_tree(tmp_path):
    """tools/train.py --synthetic 0 default path: streams the tree with
    per-epoch augmentation and best-val checkpointing."""
    train_dir = tmp_path / "train"
    val_dir = tmp_path / "val"
    generate(str(train_dir), scenarios=2, timestamps=3, cavs=2,
             objects=5, points=2000, lidar_range=RANGE, seed=0)
    generate(str(val_dir), scenarios=1, timestamps=2, cavs=2,
             objects=5, points=2000, lidar_range=RANGE, seed=999)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = {
        "extends": os.path.join(repo,
                                "configs/v2x_real/lidar_pyramid_small.yaml"),
        "root_dir": str(train_dir),
        "validate_dir": str(val_dir),
        "cav_lidar_range": list(RANGE),
        "postprocess": {"gt_range": list(RANGE)},
        "preprocess": {"args": {"max_voxel_train": 512,
                                "max_voxel_test": 512}},
    }
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run_dir = tmp_path / "run"
    env = dict(os.environ, JAX_PLATFORMS="cpu", QV2X_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "quantv2x_tpu.tools.train", "-y",
         str(cfg_path), "--run_dir", str(run_dir), "--synthetic", "0",
         "--epochs", "2", "--batch_size", "2", "--max_cav", "2",
         "--augment", "--val_frames", "2", "--save_freq", "2"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "streaming" in r.stdout
    log = [json.loads(x) for x in
           open(run_dir / "train_log.jsonl").read().splitlines()]
    assert len(log) == 2 and log[0]["steps"] == 3  # 6 frames / bs 2
    assert "val_loss" in log[0]
    assert (run_dir / "best").exists()
