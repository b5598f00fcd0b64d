import json
import numpy as np
import pytest

from quantv2x_tpu.data.dairv2x import DAIRV2XDataset


@pytest.fixture
def fake_dair(tmp_path):
    root = tmp_path
    (root / "cooperative").mkdir()
    (root / "cooperative" / "label").mkdir()
    for side, fid in (("vehicle-side", "000001"), ("infrastructure-side", "000011")):
        for sub in ("velodyne", "calib/lidar_to_novatel", "calib/novatel_to_world",
                    "calib/virtuallidar_to_world"):
            (root / side / sub).mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    rng.normal(0, 10, (300, 4)).astype(np.float32).tofile(
        root / "vehicle-side/velodyne/000001.bin")
    rng.normal(0, 10, (300, 4)).astype(np.float32).tofile(
        root / "infrastructure-side/velodyne/000011.bin")
    eye = {"rotation": np.eye(3).tolist(), "translation": [[0], [0], [0]]}
    shift = {"rotation": np.eye(3).tolist(), "translation": [[10], [5], [0]]}
    (root / "vehicle-side/calib/lidar_to_novatel/000001.json").write_text(json.dumps(eye))
    (root / "vehicle-side/calib/novatel_to_world/000001.json").write_text(json.dumps(eye))
    (root / "infrastructure-side/calib/virtuallidar_to_world/000011.json").write_text(json.dumps(shift))
    label = [{"3d_location": {"x": 4.0, "y": 2.0, "z": -1.0},
              "3d_dimensions": {"l": 4.5, "w": 1.9, "h": 1.6},
              "rotation": 0.3, "type": "Car"}]
    (root / "cooperative/label/000001.json").write_text(json.dumps(label))
    info = [{"vehicle_pointcloud_path": "vehicle-side/velodyne/000001.bin",
             "infrastructure_pointcloud_path": "infrastructure-side/velodyne/000011.bin",
             "cooperative_label_path": "cooperative/label/000001.json"}]
    (root / "cooperative/data_info.json").write_text(json.dumps(info))
    split = root / "split.json"
    split.write_text(json.dumps(["000001"]))
    return str(root), str(split)


def test_dair_frame_contract(fake_dair):
    root, split = fake_dair
    ds = DAIRV2XDataset(root, split, max_points=400)
    assert len(ds) == 1
    f = ds[0]
    assert f["agent_points"].shape == (2, 400, 4)
    assert f["agent_mask"].tolist() == [True, True]
    # infra pose carries the world shift
    np.testing.assert_allclose(f["agent_poses"][1][:2], [10.0, 5.0])
    gt = f["gt_boxes"][f["gt_mask"]]
    # ego pose is identity -> world label passes through
    np.testing.assert_allclose(gt[0][:3], [4.0, 2.0, -1.0], atol=1e-5)
    np.testing.assert_allclose(gt[0][3:6], [1.6, 1.9, 4.5], atol=1e-5)
    assert f["gt_classes"][0] == 1
