"""Camera data path end to end: on-disk OPV2V-layout fixtures -> dataset
-> frame_to_batch -> heter lidar+camera model -> finite predictions.

Parity: opv2v_basedataset.py:54-65,275-293 (camera file loading) and
get_ext_int:506-518 (intrinsic/extrinsic assembly, UE4->OpenCV swap).
"""

import os

import numpy as np
import pytest
import yaml

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from quantv2x_tpu.data.dataset import (V2XDataset, build_frame_source,
                                       camera_rig_from_params)
from quantv2x_tpu.data.pipeline import frame_to_batch
from quantv2x_tpu.data.voxelizer import VoxelCfg

RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)
VOXEL = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 4.0),
                 max_points_per_voxel=8, max_voxels=512)


def _write_png(path, value, hw=(60, 80)):
    from PIL import Image
    arr = np.full(hw + (3,), value, np.uint8)
    Image.fromarray(arr).save(path)


def _cam_entry(x, y, z=1.8, yaw=0.0):
    return {
        "cords": [x, y, z, 0.0, yaw, 0.0],
        "extrinsic": np.eye(4).tolist(),
        "intrinsic": [[100.0, 0.0, 40.0], [0.0, 100.0, 30.0],
                      [0.0, 0.0, 1.0]],
        "image_h": 60, "image_w": 80,
    }


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("opv2v_cam")
    rng = np.random.default_rng(0)
    for cav, (cx, cy) in [("641", (0.0, 0.0)), ("650", (6.0, 2.0))]:
        cdir = root / "scene0" / cav
        os.makedirs(cdir)
        for ts in ("000068", "000070"):
            params = {
                "lidar_pose": [cx, cy, 1.9, 0.0, 0.0, 0.0],
                "camera0": _cam_entry(cx + 0.5, cy, yaw=0.0),
                "camera1": _cam_entry(cx - 0.5, cy, yaw=180.0),
                "vehicles": {
                    "7": {
                        "location": [cx + 5.0, cy + 1.0, 0.0],
                        "center": [0.0, 0.0, 0.75],
                        "extent": [2.2, 1.0, 0.75],
                        "angle": [0.0, 10.0, 0.0],
                    }
                },
            }
            with open(cdir / f"{ts}.yaml", "w") as f:
                yaml.safe_dump(params, f)
            pts = rng.uniform(-15, 15, (500, 4)).astype(np.float32)
            pts.tofile(cdir / f"{ts}.bin")
            for ci in range(2):
                _write_png(cdir / f"{ts}_camera{ci}.png",
                           value=50 * (ci + 1))
    return str(root)


def test_dataset_loads_cameras(tree):
    ds = V2XDataset(tree, max_cav=2, load_cameras=True, num_cams=2,
                    image_size=(32, 48))
    assert len(ds) == 2
    f = ds[0]
    assert f["camera_imgs"].shape == (2, 2, 32, 48, 3)
    # pixel values survive load+resize (constant images)
    np.testing.assert_allclose(f["camera_imgs"][0, 0], 50 / 255.0,
                               atol=1e-3)
    np.testing.assert_allclose(f["camera_imgs"][1, 1], 100 / 255.0,
                               atol=1e-3)
    # intrinsics rescaled from the native 60x80 to 32x48
    K = f["camera_intrinsics"][0, 0]
    np.testing.assert_allclose(K[0, 0], 100.0 * 48 / 80, rtol=1e-5)
    np.testing.assert_allclose(K[1, 1], 100.0 * 32 / 60, rtol=1e-5)
    # camera0 sits +0.5 m ahead of the lidar in x: cam->lidar translation
    assert abs(f["camera_trans"][0, 0, 0] - 0.5) < 1e-3
    # UE4->OpenCV swap: camera z (forward) maps to lidar x
    np.testing.assert_allclose(f["camera_rots"][0, 0] @ [0, 0, 1],
                               [1, 0, 0], atol=1e-5)


def test_build_frame_source_camera_flag(tree):
    hypes = {"root_dir": tree, "input_source": ["lidar", "camera"],
             "comm_range": 70,
             "heter": {"modality_setting": {
                 "m2": {"core_method": "lift_splat_shoot",
                        "sensor_type": "camera",
                        "image_size": [32, 48], "num_cams": 2}}}}
    ds = build_frame_source(hypes, max_cav=2)
    assert ds.load_cameras and ds.image_size == (32, 48) and ds.num_cams == 2
    assert "camera_imgs" in ds[0]


def test_heter_lidar_camera_end_to_end(tree):
    from quantv2x_tpu.data import anchors as anc
    from quantv2x_tpu.data.postprocess import PostprocessCfg, decode_detections
    from quantv2x_tpu.models.collab_model import ModelCfg
    from quantv2x_tpu.models.heter_model import HeterCollabModel, ModalityCfg

    ds = V2XDataset(tree, max_cav=2, load_cameras=True, num_cams=2,
                    image_size=(32, 48))
    batch = dict(frame_to_batch(ds[0], VOXEL, max_cav=2))
    batch["agent_modality"] = jnp.array([[0, 1]])  # ego lidar, cav camera

    model = HeterCollabModel(
        ModelCfg(voxel=VOXEL, max_cav=2),
        modalities=(
            ModalityCfg("m1", "point_pillar"),
            ModalityCfg("m2", "lift_splat_shoot", image_size=(32, 48),
                        aligner="conv"),
        ),
    )
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False))(batch)
    out = model.apply(variables, batch, train=False)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()

    acfg = anc.AnchorGridCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 4.0),
                             feature_stride=2, classes=anc.V2XREAL_CLASSES)
    anchors = anc.generate_anchors(acfg)[0]
    det = decode_detections(
        out["cls_preds"][0], out["reg_preds"][0], anchors,
        PostprocessCfg(gt_range=RANGE, pre_nms_top_k=64, max_detections=32),
        dir_preds=out["dir_preds"][0])
    assert det["boxes"].shape == (32, 7)
    # the camera branch params actually received gradients-worthy inputs:
    # zeroing them must change predictions
    p2 = jax.tree.map(lambda x: x, variables["params"])
    key = [k for k in p2 if k.startswith("lss_")][0]
    p2[key] = jax.tree.map(lambda x: x * 0.0, p2[key])
    out2 = model.apply({**variables, "params": p2}, batch, train=False)
    assert not np.allclose(np.asarray(out["cls_preds"]),
                           np.asarray(out2["cls_preds"]))


def test_heter_camera_config_train_and_infer(tree, tmp_path):
    """Drive configs/v2x_real/heter_lidar_camera_pyramid.yaml from the
    on-disk fixture tree through tools/train + tools/inference (the
    VERDICT r1 'camera path end to end' gate)."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    small_range = [-19.2, -19.2, -3.0, 19.2, 19.2, 1.0]
    cfg = {
        "extends": os.path.join(
            repo, "configs/v2x_real/heter_lidar_camera_pyramid.yaml"),
        "root_dir": tree,
        "validate_dir": tree,
        "input_source": ["lidar", "camera"],
        "cav_lidar_range": small_range,
        "train_params": {"batch_size": 2, "epoches": 1, "max_cav": 2},
        "preprocess": {"args": {"max_voxel_train": 512,
                                "max_voxel_test": 512}},
        "postprocess": {"gt_range": small_range},
        "heter": {"modality_setting": {
            "m4": {"img_params": {"final_dim": [32, 48], "num_cams": 2}}}},
    }
    cfg_path = tmp_path / "heter_cam_small.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    run_dir = tmp_path / "run"
    env = dict(os.environ, JAX_PLATFORMS="cpu", QV2X_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "quantv2x_tpu.tools.train", "-y",
         str(cfg_path), "--run_dir", str(run_dir), "--synthetic", "0",
         "--max_frames", "2", "--epochs", "2", "--batch_size", "2",
         "--max_cav", "2", "--save_freq", "2"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]
    out_json = tmp_path / "eval.json"
    r = subprocess.run(
        [sys.executable, "-m", "quantv2x_tpu.tools.inference", "-y",
         str(cfg_path), "--run_dir", str(run_dir), "--synthetic", "2",
         "--calib", "1", "--max_cav", "2", "--json", str(out_json)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:]
    res = json.loads(out_json.read_text())
    assert "ap" in res and res["frames"] == 2
