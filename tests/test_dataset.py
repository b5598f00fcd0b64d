import os

import numpy as np
import pytest
import yaml

from quantv2x_tpu.data.dataset import V2XDataset, class_name_to_id, load_lidar


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    """Fabricate a two-scenario OPV2V-format tree with 2 cavs + 1 infra."""
    root = tmp_path_factory.mktemp("v2xreal")
    rng = np.random.default_rng(0)
    car_world = {"location": [10.0, 5.0, 0.0], "extent": [2.25, 0.95, 0.8],
                 "angle": [0.0, 30.0, 0.0], "obj_type": "Car"}
    ped_world = {"location": [-5.0, 2.0, 0.0], "extent": [0.35, 0.35, 0.85],
                 "angle": [0.0, 0.0, 0.0], "obj_type": "Pedestrian"}
    poses = {"1": [0, 0, 1.9, 0, 0, 0], "2": [20, 8, 1.9, 0, 45, 0],
             "-1": [100, 100, 4.0, 0, 90, 0]}  # infra far away
    for scen in ("scene_a", "scene_b"):
        for cav, pose in poses.items():
            d = root / scen / cav
            d.mkdir(parents=True)
            for ts in ("000068", "000070"):
                params = {
                    "lidar_pose": pose,
                    "vehicles": {"10": car_world, "11": ped_world},
                }
                (d / f"{ts}.yaml").write_text(yaml.safe_dump(params))
                pts = rng.normal(0, 10, (500, 4)).astype(np.float32)
                pts.tofile(d / f"{ts}.bin")
    return str(root)


class TestScan:
    def test_modes(self, fake_root):
        ds_vc = V2XDataset(fake_root, "vc", max_cav=4, max_points=600)
        ds_v2v = V2XDataset(fake_root, "v2v", max_cav=4, max_points=600)
        ds_i2i = V2XDataset(fake_root, "i2i", max_cav=4, max_points=600)
        assert len(ds_vc) == 4  # 2 scenarios x 2 timestamps
        s = ds_vc.scenarios[0]
        assert list(s["cavs"]) == ["1", "2", "-1"]  # vehicles first
        assert list(ds_v2v.scenarios[0]["cavs"]) == ["1", "2"]
        assert list(ds_i2i.scenarios[0]["cavs"]) == ["-1"]

    def test_comm_range_filters_far_infra(self, fake_root):
        ds = V2XDataset(fake_root, "vc", max_cav=4, max_points=600,
                        comm_range=70.0)
        frame = ds[0]
        # infra at (100,100) is ~141 m away -> dropped; 2 agents remain
        assert frame["agent_mask"].sum() == 2

    def test_gt_projection(self, fake_root):
        ds = V2XDataset(fake_root, "v2v", max_cav=2, max_points=600)
        frame = ds[0]
        gt = frame["gt_boxes"][frame["gt_mask"]]
        cls = frame["gt_classes"][frame["gt_mask"]]
        assert len(gt) == 2
        car = gt[cls == 1][0]
        # ego pose is origin with zero yaw -> world coords pass through
        # (minus lidar z offset 1.9)
        np.testing.assert_allclose(car[:3], [10.0, 5.0, -1.9], atol=1e-4)
        np.testing.assert_allclose(car[3:6], [1.6, 1.9, 4.5], atol=1e-5)  # hwl
        assert car[6] == pytest.approx(np.radians(30.0), abs=1e-5)
        assert set(cls.tolist()) == {1, 2}

    def test_gt_yaw_in_rotated_ego_frame(self, fake_root):
        ds = V2XDataset(fake_root, "v2v", max_cav=2, max_points=600)
        frame = ds[0]
        # second agent has yaw 45 deg; check its pose was loaded
        assert frame["agent_poses"][1][4] == pytest.approx(45.0)

    def test_points_loaded(self, fake_root):
        ds = V2XDataset(fake_root, "v2v", max_cav=2, max_points=600)
        frame = ds[0]
        assert frame["agent_points_mask"][0].sum() == 500

    def test_class_mapping(self):
        assert class_name_to_id("Car") == 1
        assert class_name_to_id("BicycleRider") == 2
        assert class_name_to_id("ConcreteTruck") == 3
        assert class_name_to_id("truck-ish-unknown") == 3
        assert class_name_to_id(None) == 1


def test_pipeline_integration(fake_root):
    """Dataset frames flow through the device pipeline unchanged."""
    import jax
    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.voxelizer import VoxelCfg

    ds = V2XDataset(fake_root, "v2v", max_cav=2, max_points=600)
    voxel = VoxelCfg(lidar_range=(-19.2, -19.2, -3.0, 19.2, 19.2, 1.0),
                     voxel_size=(0.4, 0.4, 4.0), max_points_per_voxel=8,
                     max_voxels=512)
    batch = frame_to_batch(ds[0], voxel, max_cav=2)
    assert batch["voxel_features"].shape[:2] == (1, 2)
    assert bool(batch["voxel_mask"].any())


class TestV2XSET:
    def test_alias_loads_same_format(self, fake_root):
        from quantv2x_tpu.data.dataset import V2XSETDataset

        ds = V2XSETDataset(fake_root, dataset_mode="v2v", max_cav=2,
                           max_points=1000)
        f = ds[0]
        assert f["agent_points"].shape == (2, 1000, 4)
        assert f["gt_mask"].any()

    def test_broken_scenario_dropped(self, tmp_path, fake_root):
        import shutil
        from quantv2x_tpu.data.dataset import V2XSETDataset

        root = tmp_path / "v2xset"
        shutil.copytree(fake_root, root)
        shutil.move(str(root / "scene_a"),
                    str(root / "2021_09_09_13_20_58"))
        ds = V2XSETDataset(str(root), dataset_mode="v2v", max_cav=2,
                           max_points=1000)
        names = {s["name"] for s in ds.scenarios}
        assert "2021_09_09_13_20_58" not in names
        assert "scene_b" in names


class TestTimeDelay:
    """wild_setting async parity (v2xreal_basedataset.py:89-122,483-513)."""

    def _tree(self, tmp_path):
        import yaml as _yaml
        root = tmp_path / "delay_root"
        for cav, poses in {"1": {"000068": [0, 0, 0, 0, 0, 0],
                                 "000070": [1, 0, 0, 0, 0, 0]},
                           "2": {"000068": [10, 0, 0, 0, 0, 0],
                                 "000070": [11, 0, 0, 0, 0, 0]}}.items():
            d = root / "s0" / cav
            d.mkdir(parents=True)
            for ts, pose in poses.items():
                (d / f"{ts}.yaml").write_text(_yaml.safe_dump(
                    {"lidar_pose": pose, "vehicles": {}}))
                np.zeros((10, 4), np.float32).tofile(d / f"{ts}.bin")
        return str(root)

    def test_sim_mode_one_frame_stale(self, tmp_path):
        from quantv2x_tpu.data.noise_sim import WildCfg
        root = self._tree(tmp_path)
        wild = WildCfg(async_flag=True, async_mode="sim", async_overhead=100)
        ds = V2XDataset(root, "v2v", max_cav=2, max_points=20, wild=wild)
        frame = ds[1]  # second timestamp
        # ego is current (x=1); cav 2 is delayed 100ms -> 1 frame (x=10)
        assert frame["agent_poses"][0][0] == pytest.approx(1.0)
        assert frame["agent_poses"][1][0] == pytest.approx(10.0)

    def test_delay_clamped_at_sequence_start(self, tmp_path):
        from quantv2x_tpu.data.noise_sim import WildCfg
        root = self._tree(tmp_path)
        wild = WildCfg(async_flag=True, async_mode="sim", async_overhead=500)
        ds = V2XDataset(root, "v2v", max_cav=2, max_points=20, wild=wild)
        frame = ds[0]
        assert frame["agent_poses"][1][0] == pytest.approx(10.0)

    def test_real_mode_delay_formula(self):
        from quantv2x_tpu.data.noise_sim import WildCfg, time_delay_frames
        rng = np.random.default_rng(0)
        # zero overhead noise bound: delay = data_size/speed*1000 + backbone
        cfg = WildCfg(async_flag=True, async_mode="real", async_overhead=0.0,
                      data_size=2.7, transmission_speed=27.0,
                      backbone_delay=50.0)
        # 2.7/27*1000 + 50 = 150 ms -> 1 frame @ 10 Hz
        assert time_delay_frames(cfg, rng, ego=False) == 1
        assert time_delay_frames(cfg, rng, ego=True) == 0

    def test_disabled_is_noop(self, tmp_path):
        from quantv2x_tpu.data.noise_sim import WildCfg
        root = self._tree(tmp_path)
        ds = V2XDataset(root, "v2v", max_cav=2, max_points=20,
                        wild=WildCfg())
        assert ds[1]["agent_poses"][1][0] == pytest.approx(11.0)


def test_reinitialize_reshuffles_cav_order(fake_root):
    """Parity: basedataset.reinitialize() per-epoch cav reshuffle — ego
    rotates among eligible agents, infra stays behind vehicles in vc."""
    ds = V2XDataset(fake_root, "vc", max_cav=4, max_points=600, seed=3)
    orders = set()
    for _ in range(8):
        ds.reinitialize()
        ids = tuple(ds.scenarios[0]["cavs"].keys())
        orders.add(ids)
        # vc mode: vehicles first, infra (-1) last — preserved by reshuffle
        assert ids[-1] == "-1" and set(ids[:-1]) == {"1", "2"}
        frame = ds[0]  # still loads fine after reshuffle
        assert frame["agent_points"].shape[-1] == 4
    assert len(orders) > 1, "reinitialize never changed the cav order"


class TestPrefetchLoader:
    def test_matches_sequential_order(self, fake_root):
        from quantv2x_tpu.data.loader import PrefetchLoader
        from quantv2x_tpu.data.pipeline import frame_to_batch
        from quantv2x_tpu.data.voxelizer import VoxelCfg

        vox = VoxelCfg(lidar_range=(-30, -30, -3, 30, 30, 1),
                       voxel_size=(0.4, 0.4, 4.0),
                       max_points_per_voxel=4, max_voxels=256)
        ds = V2XDataset(fake_root, "v2v", max_cav=2, max_points=600)
        loader = PrefetchLoader(ds, vox, max_cav=2, workers=3, prefetch=2)
        got = list(loader)
        assert len(got) == len(ds)
        want = [frame_to_batch(ds[i], vox, max_cav=2) for i in range(len(ds))]
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g["voxel_features"]),
                                          np.asarray(w["voxel_features"]))

    def test_epochs_shuffle_and_reinitialize(self, fake_root):
        from quantv2x_tpu.data.loader import PrefetchLoader
        from quantv2x_tpu.data.voxelizer import VoxelCfg

        vox = VoxelCfg(lidar_range=(-30, -30, -3, 30, 30, 1),
                       voxel_size=(0.4, 0.4, 4.0),
                       max_points_per_voxel=4, max_voxels=256)
        ds = V2XDataset(fake_root, "vc", max_cav=4, max_points=600, seed=1)
        loader = PrefetchLoader(ds, vox, max_cav=4, workers=2, prefetch=2,
                                shuffle=True, reinitialize=True, seed=7)
        n = len(ds)
        batches = list(loader.epochs(2))
        assert len(batches) == 2 * n
        for b in batches:
            assert np.asarray(b["agent_mask"]).any()


class TestPcdFormats:
    """Golden-fixture pcd parsing parity (reference reads via pypcd,
    opencood/utils/pcd_utils.py:12-41, incl. binary_compressed which
    DAIR-V2X ships)."""

    _PTS = np.array([[1.5, -2.0, 0.25, 0.7],
                     [10.0, 4.0, -1.0, 0.1],
                     [-3.25, 0.5, 2.0, 0.9]], np.float32)

    def _header(self, n, mode):
        return (
            "# .PCD v0.7 - Point Cloud Data file format\n"
            "VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
            "TYPE F F F F\nCOUNT 1 1 1 1\n"
            f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
            f"POINTS {n}\nDATA {mode}\n"
        ).encode()

    def test_ascii(self, tmp_path):
        p = tmp_path / "a.pcd"
        body = "\n".join(" ".join(f"{v:.6f}" for v in row)
                         for row in self._PTS)
        p.write_bytes(self._header(3, "ascii") + body.encode())
        np.testing.assert_allclose(load_lidar(str(p)), self._PTS, atol=1e-5)

    def test_binary(self, tmp_path):
        p = tmp_path / "b.pcd"
        p.write_bytes(self._header(3, "binary") + self._PTS.tobytes())
        np.testing.assert_allclose(load_lidar(str(p)), self._PTS)

    def test_binary_compressed_roundtrip(self, tmp_path):
        # SoA layout + literal-run LZF encoding (ctrl<32 = ctrl+1 literals)
        soa = self._PTS.T.copy().tobytes()  # x*n, y*n, z*n, i*n
        comp = bytearray()
        for off in range(0, len(soa), 32):
            chunk = soa[off:off + 32]
            comp.append(len(chunk) - 1)
            comp += chunk
        p = tmp_path / "c.pcd"
        p.write_bytes(self._header(3, "binary_compressed")
                      + np.array([len(comp), len(soa)],
                                 np.uint32).tobytes() + bytes(comp))
        np.testing.assert_allclose(load_lidar(str(p)), self._PTS)

    def test_lzf_backreference_path(self):
        from quantv2x_tpu.data.dataset import _lzf_decompress
        # literal "abc" then a length-6 backreference at distance 3
        stream = bytes([2]) + b"abc" + bytes([(4 << 5), 2])
        assert _lzf_decompress(stream, 9) == b"abcabcabc"

    def test_binary_mixed_dtypes(self, tmp_path):
        # intensity stored as uint8 must be honored, not read as float32
        hdr = (
            "VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 1\n"
            "TYPE F F F U\nCOUNT 1 1 1 1\nWIDTH 2\nHEIGHT 1\n"
            "POINTS 2\nDATA binary\n"
        ).encode()
        rec = np.zeros(2, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                                 ("intensity", "u1")])
        rec["x"] = [1.0, 2.0]
        rec["y"] = [3.0, 4.0]
        rec["z"] = [5.0, 6.0]
        rec["intensity"] = [7, 255]
        p = tmp_path / "m.pcd"
        p.write_bytes(hdr + rec.tobytes())
        out = load_lidar(str(p))
        np.testing.assert_allclose(out[:, 0], [1.0, 2.0])
        np.testing.assert_allclose(out[:, 3], [7.0, 255.0])


class TestFullMatrixProjection:
    """GT projection must compose full 4x4s, not sum yaws (parity:
    box_utils.project_world_objects projects corners through the 4x4)."""

    def _tree(self, tmp_path, ego_pose):
        root = tmp_path / "slope_root"
        d = root / "s0" / "1"
        d.mkdir(parents=True)
        obj = {"location": [15.0, 3.0, 0.5], "extent": [2.0, 1.0, 0.8],
               "angle": [0.0, 25.0, 0.0], "obj_type": "Car"}
        (d / "000068.yaml").write_text(yaml.safe_dump(
            {"lidar_pose": list(ego_pose), "vehicles": {"7": obj}}))
        np.zeros((10, 4), np.float32).tofile(d / "000068.bin")
        return str(root)

    def test_yaw_under_ego_pitch(self, tmp_path):
        from quantv2x_tpu.utils.transformation import np_pose_to_world

        ego_pose = [2.0, -1.0, 1.5, 5.0, 40.0, 10.0]  # roll 5, pitch 10
        ds = V2XDataset(self._tree(tmp_path, ego_pose), "v2v",
                        max_cav=1, max_points=20)
        frame = ds[0]
        box = frame["gt_boxes"][frame["gt_mask"]][0]

        # independent golden computation through full matrices
        T_we = np_pose_to_world(np.asarray(ego_pose, np.float64))
        T_wo = np_pose_to_world(np.array([15.0, 3.0, 0.5, 0.0, 25.0, 0.0]))
        T_eo = np.linalg.inv(T_we) @ T_wo
        exp_center = T_eo[:3, 3]
        exp_yaw = np.arctan2(T_eo[1, 0], T_eo[0, 0])
        np.testing.assert_allclose(box[:3], exp_center, atol=1e-5)
        assert box[6] == pytest.approx(exp_yaw, abs=1e-6)
        # the flat-ground shortcut (yaw_obj - yaw_ego) is measurably wrong
        flat = np.radians(25.0 - 40.0)
        assert abs(exp_yaw - flat) > 1e-3
