"""OPV2V / V2X-Real on-disk dataset loader (host-side numpy).

Behavioral parity with the reference base datasets
(/root/reference/opencood/data_utils/datasets/basedataset/
v2xreal_basedataset.py:181-399 and opv2v_basedataset.py):

  - directory layout: root/<scenario>/<cav_id>/<timestamp>.yaml + .bin|.pcd
    (+ cameras); negative cav ids are infrastructure;
  - dataset_mode filters/reorders the cav list: 'vc' (vehicles first),
    'v2v' (vehicles only), 'ic' (infra first), 'i2i' (infra only)
    (v2xreal_basedataset.py:194-204);
  - lidar .bin = float32 (N, 4) with NaN scrub (pcd_utils.load_lidar_bin:43);
  - yaml params carry lidar_pose (6-dof degrees) and a vehicles/objects dict
    {id: {location, extent (half dims), angle [roll, yaw, pitch], ...}};
  - GT = union of all cavs' object dicts projected into the ego lidar frame,
    class-mapped through SUPER_CLASS_MAP
    (base_postprocessor_multi_class.generate_object_center:105-154,
    data_utils/__init__.py:12-18);
  - comm-range filter drops cavs beyond comm_range metres of ego
    (intermediate_heter_fusion_3class_dataset.py:356-367).

Frames are emitted in the same contract as synthetic.make_frame so the rest
of the (device-side) pipeline is source-agnostic.
"""

import os
from typing import Dict, List, Optional

import numpy as np
import yaml

SUPER_CLASS_MAP = {
    "vehicle": ["LongVehicle", "Car", "PoliceCar"],
    "pedestrian": ["Child", "RoadWorker", "Pedestrian", "Scooter",
                   "ScooterRider", "Motorcycle", "MotorcyleRider",
                   "BicycleRider"],
    "truck": ["Truck", "Van", "TrashCan", "ConcreteTruck", "Bus"],
}
CLASS_IDS = {"vehicle": 1, "pedestrian": 2, "truck": 3}
_NAME_TO_ID = {
    name: CLASS_IDS[sup]
    for sup, names in SUPER_CLASS_MAP.items()
    for name in names
}


def class_name_to_id(name: Optional[str]) -> int:
    if name is None:
        return 1
    if name in _NAME_TO_ID:
        return _NAME_TO_ID[name]
    low = str(name).lower()
    for sup in CLASS_IDS:
        if sup in low:
            return CLASS_IDS[sup]
    return 1


def load_lidar(path: str) -> np.ndarray:
    """.bin (float32 Nx4) or ascii .pcd -> (N, 4), NaN-scrubbed."""
    if path.endswith(".bin"):
        pts = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    else:
        pts = _load_pcd(path)
    mask = ~np.isnan(pts[:, :3]).any(axis=1)
    return pts[mask]


def _load_pcd(path: str) -> np.ndarray:
    """Minimal ascii/binary pcd reader (xyz[+intensity])."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            key = line.split(" ")[0].upper()
            header[key] = line.split(" ")[1:]
            if key == "DATA":
                break
        fields = header.get("FIELDS", ["x", "y", "z"])
        n = int(header.get("POINTS", [0])[0])
        if header["DATA"][0] == "ascii":
            arr = np.loadtxt(f, dtype=np.float32, max_rows=n)
        else:
            arr = np.frombuffer(f.read(), dtype=np.float32).reshape(n, -1)
    arr = np.asarray(arr, np.float32).reshape(n, -1)
    out = np.zeros((n, 4), np.float32)
    out[:, : min(4, arr.shape[1])] = arr[:, :4]
    return out


def scan_scenarios(root: str, dataset_mode: str = "vc", max_cav: int = 4):
    """-> list of scenarios: {name, cavs: {cav_id: {ts: {yaml, lidar}}},
    timestamps: [..]}."""
    scenarios = []
    for scen in sorted(os.listdir(root)):
        sdir = os.path.join(root, scen)
        if not os.path.isdir(sdir):
            continue
        cav_list = sorted(
            [c for c in os.listdir(sdir) if os.path.isdir(os.path.join(sdir, c))]
        )

        def _is_int(x):
            try:
                int(x)
                return True
            except ValueError:
                return False

        nums = [c for c in cav_list if _is_int(c)]
        veh = [c for c in nums if int(c) >= 0]
        infra = [c for c in nums if int(c) < 0]
        if dataset_mode == "vc":
            cav_list = veh + infra
        elif dataset_mode == "v2v":
            cav_list = veh
        elif dataset_mode == "ic":
            cav_list = infra + veh
        elif dataset_mode == "i2i":
            cav_list = infra
        cav_list = cav_list[:max_cav]
        if not cav_list:
            continue

        cavs = {}
        for cav in cav_list:
            cdir = os.path.join(sdir, cav)
            entries = {}
            for fn in sorted(os.listdir(cdir)):
                if fn.endswith(".yaml") and "additional" not in fn:
                    ts = fn[:-5]
                    lidar = None
                    for ext in (".bin", ".pcd"):
                        cand = os.path.join(cdir, ts + ext)
                        if os.path.exists(cand):
                            lidar = cand
                            break
                    entries[ts] = {
                        "yaml": os.path.join(cdir, fn), "lidar": lidar
                    }
            cavs[cav] = entries
        common_ts = None
        for cav, entries in cavs.items():
            tset = set(entries)
            common_ts = tset if common_ts is None else (common_ts & tset)
        scenarios.append({
            "name": scen,
            "cavs": cavs,
            "timestamps": sorted(common_ts or []),
        })
    return scenarios


def _pose_to_T(pose):
    from quantv2x_tpu.utils.transformation import np_pose_to_world
    return np_pose_to_world(np.asarray(pose, np.float64))


def _objects_to_ego(params_list, T_ego_world_inv, max_objects):
    """Union all cavs' object dicts, project into ego lidar frame.

    Returns (boxes (M, 7) hwl, classes (M,), mask (M,))."""
    merged: Dict = {}
    for params in params_list:
        objs = params.get("vehicles", params.get("objects", {})) or {}
        merged.update(objs)

    boxes = np.zeros((max_objects, 7), np.float32)
    classes = np.zeros((max_objects,), np.int32)
    mask = np.zeros((max_objects,), bool)
    i = 0
    for oid, o in merged.items():
        if i >= max_objects:
            break
        loc = np.asarray(o["location"], np.float64)
        if "center" in o:
            # OPV2V: location is the vehicle frame origin; center offsets to
            # the box centroid in the object frame
            center = np.asarray(o["center"], np.float64)
        else:
            center = np.zeros(3)
        ext = np.asarray(o["extent"], np.float64)  # half l, w, h
        angle = o.get("angle", [0, 0, 0])
        yaw_deg = angle[1] if len(angle) == 3 else angle
        T_w_obj = _pose_to_T([loc[0], loc[1], loc[2], angle[0], yaw_deg,
                              angle[2] if len(angle) == 3 else 0.0])
        c_world = T_w_obj[:3, :3] @ center + T_w_obj[:3, 3]
        c_ego = T_ego_world_inv[:3, :3] @ c_world + T_ego_world_inv[:3, 3]
        dyaw = np.degrees(
            np.arctan2(T_ego_world_inv[1, 0], T_ego_world_inv[0, 0])
        )
        yaw_ego = np.radians(yaw_deg + dyaw)
        l, w, h = ext[0] * 2, ext[1] * 2, ext[2] * 2
        boxes[i] = [c_ego[0], c_ego[1], c_ego[2], h, w, l, yaw_ego]
        classes[i] = class_name_to_id(o.get("obj_type", o.get("category")))
        mask[i] = True
        i += 1
    return boxes, classes, mask


class V2XDataset:
    """Index-able multi-agent frame source over an OPV2V-format tree."""

    def __init__(self, root: str, dataset_mode: str = "vc", max_cav: int = 4,
                 max_points: int = 60000, max_objects: int = 150,
                 comm_range: float = 70.0, wild=None, seed: int = 0):
        self.scenarios = scan_scenarios(root, dataset_mode, max_cav)
        self.max_cav = max_cav
        self.max_points = max_points
        self.max_objects = max_objects
        self.comm_range = comm_range
        # time-delay simulation (parity: wild_setting async path,
        # v2xreal_basedataset.py:89-122; see data/noise_sim.WildCfg)
        self.wild = wild
        self._seed = seed
        # used only by reinitialize() (main thread); __getitem__ derives a
        # per-index rng so PrefetchLoader worker threads stay deterministic
        self._rng = np.random.default_rng(seed)
        self.index = [
            (si, ti)
            for si, s in enumerate(self.scenarios)
            for ti in range(len(s["timestamps"]))
        ]

    def __len__(self):
        return len(self.index)

    def reinitialize(self):
        """Per-epoch cav-order reshuffle (parity: basedataset
        reinitialize, v2xreal_basedataset.py:181-273, called once per
        epoch at tools/train.py:219) — a different eligible agent becomes
        ego each epoch. Vehicles and infrastructure shuffle within their
        groups so the dataset_mode's ego-type ordering is preserved."""
        def _num(c):
            try:
                return int(c)
            except ValueError:
                return None

        for s in self.scenarios:
            ids = list(s["cavs"].keys())
            infra = [c for c in ids if (_num(c) is not None and _num(c) < 0)]
            veh = [c for c in ids if c not in infra]
            self._rng.shuffle(veh)
            self._rng.shuffle(infra)
            order = infra + veh if infra and ids[0] in infra else veh + infra
            s["cavs"] = {c: s["cavs"][c] for c in order}

    def __getitem__(self, idx: int):
        si, ti = self.index[idx]
        scen = self.scenarios[si]
        ts = scen["timestamps"][ti]
        cav_ids = list(scen["cavs"].keys())

        # per-index rng: reproducible regardless of which loader thread
        # (or how many) executes this call — np.random.Generator is not
        # thread-safe and shared draws would depend on schedule order
        rng = np.random.default_rng((self._seed, idx))

        params_list, lidars, poses = [], [], []
        for ci, cav in enumerate(cav_ids):
            ts_cav = ts
            if self.wild is not None and ci > 0:
                from quantv2x_tpu.data.noise_sim import time_delay_frames
                d = time_delay_frames(self.wild, rng, ego=False)
                if d > 0:
                    # stale message: this cav's lidar AND pose come from
                    # an earlier timestamp (reference applies the delayed
                    # params wholesale, retrieve_base_data:358-369)
                    ts_cav = scen["timestamps"][max(0, ti - d)]
            entry = scen["cavs"][cav][ts_cav]
            with open(entry["yaml"]) as f:
                params = yaml.safe_load(f)
            params_list.append(params)
            poses.append(np.asarray(params["lidar_pose"], np.float64))
            lidars.append(
                load_lidar(entry["lidar"]) if entry["lidar"] else
                np.zeros((0, 4), np.float32)
            )

        # comm-range filter relative to ego (first cav)
        keep = [0]
        for j in range(1, len(cav_ids)):
            d = np.linalg.norm(poses[j][:2] - poses[0][:2])
            if d <= self.comm_range:
                keep.append(j)
        params_list = [params_list[j] for j in keep]
        lidars = [lidars[j] for j in keep]
        poses = [poses[j] for j in keep]

        A, P = len(keep), self.max_points
        agent_points = np.zeros((self.max_cav, P, 4), np.float32)
        agent_points_mask = np.zeros((self.max_cav, P), bool)
        agent_poses = np.zeros((self.max_cav, 6), np.float32)
        agent_mask = np.zeros((self.max_cav,), bool)
        for a in range(min(A, self.max_cav)):
            pts = lidars[a][: P]
            agent_points[a, : len(pts)] = pts
            agent_points_mask[a, : len(pts)] = True
            agent_poses[a] = poses[a]
            agent_mask[a] = True

        T_ego_world_inv = np.linalg.inv(_pose_to_T(poses[0]))
        gt_boxes, gt_classes, gt_mask = _objects_to_ego(
            params_list, T_ego_world_inv, self.max_objects
        )
        return {
            "agent_points": agent_points[: self.max_cav],
            "agent_points_mask": agent_points_mask[: self.max_cav],
            "agent_poses": agent_poses[: self.max_cav],
            "agent_mask": agent_mask[: self.max_cav],
            "gt_boxes": gt_boxes,
            "gt_classes": gt_classes,
            "gt_mask": gt_mask,
        }


class V2XSETDataset(V2XDataset):
    """V2XSet: identical OPV2V directory layout (reference
    v2xset_basedataset.py:9-28 — "All the same as OPV2V"); the single
    broken camera scenario 2021_09_09_13_20_58 is dropped on scan."""

    _BROKEN_SCENARIOS = ("2021_09_09_13_20_58",)

    def __init__(self, root: str, **kwargs):
        super().__init__(root, **kwargs)
        self.scenarios = [
            s for s in self.scenarios
            if not any(b in s.get("name", "") for b in self._BROKEN_SCENARIOS)
        ]
        self.index = [
            (si, ti)
            for si, s in enumerate(self.scenarios)
            for ti in range(len(s["timestamps"]))
        ]


def build_frame_source(hypes_raw: dict, split: str = "train",
                       max_cav: int = 4, dataset_mode: str = "vc"):
    """Config -> index-able frame source (parity: build_dataset,
    data_utils/datasets/__init__.py:32-51 — the factory that the tools
    call; fusion-level behavior lives in the model contract here).

    Dispatch by the root path's shape: a directory is an OPV2V-format
    scenario tree (V2X-Real / OPV2V / V2XSet), a ``.json`` is a DAIR-V2X-C
    split file, a ``.pkl`` a V2X-Sim info index.
    """
    key = "root_dir" if split == "train" else "validate_dir"
    root = hypes_raw.get(key) or hypes_raw.get("root_dir")
    if not root:
        raise FileNotFoundError("config has no root_dir/validate_dir")
    comm = float(hypes_raw.get("comm_range", 70.0))
    if root.endswith(".json"):
        from quantv2x_tpu.data.dairv2x import DAIRV2XDataset
        base = os.path.dirname(os.path.dirname(root))
        return DAIRV2XDataset(base, root)
    if root.endswith(".pkl"):
        from quantv2x_tpu.data.v2xsim import V2XSIMDataset
        return V2XSIMDataset(root, max_cav=max_cav)
    if not os.path.isdir(root):
        raise FileNotFoundError(f"dataset root {root!r} not found")
    wild = None
    if hypes_raw.get("wild_setting", {}).get("async"):
        from quantv2x_tpu.data.noise_sim import WildCfg
        wild = WildCfg.from_hypes(hypes_raw["wild_setting"])
    return V2XDataset(root, dataset_mode=dataset_mode, max_cav=max_cav,
                      comm_range=comm, wild=wild)
