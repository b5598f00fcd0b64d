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


_PCD_TYPE = {("F", 4): np.float32, ("F", 8): np.float64,
             ("I", 1): np.int8, ("I", 2): np.int16, ("I", 4): np.int32,
             ("U", 1): np.uint8, ("U", 2): np.uint16, ("U", 4): np.uint32}


def _lzf_decompress(data: bytes, out_len: int) -> bytes:
    """Pure-python LZF decompression (the pcd binary_compressed codec;
    parity: pypcd's lzf dependency, opencood/utils/pcd_utils.py:12,220)."""
    out = bytearray(out_len)
    i, o, n = 0, 0, len(data)
    while i < n:
        ctrl = data[i]
        i += 1
        if ctrl < 32:                       # literal run of ctrl+1 bytes
            run = ctrl + 1
            out[o:o + run] = data[i:i + run]
            i += run
            o += run
        else:                               # back reference
            length = ctrl >> 5
            if length == 7:
                length += data[i]
                i += 1
            ref = o - ((ctrl & 0x1F) << 8) - data[i] - 1
            i += 1
            for _ in range(length + 2):     # may overlap itself
                out[o] = out[ref]
                o += 1
                ref += 1
    return bytes(out[:o])


def _load_pcd(path: str) -> np.ndarray:
    """PCD reader: ascii / binary / binary_compressed (xyz[+intensity]).

    Parity: the reference reads pcds via pypcd
    (opencood/utils/pcd_utils.py:12-41) which supports all three DATA
    encodings; DAIR-V2X ships binary_compressed files. FIELDS/SIZE/TYPE/
    COUNT are honored (not assumed float32)."""
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            if not line or line.startswith("#"):
                continue
            key = line.split(" ")[0].upper()
            header[key] = line.split(" ")[1:]
            if key == "DATA":
                break
        fields = header.get("FIELDS", ["x", "y", "z"])
        sizes = [int(s) for s in header.get("SIZE", ["4"] * len(fields))]
        types = header.get("TYPE", ["F"] * len(fields))
        counts = [int(c) for c in header.get("COUNT", ["1"] * len(fields))]
        n = int(header.get("POINTS", header.get("WIDTH", [0]))[0])
        mode = header["DATA"][0].lower()

        # expand COUNT>1 fields into repeated columns
        col_names, col_dtypes = [], []
        for name, sz, ty, ct in zip(fields, sizes, types, counts):
            dt = _PCD_TYPE.get((ty.upper(), sz), np.float32)
            for k in range(ct):
                col_names.append(name if ct == 1 else f"{name}_{k}")
                col_dtypes.append(dt)
        rec_dtype = np.dtype(list(zip(col_names, col_dtypes)))

        if mode == "ascii":
            arr2 = np.loadtxt(f, dtype=np.float64, max_rows=n,
                              ndmin=2).astype(np.float32)
            cols = {name: arr2[:, j] for j, name in enumerate(col_names)
                    if j < arr2.shape[1]}
        elif mode == "binary":
            rec = np.frombuffer(f.read(rec_dtype.itemsize * n),
                                dtype=rec_dtype, count=n)
            cols = {name: rec[name] for name in col_names}
        elif mode == "binary_compressed":
            comp_len, out_len = np.frombuffer(f.read(8), np.uint32)
            raw = _lzf_decompress(f.read(int(comp_len)), int(out_len))
            # compressed layout is field-major (structure of arrays)
            cols, off = {}, 0
            for name, dt in zip(col_names, col_dtypes):
                nbytes = np.dtype(dt).itemsize * n
                cols[name] = np.frombuffer(raw[off:off + nbytes], dt, count=n)
                off += nbytes
        else:
            raise ValueError(f"unsupported pcd DATA mode {mode!r} in {path}")

    out = np.zeros((n, 4), np.float32)
    for j, name in enumerate(("x", "y", "z", "intensity")):
        if name in cols:
            out[:, j] = np.asarray(cols[name], np.float32)
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
                    # OPV2V camera rig: <ts>_camera{0..3}.png next to the
                    # yaml (opv2v_basedataset.py:177-188 find_camera_files)
                    cameras = []
                    for ci in range(8):
                        cand = os.path.join(cdir, f"{ts}_camera{ci}.png")
                        if os.path.exists(cand):
                            cameras.append(cand)
                        else:
                            break
                    entries[ts] = {
                        "yaml": os.path.join(cdir, fn), "lidar": lidar,
                        "cameras": cameras,
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


# UE4/CARLA camera frame -> OpenCV camera frame (x right, y down, z fwd);
# parity: opv2v_basedataset.get_ext_int:506-518
_UE4_TO_CV = np.array(
    [[0, 0, 1, 0], [1, 0, 0, 0], [0, -1, 0, 0], [0, 0, 0, 1]], np.float64)


def load_image(path: str, size) -> np.ndarray:
    """PNG/JPG -> (H, W, 3) float32 in [0, 1], bilinear-resized to size."""
    from PIL import Image
    img = Image.open(path).convert("RGB")
    if size is not None and (img.height, img.width) != tuple(size):
        img = img.resize((size[1], size[0]), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def camera_rig_from_params(params, lidar_pose, num_cams, image_size):
    """Per-camera (intrinsic (3,3), cam->lidar (4,4)) from yaml cameraN
    entries, with intrinsics rescaled to the loaded image size.

    Parity: opv2v_basedataset.get_ext_int:506-518 — camera_to_lidar =
    x1_to_x2(camera cords, lidar pose) @ UE4->OpenCV axis swap."""
    intr = np.zeros((num_cams, 3, 3), np.float32)
    extr = np.tile(np.eye(4, dtype=np.float32), (num_cams, 1, 1))
    T_lidar_inv = np.linalg.inv(_pose_to_T(lidar_pose))
    for ci in range(num_cams):
        cam = params.get(f"camera{ci}")
        if cam is None:
            continue
        K = np.asarray(cam["intrinsic"], np.float32)
        # native OPV2V frames are 600x800; rescale to the loaded size
        native_h = float(cam.get("image_h", 600))
        native_w = float(cam.get("image_w", 800))
        K = K.copy()
        K[0] *= image_size[1] / native_w
        K[1] *= image_size[0] / native_h
        intr[ci] = K
        T_cam = _pose_to_T(cam["cords"])
        extr[ci] = (T_lidar_inv @ T_cam @ _UE4_TO_CV).astype(np.float32)
    return intr, extr


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
        # full-matrix composition (parity: box_utils.project_world_objects
        # projects corners through the 4x4 and re-extracts the box) — the
        # yaw comes from the COMPOSED rotation, correct under ego
        # roll/pitch, not the flat-ground yaw sum
        T_e_obj = T_ego_world_inv @ T_w_obj
        c_ego = T_e_obj[:3, :3] @ center + T_e_obj[:3, 3]
        yaw_ego = np.arctan2(T_e_obj[1, 0], T_e_obj[0, 0])
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
                 comm_range: float = 70.0, wild=None, seed: int = 0,
                 load_cameras: bool = False, num_cams: int = 4,
                 image_size=(128, 352), modality_fn=None, box_align=None):
        self.scenarios = scan_scenarios(root, dataset_mode, max_cav)
        self.max_cav = max_cav
        self.max_points = max_points
        self.max_objects = max_objects
        self.comm_range = comm_range
        # camera branch (parity: load_camera_file,
        # opv2v_basedataset.py:54-65,275-293): images resized to
        # image_size, intrinsics rescaled to match
        self.load_cameras = load_cameras
        self.num_cams = num_cams
        self.image_size = tuple(image_size)
        # heterogeneous assignment: (scenario_name, cav_id, position) ->
        # modality index (parity: modality_assign JSON + heter_utils
        # Adaptor; data/modality.ModalityAdaptor plugs in here)
        self.modality_fn = modality_fn
        # time-delay simulation (parity: wild_setting async path,
        # v2xreal_basedataset.py:89-122; see data/noise_sim.WildCfg)
        self.wild = wild
        # stage-1 box-align pose correction (parity: box_align in
        # __getitem__, intermediate_heter_fusion_3class_dataset.py:399-427;
        # see data/box_align.BoxAlignCfg)
        self.box_align = box_align
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

        params_list, lidars, poses, cam_paths = [], [], [], []
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
            cam_paths.append(entry.get("cameras") or [])

        # comm-range filter relative to ego (first cav)
        keep = [0]
        for j in range(1, len(cav_ids)):
            d = np.linalg.norm(poses[j][:2] - poses[0][:2])
            if d <= self.comm_range:
                keep.append(j)
        params_list = [params_list[j] for j in keep]
        lidars = [lidars[j] for j in keep]
        poses = [poses[j] for j in keep]
        cam_paths = [cam_paths[j] for j in keep]

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

        # box-align pose correction from cached stage-1 detections
        # (reference: __getitem__ box_align, ..._3class_dataset.py:399-427).
        # The ego is gauge-fixed by the pose graph, so GT projection below
        # (ego-frame) is unaffected; collaborator poses feed the pairwise
        # transforms corrected.
        if self.box_align is not None and self.box_align.enabled \
                and self.box_align.stage1_dir:
            from quantv2x_tpu.data.box_align import (
                apply_box_align, load_stage1_cache,
            )
            cache = load_stage1_cache(self.box_align.stage1_dir,
                                      scen["name"], ts)
            if cache is not None:
                M = self.box_align.max_boxes
                centers = np.zeros((self.max_cav, M, 2), np.float32)
                bmask = np.zeros((self.max_cav, M), bool)
                for a in range(min(A, self.max_cav)):
                    got = cache.get(str(cav_ids[keep[a]]))
                    if got is None:
                        continue
                    c_, m_ = got
                    k = min(M, len(c_))
                    centers[a, :k] = c_[:k]
                    bmask[a, :k] = m_[:k]
                tmp = {"agent_poses": agent_poses, "agent_mask": agent_mask}
                agent_poses = apply_box_align(
                    tmp, centers, bmask, self.box_align)["agent_poses"]

        T_ego_world_inv = np.linalg.inv(_pose_to_T(poses[0]))
        gt_boxes, gt_classes, gt_mask = _objects_to_ego(
            params_list, T_ego_world_inv, self.max_objects
        )
        frame = {
            "agent_points": agent_points[: self.max_cav],
            "agent_points_mask": agent_points_mask[: self.max_cav],
            "agent_poses": agent_poses[: self.max_cav],
            "agent_mask": agent_mask[: self.max_cav],
            "gt_boxes": gt_boxes,
            "gt_classes": gt_classes,
            "gt_mask": gt_mask,
            # kept-cav ids IN AGENT-SLOT ORDER (post comm-range filter,
            # post reinitialize shuffle) — consumers labeling per-agent
            # artifacts (the stage-1 box-align cache) must use these, not
            # the raw scenario order
            "cav_ids": [str(cav_ids[j]) for j in keep][: self.max_cav],
        }
        if self.modality_fn is not None:
            mods = np.zeros((self.max_cav,), np.int32)
            for a in range(min(A, self.max_cav)):
                mods[a] = self.modality_fn(scen["name"],
                                           cav_ids[keep[a]], a)
            frame["agent_modality"] = mods
        if self.load_cameras:
            Hc, Wc = self.image_size
            N = self.num_cams
            imgs = np.zeros((self.max_cav, N, Hc, Wc, 3), np.float32)
            intr = np.zeros((self.max_cav, N, 3, 3), np.float32)
            rots = np.tile(np.eye(3, dtype=np.float32),
                           (self.max_cav, N, 1, 1))
            trans = np.zeros((self.max_cav, N, 3), np.float32)
            for a in range(min(A, self.max_cav)):
                ci_, ce_ = camera_rig_from_params(
                    params_list[a], poses[a], N, self.image_size)
                intr[a] = ci_
                rots[a] = ce_[:, :3, :3]
                trans[a] = ce_[:, :3, 3]
                for ci in range(min(N, len(cam_paths[a]))):
                    imgs[a, ci] = load_image(cam_paths[a][ci],
                                             self.image_size)
            frame.update(camera_imgs=imgs, camera_intrinsics=intr,
                         camera_rots=rots, camera_trans=trans)
        return frame


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
    box_align_cfg = None
    if hypes_raw.get("box_align"):
        from quantv2x_tpu.data.box_align import BoxAlignCfg
        box_align_cfg = BoxAlignCfg.from_hypes(hypes_raw["box_align"])
    # camera branch on when the config's input_source lists cameras
    # (parity: load_camera_file, opv2v_basedataset.py:54); image size
    # comes from the camera modality's image_size when present
    cam_kwargs = {}
    heter = hypes_raw.get("heter", {}) or {}
    setting = heter.get("modality_setting", {})
    srcs = list(hypes_raw.get("input_source", ["lidar"]))
    cam_methods = ("lift_splat_shoot", "camera", "lss")
    has_cam_modality = any(
        "camera" in str(m.get("sensor_type", ""))
        or m.get("core_method") in cam_methods
        for m in setting.values())
    if "camera" in srcs or has_cam_modality:
        image_size = (128, 352)
        num_cams = 4
        for m in setting.values():
            if "camera" in str(m.get("sensor_type", "")) or \
                    m.get("core_method") in cam_methods:
                cam = m.get("img_params", {})
                image_size = tuple(m.get("image_size",
                                         cam.get("final_dim", image_size)))
                num_cams = int(m.get("num_cams",
                                     cam.get("num_cams", num_cams)))
        cam_kwargs = dict(load_cameras=True, num_cams=num_cams,
                          image_size=image_size)
    modality_fn = None
    if setting:
        names = list(setting)
        if heter.get("assignment_path"):
            from quantv2x_tpu.data.modality import ModalityAdaptor
            adaptor = ModalityAdaptor(
                heter["assignment_path"], heter.get("ego_modality",
                                                    names[0]),
                heter.get("mapping_dict", {}), names)

            def modality_fn(scen, cav, pos):
                m = adaptor.modality_of(scen, cav)
                return adaptor.index_of.get(m, 0)
        else:
            # no assignment JSON: ego gets ego_modality, collaborators
            # round-robin the rest (deterministic synthetic assignment)
            ego_i = names.index(heter.get("ego_modality", names[0])) \
                if heter.get("ego_modality", names[0]) in names else 0
            others = [i for i in range(len(names)) if i != ego_i] or [ego_i]

            def modality_fn(scen, cav, pos):
                if pos == 0:
                    return ego_i
                return others[(pos - 1) % len(others)]
    return V2XDataset(root, dataset_mode=dataset_mode, max_cav=max_cav,
                      comm_range=comm, wild=wild, modality_fn=modality_fn,
                      box_align=box_align_cfg, **cam_kwargs)
