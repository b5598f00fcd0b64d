"""V2X-Sim 2.0 dataset loader (pickle-index format).

Parity: data_utils/datasets/basedataset/v2xsim_basedataset.py:18-240 —
one pickle file indexes every scene with per-agent
``lidar_path_{i}`` / ``lidar_pose_{i}`` (4x4) / ``labels_{i}``
(``gt_boxes_global`` (N,10) = [x,y,z,l,w,h, quat wxyz] in world frame,
``gt_object_ids``). Points are .bin float32 with 5 values/point (x,y,z,
intensity, ring); the reference keeps the first 4.

Box projection parity: utils/box_utils.project_world_objects_v2x:592-670
(quaternion -> T_world_object, solve against T_world_lidar, range filter,
keep only boxes hit by at least one lidar point).

Emits the standard frame dict of this repo (same contract as
data/dataset.py V2XDataset): agent_points/_mask, agent_poses, agent_mask,
gt_boxes (hwl, ego frame), gt_classes, gt_mask.
"""

import os
import pickle
from typing import Optional, Sequence

import numpy as np


def _quat_to_rot(w, x, y, z):
    n = np.sqrt(w * w + x * x + y * y + z * z) or 1.0
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def tfm_to_pose(T):
    """4x4 -> [x, y, z, roll, yaw, pitch] degrees — the frame contract's
    pose order (np_pose_to_world reads yaw at index 4, pitch at 5;
    transformation.py:130). Satisfies np_pose_to_world(tfm_to_pose(T)) == T
    for rotations in this Euler family."""
    yaw = np.degrees(np.arctan2(T[1, 0], T[0, 0]))
    pitch = np.degrees(np.arctan2(-T[2, 0],
                                  np.sqrt(T[2, 1] ** 2 + T[2, 2] ** 2)))
    roll = np.degrees(np.arctan2(T[2, 1], T[2, 2]))
    return np.array([T[0, 3], T[1, 3], T[2, 3], roll, yaw, pitch],
                    np.float32)


def project_world_boxes_v2x(gt_boxes, T_world_lidar, lidar_range,
                            points_ego: Optional[np.ndarray] = None,
                            max_objects: int = 150):
    """(N,10) [xyz, lwh, quat wxyz] world boxes -> padded ego-frame hwl
    boxes + mask, range-filtered and (optionally) lidar-hit-filtered."""
    boxes = np.zeros((max_objects, 7), np.float32)
    mask = np.zeros((max_objects,), bool)
    T_lidar_world = np.linalg.inv(T_world_lidar)
    k = 0
    for row in np.asarray(gt_boxes, np.float64):
        if k >= max_objects:
            break
        x, y, z, dx, dy, dz, qw, qa, qb, qc = row[:10]
        T_wo = np.eye(4)
        T_wo[:3, :3] = _quat_to_rot(qw, qa, qb, qc)
        T_wo[:3, 3] = [x, y, z]
        T_lo = T_lidar_world @ T_wo
        c = T_lo[:3, 3]
        if not (lidar_range[0] <= c[0] <= lidar_range[3]
                and lidar_range[1] <= c[1] <= lidar_range[4]):
            continue
        yaw = np.arctan2(T_lo[1, 0], T_lo[0, 0])
        if points_ego is not None and len(points_ego):
            d = points_ego[:, :2] - c[None, :2]
            ca, sa = np.cos(-yaw), np.sin(-yaw)
            lx = d[:, 0] * ca - d[:, 1] * sa
            ly = d[:, 0] * sa + d[:, 1] * ca
            hit = ((np.abs(lx) <= dx / 2) & (np.abs(ly) <= dy / 2)
                   & (np.abs(points_ego[:, 2] - c[2]) <= dz / 2))
            if not hit.any():
                continue
        boxes[k] = [c[0], c[1], c[2], dz, dy, dx, yaw]   # hwl
        mask[k] = True
        k += 1
    return boxes, mask


class V2XSIMDataset:
    """Index-able multi-agent frame source over a V2X-Sim pickle index."""

    def __init__(self, info_path: str, max_cav: int = 5,
                 max_points: int = 60000, max_objects: int = 150,
                 lidar_range: Sequence[float] = (-32, -32, -3, 32, 32, 2),
                 train: bool = True, data_root: Optional[str] = None,
                 require_lidar_hit: bool = True, seed: int = 0):
        with open(info_path, "rb") as f:
            self.info = pickle.load(f)
        self.max_cav = max_cav
        self.max_points = max_points
        self.max_objects = max_objects
        self.lidar_range = tuple(lidar_range)
        self.train = train
        self.data_root = data_root
        self.require_lidar_hit = require_lidar_hit
        self._seed = seed
        self._epoch = 0
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.info)

    def _resolve(self, path):
        if self.data_root is not None:
            return os.path.join(self.data_root, os.path.basename(path))
        return path

    def reinitialize(self):
        """Reshuffle which agent plays ego next epoch (reference
        reinitialize:84-124 permutes cav order during training)."""
        self._epoch += 1

    def __getitem__(self, idx: int):
        scene = self.info[idx]
        n = int(scene["agent_num"])
        cav_ids = list(range(1, n + 1))
        if self.train:
            # per-(epoch, index) rng: deterministic under PrefetchLoader
            # worker threads (shared np Generators are not thread-safe)
            rng = np.random.default_rng((self._seed, self._epoch, idx))
            cav_ids = list(1 + rng.permutation(n))
        cav_ids = cav_ids[: self.max_cav]

        A, P = self.max_cav, self.max_points
        agent_points = np.zeros((A, P, 4), np.float32)
        agent_points_mask = np.zeros((A, P), bool)
        agent_poses = np.zeros((A, 6), np.float32)
        agent_mask = np.zeros((A,), bool)

        ego_pts = None
        T_ego = None
        for a, cid in enumerate(cav_ids):
            scan = np.fromfile(self._resolve(scene[f"lidar_path_{cid}"]),
                               dtype=np.float32).reshape(-1, 5)[:, :4]
            k = min(len(scan), P)
            agent_points[a, :k] = scan[:k]
            agent_points_mask[a, :k] = True
            T = np.asarray(scene[f"lidar_pose_{cid}"], np.float64)
            agent_poses[a] = tfm_to_pose(T)
            agent_mask[a] = True
            if a == 0:
                ego_pts = scan[:k]
                T_ego = T

        gt_boxes, gt_mask = project_world_boxes_v2x(
            scene[f"labels_{cav_ids[0]}"]["gt_boxes_global"], T_ego,
            self.lidar_range,
            ego_pts if self.require_lidar_hit else None,
            self.max_objects)
        gt_classes = np.where(gt_mask, 1, 0).astype(np.int32)  # lidar-only
                                                               # vehicles

        return {
            "agent_points": agent_points,
            "agent_points_mask": agent_points_mask,
            "agent_poses": agent_poses,
            "agent_mask": agent_mask,
            "gt_boxes": gt_boxes,
            "gt_classes": gt_classes,
            "gt_mask": gt_mask,
        }
