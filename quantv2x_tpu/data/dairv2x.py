"""DAIR-V2X-C cooperative dataset loader (vehicle + infrastructure pair).

Parity: data_utils/datasets/basedataset/dairv2x_basedataset.py:28-180 —
  - split json lists vehicle-side frame ids; cooperative/data_info.json maps
    them to the paired infrastructure frame and the cooperative label;
  - vehicle lidar pose = lidar_to_novatel ∘ novatel_to_world; infra pose =
    virtuallidar_to_world (both 4x4 from rotation/translation json);
  - cooperative labels are world-frame 3d boxes
    {3d_location, 3d_dimensions, rotation, type}.

Emits the same frame contract as synthetic.make_frame / V2XDataset so the
rest of the pipeline is unchanged. Agent 0 = vehicle (ego), agent 1 = infra.
"""

import json
import os
from typing import Optional

import numpy as np

from quantv2x_tpu.data.dataset import class_name_to_id, load_lidar


def _read_json(path):
    with open(path) as f:
        return json.load(f)


def _rt_to_T(calib):
    T = np.eye(4)
    T[:3, :3] = np.asarray(calib["rotation"], np.float64).reshape(3, 3)
    t = np.asarray(calib["translation"], np.float64).reshape(-1)
    T[:3, 3] = t[:3]
    return T


def _T_to_pose(T):
    """4x4 -> [x, y, z, roll, yaw, pitch] degrees (tfm_to_pose parity)."""
    x, y, z = T[:3, 3]
    yaw = np.degrees(np.arctan2(T[1, 0], T[0, 0]))
    pitch = np.degrees(np.arctan2(-T[2, 0], np.hypot(T[2, 1], T[2, 2])))
    roll = np.degrees(np.arctan2(T[2, 1], T[2, 2]))
    return np.array([x, y, z, roll, yaw, pitch], np.float32)


class DAIRV2XDataset:
    """Index-able vehicle+infrastructure frame source."""

    def __init__(self, root: str, split_json: str, max_points: int = 100000,
                 max_objects: int = 150):
        self.root = root
        self.split = _read_json(split_json)
        co = _read_json(os.path.join(root, "cooperative/data_info.json"))
        self.info = {
            os.path.basename(e["vehicle_pointcloud_path"]).split(".")[0]: e
            for e in co
        }
        self.max_points = max_points
        self.max_objects = max_objects

    def __len__(self):
        return len(self.split)

    def __getitem__(self, idx):
        vid = str(self.split[idx])
        e = self.info[vid]
        iid = os.path.basename(e["infrastructure_pointcloud_path"]).split(".")[0]

        # poses
        l2n = _rt_to_T(_read_json(os.path.join(
            self.root, f"vehicle-side/calib/lidar_to_novatel/{vid}.json")))
        n2w = _rt_to_T(_read_json(os.path.join(
            self.root, f"vehicle-side/calib/novatel_to_world/{vid}.json")))
        T_w_veh = n2w @ l2n
        T_w_inf = _rt_to_T(_read_json(os.path.join(
            self.root,
            f"infrastructure-side/calib/virtuallidar_to_world/{iid}.json")))

        pts_veh = load_lidar(os.path.join(
            self.root, e["vehicle_pointcloud_path"]))
        pts_inf = load_lidar(os.path.join(
            self.root, e["infrastructure_pointcloud_path"]))

        P = self.max_points
        agent_points = np.zeros((2, P, 4), np.float32)
        agent_points_mask = np.zeros((2, P), bool)
        for a, pts in enumerate((pts_veh, pts_inf)):
            k = min(len(pts), P)
            agent_points[a, :k] = pts[:k]
            agent_points_mask[a, :k] = True

        # cooperative world-frame labels -> ego (vehicle lidar) frame
        labels = _read_json(os.path.join(self.root,
                                         e["cooperative_label_path"]))
        T_ego_w = np.linalg.inv(T_w_veh)
        gt_boxes = np.zeros((self.max_objects, 7), np.float32)
        gt_classes = np.zeros((self.max_objects,), np.int32)
        gt_mask = np.zeros((self.max_objects,), bool)
        for i, o in enumerate(labels[: self.max_objects]):
            loc = o["3d_location"]
            dim = o["3d_dimensions"]
            c_w = np.array([float(loc["x"]), float(loc["y"]),
                            float(loc["z"])])
            c_e = T_ego_w[:3, :3] @ c_w + T_ego_w[:3, 3]
            dyaw = np.arctan2(T_ego_w[1, 0], T_ego_w[0, 0])
            yaw = float(o.get("rotation", 0.0)) + dyaw
            gt_boxes[i] = [c_e[0], c_e[1], c_e[2],
                           float(dim["h"]), float(dim["w"]), float(dim["l"]),
                           yaw]
            gt_classes[i] = class_name_to_id(o.get("type"))
            gt_mask[i] = True

        return {
            "agent_points": agent_points,
            "agent_points_mask": agent_points_mask,
            "agent_poses": np.stack([_T_to_pose(T_w_veh), _T_to_pose(T_w_inf)]),
            "agent_mask": np.ones((2,), bool),
            "gt_boxes": gt_boxes,
            "gt_classes": gt_classes,
            "gt_mask": gt_mask,
        }
