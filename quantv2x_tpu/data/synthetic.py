"""Synthetic V2X scene generator (host-side numpy).

Produces multi-agent frames in the same contract as the real dataset loader:
per-agent point clouds in agent-local frames, padded GT boxes (ego frame),
agent poses, and pairwise transforms — so model/eval/bench code is exercised
end-to-end without the (unmounted) V2X-Real data. Object classes and typical
sizes follow the reference's vehicle/pedestrian/truck taxonomy
(/root/reference/opencood/data_utils/__init__.py:12-18).
"""

import dataclasses

import numpy as np

CLASS_SIZES = {
    1: ((4.2, 1.9, 1.6), 0.5),   # vehicle: mean lwh, jitter
    2: ((0.7, 0.7, 1.7), 0.1),   # pedestrian
    3: ((8.5, 2.9, 3.2), 0.8),   # truck
}


@dataclasses.dataclass
class SyntheticCfg:
    lidar_range: tuple = (-140.8, -40.0, -3.0, 140.8, 40.0, 1.0)
    num_agents: int = 2
    num_objects: int = 12
    points_per_agent: int = 30000
    max_objects: int = 150
    ground_z: float = -1.9
    seed: int = 0
    # camera rig (0 = lidar-only frame). Cameras sit on each agent facing
    # evenly-spaced yaws; images are depth/height point splats so the
    # camera branch sees geometry-correlated pixels.
    num_cameras: int = 0
    image_size: tuple = (64, 96)            # (H, W)


def _surface_points(box_lwh, n, rng):
    """Sample lidar-like points on the visible surfaces of a box (local frame)."""
    l, w, h = box_lwh
    faces = rng.integers(0, 5, n)
    u = rng.uniform(-0.5, 0.5, n)
    v = rng.uniform(-0.5, 0.5, n)
    x = np.where(faces == 0, 0.5 * l, np.where(faces == 1, -0.5 * l, u * l))
    y = np.where(faces == 2, 0.5 * w, np.where(faces == 3, -0.5 * w, v * w))
    z = np.where(faces == 4, 0.5 * h, rng.uniform(-0.5, 0.5, n) * h)
    return np.stack([x, y, z], axis=-1)


def make_frame(cfg: SyntheticCfg, return_world: bool = False):
    """Build one multi-agent frame.

    return_world: also return (boxes_world (N, 7) hwl, classes (N,)) —
    used by tools/make_synthetic_dataset.py to export OPV2V trees.

    Returns dict:
      agent_points: (L, P, 4) float32, agent-local frames
      agent_points_mask: (L, P) bool
      agent_poses: (L, 6) degrees (ego = index 0)
      agent_mask: (L,) bool
      gt_boxes: (max_objects, 7) hwl order, EGO frame
      gt_classes: (max_objects,) int32 (1-based)
      gt_mask: (max_objects,) bool
    """
    rng = np.random.default_rng(cfg.seed)
    x1, y1, _, x2, y2, _ = cfg.lidar_range

    # agent poses: ego at origin, others scattered nearby with random yaw
    poses = np.zeros((cfg.num_agents, 6), np.float32)
    for i in range(1, cfg.num_agents):
        poses[i, 0] = rng.uniform(-30, 30)
        poses[i, 1] = rng.uniform(-15, 15)
        poses[i, 4] = rng.uniform(-180, 180)

    # world-frame objects within a band covered by the agents
    classes = rng.choice([1, 1, 1, 2, 3], size=cfg.num_objects)
    boxes_world = np.zeros((cfg.num_objects, 7), np.float32)
    for i, c in enumerate(classes):
        (l0, w0, h0), jit = CLASS_SIZES[int(c)]
        l = l0 + rng.uniform(-jit, jit)
        w = w0 + rng.uniform(-jit, jit) * 0.4
        h = h0 + rng.uniform(-jit, jit) * 0.4
        boxes_world[i] = [
            rng.uniform(x1 * 0.5, x2 * 0.5),
            rng.uniform(y1 * 0.8, y2 * 0.8),
            cfg.ground_z + h / 2,
            h, w, l,                                  # hwl order
            rng.uniform(-np.pi, np.pi),
        ]

    from quantv2x_tpu.utils.transformation import np_pose_to_world

    T_world_agent = np.stack([np_pose_to_world(p) for p in poses])  # (L,4,4)

    P = cfg.points_per_agent
    agent_points = np.zeros((cfg.num_agents, P, 4), np.float32)
    agent_mask_pts = np.zeros((cfg.num_agents, P), bool)
    for a in range(cfg.num_agents):
        T_aw = np.linalg.inv(T_world_agent[a])
        pts = []
        # object surface returns (denser for near objects)
        for i, c in enumerate(classes):
            bx = boxes_world[i]
            center_local = T_aw[:3, :3] @ bx[:3] + T_aw[:3, 3]
            dist = np.linalg.norm(center_local[:2])
            n = int(np.clip(12000 / max(dist, 5.0), 30, 900))
            local = _surface_points((bx[5], bx[4], bx[3]), n, rng)
            cy, sy = np.cos(bx[6]), np.sin(bx[6])
            R = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
            world = local @ R.T + bx[:3]
            pts.append(world)
        # ground plane clutter
        n_ground = P // 3
        gx = rng.uniform(x1, x2, n_ground)
        gy = rng.uniform(y1, y2, n_ground)
        gz = np.full(n_ground, cfg.ground_z) + rng.normal(0, 0.05, n_ground)
        pts.append(np.stack([gx, gy, gz], axis=-1))
        world_pts = np.concatenate(pts)[: P]
        local_pts = world_pts @ T_aw[:3, :3].T + T_aw[:3, 3]
        k = len(local_pts)
        agent_points[a, :k, :3] = local_pts
        agent_points[a, :k, 3] = rng.uniform(0.1, 1.0, k)
        agent_mask_pts[a, :k] = True

    # GT in ego frame
    T_ego_world = np.linalg.inv(T_world_agent[0])
    gt_boxes = np.zeros((cfg.max_objects, 7), np.float32)
    gt_classes = np.zeros((cfg.max_objects,), np.int32)
    gt_mask = np.zeros((cfg.max_objects,), bool)
    for i, c in enumerate(classes[: cfg.max_objects]):
        bx = boxes_world[i]
        center = T_ego_world[:3, :3] @ bx[:3] + T_ego_world[:3, 3]
        # ego has identity yaw here only if pose yaw=0; general case: adjust yaw
        dyaw = np.arctan2(T_ego_world[1, 0], T_ego_world[0, 0])
        gt_boxes[i] = [center[0], center[1], center[2], bx[3], bx[4], bx[5],
                       bx[6] + dyaw]
        gt_classes[i] = c
        gt_mask[i] = True

    frame = {
        "agent_points": agent_points,
        "agent_points_mask": agent_mask_pts,
        "agent_poses": poses,
        "agent_mask": np.ones((cfg.num_agents,), bool),
        "gt_boxes": gt_boxes,
        "gt_classes": gt_classes,
        "gt_mask": gt_mask,
    }
    if cfg.num_cameras > 0:
        frame.update(_render_cameras(cfg, agent_points, agent_mask_pts))
    if return_world:
        return frame, (boxes_world, classes.astype(np.int32))
    return frame


def _render_cameras(cfg: SyntheticCfg, agent_points, agent_points_mask):
    """Pinhole point-splat renders per agent (camera contract of the
    reference's image_inputs: imgs/intrins/rots/trans — parity
    basedataset camera loading + heter_encoders.LiftSplatShoot geometry).

    Camera frame convention matches lss_encoder.frustum_to_ego: +z is the
    optical axis, +x image-right, +y image-down; cam2ego_rot maps camera
    coords into the agent (ego) frame.
    """
    A = cfg.num_agents
    N = cfg.num_cameras
    iH, iW = cfg.image_size
    fx = fy = 0.6 * iW
    cx, cy = iW / 2.0, iH / 2.0
    intrinsics = np.tile(
        np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]], np.float32),
        (A, N, 1, 1),
    )
    imgs = np.zeros((A, N, iH, iW, 3), np.float32)
    rots = np.zeros((A, N, 3, 3), np.float32)
    trans = np.zeros((A, N, 3), np.float32)
    cam_height = 1.7 + cfg.ground_z          # camera z in agent frame
    for a in range(A):
        pts = agent_points[a][agent_points_mask[a]]
        for n in range(N):
            yaw = 2.0 * np.pi * n / N
            cyw, syw = np.cos(yaw), np.sin(yaw)
            # columns = camera axes in agent coords: x_cam -> left-handed
            # image-right, y_cam -> down (-z agent), z_cam -> forward
            forward = np.array([cyw, syw, 0.0])
            right = np.array([syw, -cyw, 0.0])
            down = np.array([0.0, 0.0, -1.0])
            R = np.stack([right, down, forward], axis=1).astype(np.float32)
            t = np.array([0.0, 0.0, cam_height], np.float32)
            rots[a, n] = R
            trans[a, n] = t
            p_cam = (pts[:, :3] - t) @ R                 # R^T (p - t)
            z = p_cam[:, 2]
            vis = z > 1.0
            u = (fx * p_cam[vis, 0] / z[vis] + cx).astype(np.int64)
            v = (fy * p_cam[vis, 1] / z[vis] + cy).astype(np.int64)
            ok = (u >= 0) & (u < iW) & (v >= 0) & (v < iH)
            u, v, d = u[ok], v[ok], z[vis][ok]
            np.add.at(imgs[a, n, :, :, 0], (v, u), 1.0 / d)
            np.add.at(imgs[a, n, :, :, 1], (v, u),
                      pts[vis][ok][:, 2] * 0.25 + 0.5)
            np.add.at(imgs[a, n, :, :, 2], (v, u), pts[vis][ok][:, 3])
    np.clip(imgs, 0.0, 4.0, out=imgs)
    return {
        "camera_imgs": imgs,
        "camera_intrinsics": intrinsics,
        "camera_rots": rots,
        "camera_trans": trans,
    }


def hypes_synth_extras(raw: dict):
    """SyntheticCfg extras + per-frame modality assignment for a hypes
    dict, so the synthetic trainer/eval drive heter camera configs the
    same way the dataset path does.

    Returns (extras, assign): ``extras`` are SyntheticCfg kwargs (camera
    rig on when any modality is a camera; num_cams/final_dim from its
    img_params, reference schema heter_encoders.py:83-123), ``assign``
    stamps ``agent_modality`` round-robin over the config's modalities
    (the dataset fallback policy, data/dataset.py round-robin) with
    agent 0 on the first (ego) modality.
    """
    het = (raw or {}).get("heter") or {}
    ms = het.get("modality_setting") or {}
    extras = {}
    for m in ms.values():
        if m.get("sensor_type") == "camera":
            ip = m.get("img_params") or {}
            extras["num_cameras"] = int(ip.get("num_cams", 4))
            extras["image_size"] = tuple(ip.get("final_dim", (64, 96)))
    n_mod = max(len(ms), 1)

    def assign(frame):
        if len(ms) > 1:
            L = frame["agent_mask"].shape[0]
            frame["agent_modality"] = (np.arange(L) % n_mod).astype(np.int32)
        return frame

    return extras, assign
