"""Stage-1 box-align pose correction in the data path.

Parity: the reference corrects collaborator lidar poses during
``__getitem__`` from cached stage-1 (single-agent) detections before any
feature is projected — ``intermediate_heter_fusion_3class_dataset.py:
399-427`` (reads ``stage1_result_path``, runs
``box_align_v2.box_alignment_relative_sample_np``, overwrites
``params['lidar_pose']``). The pose-recovery math itself lives in
``ops/pose_graph.box_align`` (the g2o replacement); this module is the
data-path glue:

  - ``BoxAlignCfg``       — the ``box_align:`` hypes key (cfg dataclass);
  - ``save/load_stage1_cache`` — the disk cache the reference's
    ``tools/pose_graph_pre_calc.py`` writes (npz per scene/timestamp);
  - ``simulate_stage1_from_gt`` — a perfect-stage-1 stand-in that expresses
    GT world centers in each agent's own sensor frame (replace with a
    trained single-agent model's detections to match the reference
    end-to-end);
  - ``apply_box_align``   — frame-level pose correction used by
    ``V2XDataset.__getitem__`` and the noise-robustness sweep.

Conventions: dataset poses are 6-dof ``[x, y, z, roll, yaw, pitch]`` in
DEGREES with yaw at index 4 (OPV2V yaml convention); the SE2 pose graph
works in ``[x, y, yaw(rad)]``. The ego (agent 0) is gauge-fixed by the
pose graph, so ego-frame GT projection downstream is unaffected — only
collaborator poses (hence the feature-warp transforms) move.
"""

import dataclasses
import os
from typing import Optional

import numpy as np


@dataclasses.dataclass
class BoxAlignCfg:
    """The ``box_align:`` hypes key.

    enabled: master switch.
    stage1_dir: root of the stage-1 detection cache
        (``<dir>/<scene>/<timestamp>.npz``); None => data-path correction
        is skipped (the sweep path passes detections directly).
    max_boxes: per-agent detection capacity (static shape for the jitted
        pose graph).
    match_radius: greedy center-match gate in meters
        (parity: box_align_v2 landmark matching).
    gn_iters: Gauss-Newton iterations of the SE2 pose-graph solve.
    """

    enabled: bool = False
    stage1_dir: Optional[str] = None
    max_boxes: int = 32
    match_radius: float = 3.0
    gn_iters: int = 10

    @classmethod
    def from_hypes(cls, v) -> Optional["BoxAlignCfg"]:
        """``box_align:`` may be absent/false (off), true (on, cache dir
        supplied at runtime), or a mapping of field overrides."""
        if not v:
            return None
        if v is True:
            return cls(enabled=True)
        kw = {k: v[k] for k in v
              if k in {f.name for f in dataclasses.fields(cls)}}
        kw.setdefault("enabled", True)
        return cls(**kw)


def _yaw_R(yaw_rad: float) -> np.ndarray:
    c, s = np.cos(yaw_rad), np.sin(yaw_rad)
    return np.array([[c, -s], [s, c]])


def gt_world_centers(gt_boxes: np.ndarray, ego_pose: np.ndarray
                     ) -> np.ndarray:
    """Project ego-frame GT box centers (N, 7) to world BEV (N, 2).

    ego_pose: 6-dof degrees pose of agent 0. The alignment is SE2, so only
    the yaw/xy components participate (stage-1 landmarks are BEV centers,
    mirroring box_align_v2's use of projected box centers)."""
    R = _yaw_R(np.radians(float(ego_pose[4])))
    return gt_boxes[:, :2] @ R.T + np.asarray(ego_pose[:2], np.float64)


def simulate_stage1_from_gt(world_centers: np.ndarray, gt_mask: np.ndarray,
                            agent_poses: np.ndarray, agent_mask: np.ndarray,
                            max_boxes: int):
    """Perfect-stage-1 stand-in: each agent 'detects' the GT centers,
    reported in its OWN (true) sensor frame — immune to pose noise, which
    is exactly the property the reference's cached stage-1 output has.

    world_centers: (N, 2) world BEV centers; gt_mask: (N,) validity.
    agent_poses: (L, 6) TRUE 6-dof degree poses; agent_mask: (L,).
    Returns (centers (L, max_boxes, 2) f32, mask (L, max_boxes) bool).
    """
    L = agent_poses.shape[0]
    centers = np.zeros((L, max_boxes, 2), np.float32)
    mask = np.zeros((L, max_boxes), bool)
    k = min(max_boxes, world_centers.shape[0])
    for a in range(L):
        if not agent_mask[a]:
            continue
        R = _yaw_R(np.radians(float(agent_poses[a, 4])))
        local = (world_centers[:k] - np.asarray(agent_poses[a, :2],
                                                np.float64)) @ R
        centers[a, :k] = local
        mask[a, :k] = gt_mask[:k]
    return centers, mask


def save_stage1_cache(stage1_dir: str, scene: str, timestamp: str,
                      cav_ids, centers: np.ndarray, mask: np.ndarray
                      ) -> str:
    """Write one frame's per-cav stage-1 detections
    (``<dir>/<scene>/<timestamp>.npz``). Rows of ``centers``/``mask``
    beyond ``len(cav_ids)`` are dropped. Parity: the per-timestamp pickle
    tree ``tools/pose_graph_pre_calc.py`` emits."""
    d = os.path.join(stage1_dir, scene)
    os.makedirs(d, exist_ok=True)
    n = len(cav_ids)
    path = os.path.join(d, f"{timestamp}.npz")
    np.savez(path,
             cav_ids=np.asarray([str(c) for c in cav_ids]),
             centers=np.asarray(centers[:n], np.float32),
             mask=np.asarray(mask[:n], bool))
    return path


def load_stage1_cache(stage1_dir: str, scene: str, timestamp: str):
    """Read one frame's cache. Returns ``{cav_id: (centers (M, 2),
    mask (M,))}`` or None if the frame was never pre-calculated (the
    dataset then passes the yaml pose through unchanged, like the
    reference when stage1_result has no entry)."""
    path = os.path.join(stage1_dir, scene, f"{timestamp}.npz")
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        ids = [str(c) for c in z["cav_ids"]]
        centers, mask = z["centers"], z["mask"]
    return {c: (centers[i], mask[i]) for i, c in enumerate(ids)}


def apply_box_align(frame: dict, centers: np.ndarray, bmask: np.ndarray,
                    cfg: BoxAlignCfg) -> dict:
    """Correct a frame's collaborator poses from per-agent stage-1 centers.

    frame: needs ``agent_poses`` (L, 6 degrees) + ``agent_mask`` (L,);
    centers/bmask: (L, M, 2)/(L, M) detections in each agent's own frame.
    Returns a shallow copy of ``frame`` with ``agent_poses`` replaced:
    x/y/yaw(index 4, degrees) updated, z/roll/pitch untouched (the pose
    graph is SE2 — reference box_align_v2 likewise solves planar poses).
    """
    import jax
    import jax.numpy as jnp

    from quantv2x_tpu.ops.pose_graph import box_align

    poses = np.asarray(frame["agent_poses"], np.float64)
    amask = np.asarray(frame["agent_mask"], bool)
    se2 = np.stack([poses[:, 0], poses[:, 1],
                    np.radians(poses[:, 4])], axis=-1)
    # tiny dense solve (L <= 8, M <= 64): pin to host CPU so the data
    # path never round-trips the accelerator per __getitem__
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        corrected = np.asarray(box_align(
            jnp.asarray(se2), jnp.asarray(centers, jnp.float32),
            jnp.asarray(bmask), jnp.asarray(amask),
            match_radius=cfg.match_radius, gn_iters=cfg.gn_iters))
    out_poses = poses.copy()
    upd = amask
    out_poses[upd, 0] = corrected[upd, 0]
    out_poses[upd, 1] = corrected[upd, 1]
    out_poses[upd, 4] = np.degrees(corrected[upd, 2])
    out = dict(frame)
    out["agent_poses"] = out_poses.astype(np.float32)
    return out
