"""Communication-impairment simulation: localization noise + agent dropout.

Parity: the reference's domain-level fault injection (SURVEY.md §5):
  - pose_utils.add_noise_data_dict (pose_utils.py:9) — gaussian noise on
    collaborator xyz/yaw driven by noise_setting; swept by
    tools/inference_w_noise.py;
  - time-delay frames (wild_setting, v2xreal_basedataset.py:89-122) — here
    surfaced as a frame-index offset hook for sequence datasets;
  - agent dropout via comm-range filtering / use_cav capping
    (heter_infer/...:210).
"""

import dataclasses

import numpy as np


@dataclasses.dataclass
class NoiseCfg:
    pos_std: float = 0.0       # metres, xy
    rot_std: float = 0.0       # degrees, yaw
    pos_mean: float = 0.0
    rot_mean: float = 0.0


def add_pose_noise(frame, cfg: NoiseCfg, rng: np.random.Generator):
    """Perturb every non-ego agent's pose (ego stays clean — parity with
    add_noise_data_dict which skips the ego)."""
    out = dict(frame)
    poses = np.copy(frame["agent_poses"])
    n = poses.shape[0]
    if cfg.pos_std > 0 or cfg.rot_std > 0:
        for a in range(1, n):
            if not frame["agent_mask"][a]:
                continue
            poses[a, 0] += rng.normal(cfg.pos_mean, cfg.pos_std)
            poses[a, 1] += rng.normal(cfg.pos_mean, cfg.pos_std)
            poses[a, 4] += rng.normal(cfg.rot_mean, cfg.rot_std)
    out["agent_poses"] = poses
    return out


def drop_agents(frame, use_cav: int):
    """Cap the number of collaborators (ego always kept)."""
    out = dict(frame)
    mask = np.copy(frame["agent_mask"])
    keep = 0
    for a in range(len(mask)):
        if mask[a]:
            keep += 1
            if keep > use_cav:
                mask[a] = False
    out["agent_mask"] = mask
    return out
