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
class WildCfg:
    """Communication time-delay model (parity: wild_setting,
    v2xreal_basedataset.py:89-122 + time_delay_calculation:483-513).

    Delay in ms is quantized to whole frames at ``frame_hz`` (the
    reference hard-codes ``// 100`` for 10 Hz data). Non-ego agents then
    contribute lidar + pose from the stale timestamp, so fusion sees both
    outdated geometry and outdated ego-projection — the same failure mode
    the reference simulates.
    """

    async_flag: bool = False
    async_mode: str = "sim"        # 'sim': constant | 'real': sampled
    async_overhead: float = 0.0    # ms (uniform upper bound in 'real')
    data_size: float = 0.0         # MB of the transmitted message
    transmission_speed: float = 27.0  # Mbps
    backbone_delay: float = 0.0    # ms of sender-side compute
    frame_hz: float = 10.0

    @classmethod
    def from_hypes(cls, wild: dict | None):
        if not wild:
            return cls()
        return cls(
            async_flag=bool(wild.get("async", False)),
            async_mode=wild.get("async_mode", "sim"),
            async_overhead=float(wild.get("async_overhead", 0.0)),
            data_size=float(wild.get("data_size", 0.0)),
            transmission_speed=float(wild.get("transmission_speed", 27.0)),
            backbone_delay=float(wild.get("backbone_delay", 0.0)),
        )


def time_delay_frames(cfg: WildCfg, rng: np.random.Generator,
                      ego: bool) -> int:
    """Frames of staleness for one agent's message (0 for the ego)."""
    if ego or not cfg.async_flag:
        return 0
    if cfg.async_mode == "real":
        overhead_noise = rng.uniform(0.0, cfg.async_overhead)
        tc = cfg.data_size / cfg.transmission_speed * 1000.0
        delay_ms = overhead_noise + tc + cfg.backbone_delay
    else:
        delay_ms = abs(cfg.async_overhead)
    return int(delay_ms // (1000.0 / cfg.frame_hz))


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
