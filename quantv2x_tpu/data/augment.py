"""Train-time point-cloud + GT augmentation (host-side numpy).

Parity: data_utils/augmentor/data_augmentor.py + augment_utils.py —
random world flip (x/y axis), rotation about z, and global scaling applied
consistently to every agent's points, poses, and the GT boxes.
"""

import numpy as np


def augment_frame(frame, rng: np.random.Generator,
                  flip=("x",), rot_range=(-0.785, 0.785),
                  scale_range=(0.95, 1.05)):
    """Returns an augmented copy of a make_frame-contract dict.

    The augmentation is applied in the EGO frame: points of every agent are
    in their own local frames, so we transform poses and GT instead of the
    raw points where possible; flips require flipping local points too
    (a world flip maps each local frame to a mirrored one).
    """
    out = {k: np.copy(v) for k, v in frame.items()}

    # global rotation about ego z: rotate agent poses and GT
    ang = rng.uniform(*rot_range)
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, -s], [s, c]])
    poses = out["agent_poses"]
    poses[:, :2] = poses[:, :2] @ R.T
    poses[:, 4] += np.degrees(ang)
    gt = out["gt_boxes"]
    gt[:, :2] = gt[:, :2] @ R.T
    gt[:, 6] += ang

    # global scale
    sc = rng.uniform(*scale_range)
    out["agent_points"][..., :3] *= sc
    poses[:, :3] *= sc
    gt[:, :6] *= sc

    # flip about world x axis (y -> -y)
    if "x" in flip and rng.random() < 0.5:
        out["agent_points"][..., 1] *= -1
        poses[:, 1] *= -1
        poses[:, 4] *= -1
        gt[:, 1] *= -1
        gt[:, 6] *= -1

    out["agent_poses"] = poses
    out["gt_boxes"] = gt
    return out
