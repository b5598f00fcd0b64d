"""Train-time point-cloud + GT augmentation (host-side numpy).

Parity: data_utils/augmentor/data_augmentor.py + augment_utils.py —
random world flip (x/y axis), rotation about z, and global scaling applied
consistently to every agent's points, poses, and the GT boxes.
"""

import numpy as np


class AugmentedSource:
    """Wrap an index-able frame source with per-sample, per-epoch random
    augmentation (parity: augmentor/data_augmentor.py applied inside
    __getitem__ — a fresh draw every epoch, not a static doubling).

    Deterministic per (seed, epoch, index) so PrefetchLoader worker
    threads reproduce regardless of schedule. Camera frames pass through
    un-augmented (geometric point/box aug would desync the camera rig).
    """

    def __init__(self, source, seed: int = 123, **aug_kwargs):
        self.source = source
        self.seed = seed
        self.aug_kwargs = aug_kwargs
        self._epoch = 0

    def __len__(self):
        return len(self.source)

    def reinitialize(self):
        self._epoch += 1
        if hasattr(self.source, "reinitialize"):
            self.source.reinitialize()

    def __getitem__(self, i):
        f = self.source[i]
        if "camera_imgs" in f:
            return f
        rng = np.random.default_rng((self.seed, self._epoch, i))
        return augment_frame(f, rng, **self.aug_kwargs)


def augment_frame(frame, rng: np.random.Generator,
                  flip=("x",), rot_range=(-0.785, 0.785),
                  scale_range=(0.95, 1.05)):
    """Returns an augmented copy of a make_frame-contract dict.

    The augmentation is applied to the SCENE as seen in the ego frame
    (matching the reference, which augments the merged ego-frame point
    cloud): rotation via per-agent conjugated local transforms, uniform
    scale via points+pose translations, flip via mirrored local frames.
    Poses (and therefore the model's pairwise transforms) stay consistent
    with the transformed points throughout.
    """
    out = {k: np.copy(v) for k, v in frame.items()}

    # global rotation of the SCENE in the ego frame. Rotating every pose
    # by a world rotation would be a no-op on the model input (pairwise
    # transforms are invariant to a global rigid motion) while still
    # moving the ego-frame GT — corrupted labels. Instead keep poses
    # fixed and rotate each agent's LOCAL points by the conjugated
    # transform C_i = A_i^-1 M A_i (A_i = ego<-local): then every
    # agent's ego-projection is exactly M(scene), matching M(GT).
    from quantv2x_tpu.data.dataset import _pose_to_T

    ang = rng.uniform(*rot_range)
    c, s = np.cos(ang), np.sin(ang)
    M = np.eye(4)
    M[:2, :2] = [[c, -s], [s, c]]
    poses = out["agent_poses"]
    T_ego_inv = np.linalg.inv(_pose_to_T(poses[0]))
    for i in range(len(poses)):
        A = T_ego_inv @ _pose_to_T(poses[i])
        C = np.linalg.inv(A) @ M @ A
        pts = out["agent_points"][i]
        xyz = pts[:, :3] @ C[:3, :3].T + C[:3, 3]
        out["agent_points"][i][:, :3] = xyz
    gt = out["gt_boxes"]
    gt[:, :2] = gt[:, :2] @ M[:2, :2].T
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
