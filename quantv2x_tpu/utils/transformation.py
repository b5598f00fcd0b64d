"""Pose / rigid-transform utilities (vectorized, jit-safe).

Behavioral parity with the reference's transform conventions
(/root/reference/opencood/utils/transformation_utils.py):

  - poses are ``[x, y, z, roll, yaw, pitch]`` in degrees (CARLA convention)
    or ``[x, y, yaw]``;
  - ``pose_to_world(pose)`` is T_world_x (x_to_world:264-307 in the ref);
  - ``pairwise_transformation(poses)`` gives T[i, j] = T_j←i, i.e. the map
    from agent i's frame into agent j's frame (get_pairwise_transformation:21-67);
  - ``normalize_pairwise_tfm`` turns 4x4 BEV-plane transforms into the 2x3
    normalized affine matrices consumed by the bilinear warp
    (normalize_pairwise_tfm:68-95).

All functions are batched over leading axes and written for XLA: no Python
loops over traced values, everything is a fixed-size einsum/stack.
"""

import jax.numpy as jnp
import numpy as np


def pose_to_world(pose):
    """Pose -> T_world_x homogeneous 4x4.

    pose: (..., 6) = [x, y, z, roll, yaw, pitch] degrees, or (..., 3) = [x, y, yaw].
    Returns (..., 4, 4).
    """
    pose = jnp.asarray(pose)
    if pose.shape[-1] == 3:
        zeros = jnp.zeros_like(pose[..., 0])
        pose = jnp.stack(
            [pose[..., 0], pose[..., 1], zeros, zeros, pose[..., 2], zeros],
            axis=-1,
        )
    x, y, z = pose[..., 0], pose[..., 1], pose[..., 2]
    roll, yaw, pitch = (jnp.radians(pose[..., i]) for i in (3, 4, 5))
    c_y, s_y = jnp.cos(yaw), jnp.sin(yaw)
    c_r, s_r = jnp.cos(roll), jnp.sin(roll)
    c_p, s_p = jnp.cos(pitch), jnp.sin(pitch)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    # CARLA rotation order (matches reference x_to_world).
    rows = [
        [c_p * c_y, c_y * s_p * s_r - s_y * c_r, -c_y * s_p * c_r - s_y * s_r, x],
        [s_y * c_p, s_y * s_p * s_r + c_y * c_r, -s_y * s_p * c_r + c_y * s_r, y],
        [s_p, -c_p * s_r, c_p * c_r, z],
        [zero, zero, zero, one],
    ]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def inverse_rigid(T):
    """Invert homogeneous rigid transform(s) (..., 4, 4) without linalg.inv."""
    R = T[..., :3, :3]
    t = T[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -jnp.einsum("...ij,...jk->...ik", Rt, t, precision="highest")], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def x1_to_x2(pose1, pose2):
    """T_x2←x1 from two poses (parity: x1_to_x2 ref:310)."""
    return inverse_rigid(pose_to_world(pose2)) @ pose_to_world(pose1)


def pairwise_transformation(poses, valid_mask=None):
    """All-pairs transforms between agent frames.

    poses: (L, 6) agent lidar poses (degrees).
    valid_mask: optional (L,) bool; invalid rows produce identity.
    Returns (L, L, 4, 4) with out[i, j] = T_j←i.
    """
    poses = jnp.asarray(poses)
    L = poses.shape[0]
    Tw = pose_to_world(poses)            # (L, 4, 4) T_world_i
    Tw_inv = inverse_rigid(Tw)           # (L, 4, 4) T_i_world
    out = jnp.einsum("jab,ibc->ijac", Tw_inv, Tw, precision="highest")  # out[i,j] = Tj_inv @ Ti
    eye = jnp.eye(4, dtype=out.dtype)
    if valid_mask is not None:
        m = valid_mask.astype(bool)
        pair_ok = m[:, None] & m[None, :]
        out = jnp.where(pair_ok[:, :, None, None], out, eye)
    # self-transform is exactly identity
    self_mask = jnp.eye(L, dtype=bool)[:, :, None, None]
    return jnp.where(self_mask, eye, out)


def normalize_pairwise_tfm(pairwise_t_matrix, H: int, W: int, discrete_ratio: float,
                           downsample_rate: int = 1):
    """4x4 BEV transforms -> 2x3 normalized affine matrices for bilinear warp.

    pairwise_t_matrix: (..., 4, 4). H, W: feature-map size.
    discrete_ratio * downsample_rate: metres per feature pixel.
    Returns (..., 2, 3), same normalization as the reference (ref:68-95), i.e.
    the affine matrix maps normalized ([-1, 1]) output coords to normalized
    input coords with aspect-ratio correction.
    """
    t = jnp.asarray(pairwise_t_matrix)
    a = t[..., 0, 0]
    b = t[..., 0, 1] * (H / W)
    tx = t[..., 0, 3] / (downsample_rate * discrete_ratio * W) * 2
    c = t[..., 1, 0] * (W / H)
    d = t[..., 1, 1]
    ty = t[..., 1, 3] / (downsample_rate * discrete_ratio * H) * 2
    row0 = jnp.stack([a, b, tx], axis=-1)
    row1 = jnp.stack([c, d, ty], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def project_points(points, T):
    """Apply homogeneous transform T (4,4) to points (..., 3)."""
    points = jnp.asarray(points)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...pj,...kj->...pk", points, R, precision="highest") + t


def np_pose_to_world(pose):
    """Numpy twin of pose_to_world for host-side data pipeline code.

    Pure numpy on purpose: host-side per-frame loops must never dispatch
    eager device ops (catastrophically slow over a remote-TPU tunnel).
    """
    pose = np.asarray(pose, dtype=np.float64)
    x, y, z = pose[0], pose[1], pose[2]
    roll, yaw, pitch = np.radians(pose[3]), np.radians(pose[4]), np.radians(pose[5])
    c_y, s_y = np.cos(yaw), np.sin(yaw)
    c_r, s_r = np.cos(roll), np.sin(roll)
    c_p, s_p = np.cos(pitch), np.sin(pitch)
    T = np.identity(4)
    T[0, 3], T[1, 3], T[2, 3] = x, y, z
    T[0, 0] = c_p * c_y
    T[0, 1] = c_y * s_p * s_r - s_y * c_r
    T[0, 2] = -c_y * s_p * c_r - s_y * s_r
    T[1, 0] = s_y * c_p
    T[1, 1] = s_y * s_p * s_r + c_y * c_r
    T[1, 2] = -s_y * s_p * c_r + c_y * s_r
    T[2, 0] = s_p
    T[2, 1] = -c_p * s_r
    T[2, 2] = c_p * c_r
    return T
