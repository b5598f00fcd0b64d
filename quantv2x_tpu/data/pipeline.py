"""Frame -> model batch assembly (jit-friendly given fixed shapes).

Mirrors the reference's intermediate-fusion collate contract
(intermediate_heter_fusion_3class_dataset.py:601-764): per-agent voxel
buffers, agent mask (replaces record_len), pairwise transform matrix, padded
GT + labels. Everything static-shape.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from quantv2x_tpu.data.voxelizer import VoxelCfg, voxelize
from quantv2x_tpu.utils.transformation import pairwise_transformation


# non-array frame metadata the jitted assembly must never see (the
# dataset attaches e.g. kept-cav id strings for cache labeling)
_META_KEYS = ("cav_ids",)


def frame_to_batch(frame, voxel_cfg: VoxelCfg, max_cav: int = 4):
    """One multi-agent frame (synthetic.make_frame contract) -> batch of 1.

    Returns dict with leading (B=1, L=max_cav) axes:
      voxel_features (1,L,V,P,4), voxel_coords (1,L,V,3),
      voxel_num_points (1,L,V), voxel_mask (1,L,V),
      agent_mask (1,L), pairwise_t_matrix (1,L,L,4,4),
      gt_boxes/gt_classes/gt_mask passthrough with batch axis.
    """
    if any(k in frame for k in _META_KEYS):
        frame = {k: v for k, v in frame.items() if k not in _META_KEYS}
    return _frame_to_batch(frame, voxel_cfg, max_cav)


@functools.partial(jax.jit, static_argnames=("voxel_cfg", "max_cav"))
def _frame_to_batch(frame, voxel_cfg: VoxelCfg, max_cav: int = 4):
    pts = jnp.asarray(frame["agent_points"])        # (A, P, 4)
    pmask = jnp.asarray(frame["agent_points_mask"])  # (A, P)
    A = pts.shape[0]
    L = max_cav

    vox = jax.vmap(lambda p, m: voxelize(p, m, voxel_cfg))(pts, pmask)

    def pad_agents(x):
        pad = [(0, L - A)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)

    agent_mask = jnp.zeros((L,), bool).at[:A].set(jnp.asarray(frame["agent_mask"]))
    poses = jnp.pad(jnp.asarray(frame["agent_poses"]), ((0, L - A), (0, 0)))
    pairwise = pairwise_transformation(poses, agent_mask)

    batch = {
        "voxel_features": pad_agents(vox["voxel_features"])[None],
        "voxel_coords": pad_agents(vox["voxel_coords"])[None],
        "voxel_num_points": pad_agents(vox["voxel_num_points"])[None],
        "voxel_mask": pad_agents(vox["voxel_mask"])[None],
        "agent_mask": agent_mask[None],
        "pairwise_t_matrix": pairwise[None],
        "gt_boxes": jnp.asarray(frame["gt_boxes"])[None],
        "gt_classes": jnp.asarray(frame["gt_classes"])[None],
        "gt_mask": jnp.asarray(frame["gt_mask"])[None],
    }
    # camera rig (heterogeneous frames): (A, N_cam, ...) -> (1, L, N_cam, ...)
    for k in ("camera_imgs", "camera_intrinsics", "camera_rots",
              "camera_trans"):
        if k in frame:
            batch[k] = pad_agents(jnp.asarray(frame[k]))[None]
    if "agent_modality" in frame:
        batch["agent_modality"] = pad_agents(
            jnp.asarray(frame["agent_modality"], jnp.int32))[None]
    return batch


@jax.jit
def stack_batches(*batches):
    """Concatenate single-frame batches along the batch axis (jitted: one
    compiled program instead of one eager concat per dict key)."""
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *batches)
