"""PointPillars encoder: pillar feature net + BEV scatter (flax, static shapes).

Parity targets:
  - PFNLayer / PillarVFE: sub_modules/pillar_vfe.py:10-155 (per-point
    augmented features [xyzi, cluster offset, center offset], linear + BN +
    ReLU + max-pool over points);
  - PointPillarScatter: sub_modules/point_pillar_scatter.py:9-76 (dense BEV
    canvas, rows=y, cols=x);
  - the PointPillar heter encoder wrapper: heter_encoders.py:22-50.

TPU-first: pillar slots are padded to max_voxels so every matmul is a fixed
(max_voxels*max_points, C) MXU-friendly GEMM; padded entries are masked out of
BN statistics and max-pools.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from quantv2x_tpu.data.voxelizer import VoxelCfg
from quantv2x_tpu.models.layers import MaskedBatchNorm


class PFNLayer(nn.Module):
    out_channels: int
    last_layer: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, point_mask, train: bool = False):
        """feats: (V, P, C_in); point_mask: (V, P) bool."""
        ch = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(ch, use_bias=False, dtype=self.dtype, name="linear")(feats)
        x = MaskedBatchNorm(dtype=self.dtype, name="norm")(x, point_mask, train)
        x = nn.relu(x)
        x = jnp.where(point_mask[..., None], x, -jnp.inf)
        x_max = jnp.max(x, axis=1, keepdims=True)  # (V, 1, ch)
        x_max = jnp.where(jnp.isfinite(x_max), x_max, 0.0)
        if self.last_layer:
            return x_max[:, 0]  # (V, ch)
        x = jnp.where(point_mask[..., None], x, 0.0)
        return jnp.concatenate(
            [x, jnp.broadcast_to(x_max, x.shape)], axis=-1
        )


class PillarVFE(nn.Module):
    """Pillar feature net over padded voxel buffers."""
    voxel_cfg: VoxelCfg
    num_filters: Sequence[int] = (64,)
    use_absolute_xyz: bool = True
    with_distance: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxel_features, voxel_coords, voxel_num_points,
                 train: bool = False):
        """voxel_features: (V, P, 4); voxel_coords: (V, 3) (z,y,x);
        voxel_num_points: (V,). Returns (V, C_out)."""
        V, P, _ = voxel_features.shape
        cfg = self.voxel_cfg
        counts = jnp.maximum(voxel_num_points, 1).astype(self.dtype)[:, None, None]
        point_mask = (
            jnp.arange(P)[None, :] < voxel_num_points[:, None]
        )  # (V, P)

        xyz = voxel_features[..., :3]
        points_mean = jnp.where(point_mask[..., None], xyz, 0.0).sum(
            axis=1, keepdims=True
        ) / counts
        f_cluster = xyz - points_mean

        vx, vy, vz = cfg.voxel_size
        x1, y1, z1 = cfg.lidar_range[:3]
        cx = voxel_coords[:, 2:3].astype(self.dtype) * vx + (vx / 2 + x1)
        cy = voxel_coords[:, 1:2].astype(self.dtype) * vy + (vy / 2 + y1)
        cz = voxel_coords[:, 0:1].astype(self.dtype) * vz + (vz / 2 + z1)
        f_center = jnp.stack(
            [
                xyz[..., 0] - cx,
                xyz[..., 1] - cy,
                xyz[..., 2] - cz,
            ],
            axis=-1,
        )

        parts = [voxel_features if self.use_absolute_xyz
                 else voxel_features[..., 3:], f_cluster, f_center]
        if self.with_distance:
            parts.append(jnp.linalg.norm(xyz, axis=-1, keepdims=True))
        feats = jnp.concatenate(parts, axis=-1)
        feats = jnp.where(point_mask[..., None], feats, 0.0).astype(self.dtype)

        for i, ch in enumerate(self.num_filters):
            feats = PFNLayer(
                ch, last_layer=(i == len(self.num_filters) - 1),
                dtype=self.dtype, name=f"pfn{i}",
            )(feats, point_mask, train)
        return feats  # (V, C_out)


def scatter_to_bev(pillar_features, voxel_coords, voxel_mask, grid_hw):
    """Dense BEV canvas from pillar features.

    pillar_features: (V, C); voxel_coords: (V, 3) (z, y, x); voxel_mask: (V,).
    Returns (H, W, C). Parity: PointPillarScatter (point_pillar_scatter.py:9-76)
    with NHWC layout.
    """
    H, W = grid_hw
    C = pillar_features.shape[-1]
    y = voxel_coords[:, 1]
    x = voxel_coords[:, 2]
    # invalid slots scatter out of range and get dropped
    y = jnp.where(voxel_mask, y, H)
    canvas = jnp.zeros((H, W, C), pillar_features.dtype)
    return canvas.at[y, x].add(
        jnp.where(voxel_mask[:, None], pillar_features, 0.0), mode="drop"
    )


class PointPillarEncoder(nn.Module):
    """Full single-agent pillar encoder -> BEV (H, W, C) (heter_encoders.py:22-50)."""
    voxel_cfg: VoxelCfg
    num_filters: Sequence[int] = (64,)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxels, train: bool = False):
        feats = PillarVFE(
            self.voxel_cfg, self.num_filters, dtype=self.dtype, name="vfe"
        )(voxels["voxel_features"], voxels["voxel_coords"],
          voxels["voxel_num_points"], train)
        nx, ny, _ = self.voxel_cfg.grid_size
        return scatter_to_bev(
            feats, voxels["voxel_coords"], voxels["voxel_mask"], (ny, nx)
        )


def encode_pillar_bev(vfe, backbone, batch, grid_size, train: bool):
    """Shared pillar pipeline: VFE (one GEMM over every agent's voxels) ->
    BEV scatter -> conv backbone. batch leaves are (B, L, V, ...);
    returns (B*L, h, w, C).

    Single source of truth for the reshape/scatter/masking conventions —
    used by PyramidCollabModel, BaselineFusionModel, and the heter
    point_pillar branch.
    """
    import jax

    vf = batch["voxel_features"]
    B, L, V, P, F = vf.shape
    pillar = vfe(
        vf.reshape(B * L * V, P, F),
        batch["voxel_coords"].reshape(B * L * V, 3),
        batch["voxel_num_points"].reshape(B * L * V),
        train,
    ).reshape(B * L, V, -1)
    nx, ny, _ = grid_size
    bev = jax.vmap(
        lambda f, co, m: scatter_to_bev(f, co, m, (ny, nx))
    )(pillar, batch["voxel_coords"].reshape(B * L, V, 3),
      batch["voxel_mask"].reshape(B * L, V))
    return backbone(bev, train)
