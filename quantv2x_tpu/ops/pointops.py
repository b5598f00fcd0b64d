"""Fixed-capacity point-set ops: the TPU equivalents of the reference's
pointnet2 CUDA kernels and roiaware_pool3d.

Parity targets (all CUDA in the reference, here static-shape XLA):
  - pcdet_utils/pointnet2/pointnet2_stack/src/sampling_gpu.cu
    (furthest_point_sample) -> farthest_point_sample via lax.scan;
  - .../ball_query_gpu.cu + group_points_gpu.cu (StackSAModuleMSG
    grouping) -> ball_query_group, a masked top-nsample gather over a
    chunked distance matrix;
  - .../interpolate_gpu.cu (three_nn + three_interpolate) ->
    three_nn_interpolate;
  - models/sub_modules/vsa.py:13-42 (bilinear_interpolate_torch) ->
    bilinear_from_bev;
  - pcdet_utils/roiaware_pool3d/src/roiaware_pool3d_kernel.cu
    (points-in-box rasterized max/avg pool) -> roiaware_pool.

Dynamic point/neighbor counts become pad-and-mask: every function takes a
validity mask and returns one, so downstream MLPs run dense on the MXU
and masked reductions ignore padding.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

_BIG = 1e9


def farthest_point_sample(points, mask, num_samples: int):
    """Iterative FPS over (N, 3) points with (N,) validity mask.

    Returns (num_samples,) int32 indices. Invalid points are never chosen
    unless fewer than num_samples valid points exist, in which case the
    first valid index repeats (mirrors the reference's wrap-around fill,
    vsa.py:155-158).
    """
    n = points.shape[0]
    valid = mask.astype(jnp.float32)
    start = jnp.argmax(valid)  # first valid point

    def step(carry, _):
        dists, last_idx = carry
        d = jnp.sum((points - points[last_idx]) ** 2, axis=-1)
        dists = jnp.minimum(dists, d)
        # among valid points, take the farthest from the selected set
        nxt = jnp.argmax(jnp.where(mask, dists, -_BIG))
        return (dists, nxt), last_idx

    (_, _), idx = jax.lax.scan(
        step, (jnp.full((n,), _BIG), start), None, length=num_samples)
    return idx.astype(jnp.int32)


def _pairwise_sqdist(a, b):
    """(M, 3) x (N, 3) -> (M, N) squared distances."""
    return (jnp.sum(a ** 2, axis=-1)[:, None]
            + jnp.sum(b ** 2, axis=-1)[None, :]
            - 2.0 * a @ b.T)


def ball_query_group(centers, center_mask, points, point_mask,
                     radius: float, nsample: int, chunk: int = 256):
    """For each center, gather up to nsample point indices within radius.

    Returns (idx, grp_mask): (M, nsample) int32 and bool. Processes
    centers in chunks of `chunk` to bound the (chunk, N) distance matrix
    (the reference's CUDA kernel threads over centers the same way).
    """
    m = centers.shape[0]
    pad = (-m) % chunk
    centers_p = jnp.pad(centers, ((0, pad), (0, 0)))
    cmask_p = jnp.pad(center_mask, (0, pad))

    k = min(nsample, points.shape[0])

    def do_chunk(args):
        c, cm = args
        d2 = _pairwise_sqdist(c, points)
        inb = (d2 <= radius * radius) & point_mask[None, :] & cm[:, None]
        # nearest-first among in-ball points
        _, idx = jax.lax.top_k(jnp.where(inb, -d2, -_BIG), k)
        if k < nsample:
            idx = jnp.pad(idx, ((0, 0), (0, nsample - k)))
        gmask = jnp.take_along_axis(inb, idx, axis=1)
        # reference semantics: empty slots repeat the first neighbor
        first = idx[:, :1]
        idx = jnp.where(gmask, idx, first)
        return idx.astype(jnp.int32), gmask

    idx, gmask = jax.lax.map(
        do_chunk,
        (centers_p.reshape(-1, chunk, 3), cmask_p.reshape(-1, chunk)))
    idx = idx.reshape(-1, nsample)[:m]
    gmask = gmask.reshape(-1, nsample)[:m]
    return idx, gmask


def group_points(points, feats, idx, grp_mask, centers):
    """Assemble grouped SA input: relative xyz ++ features, zeroed at
    padded slots. points (N,3), feats (N,C) or None, idx/mask (M,K),
    centers (M,3) -> (M, K, 3[+C])."""
    rel = points[idx] - centers[:, None, :]
    if feats is not None:
        g = jnp.concatenate(
            [rel, feats[idx]], axis=-1)
    else:
        g = rel
    return jnp.where(grp_mask[..., None], g, 0.0)


def three_nn_interpolate(query, query_mask, support, support_mask, feats):
    """Inverse-distance weighted 3-NN interpolation (interpolate_gpu.cu).

    query (M,3), support (N,3), feats (N,C) -> (M, C)."""
    d2 = _pairwise_sqdist(query, support)
    d2 = jnp.where(support_mask[None, :], d2, _BIG)
    nd, idx = jax.lax.top_k(-d2, 3)
    w = 1.0 / jnp.maximum(-nd, 1e-8)
    w = w / w.sum(axis=1, keepdims=True)
    out = jnp.einsum("mk,mkc->mc", w, feats[idx])
    return jnp.where(query_mask[:, None], out, 0.0)


def bilinear_from_bev(bev, xy, lidar_range, bev_stride_m: Tuple[float, float]):
    """Sample (H, W, C) BEV features at metric xy (M, 2) positions.

    Canvas convention of this repo's encoders (scatter_to_grid3d,
    PointPillarScatter): rows index y, cols index x. Parity:
    vsa.py:13-42,104-119."""
    H, W, _ = bev.shape
    fx = (xy[:, 1] - lidar_range[1]) / bev_stride_m[1]   # row <- y
    fy = (xy[:, 0] - lidar_range[0]) / bev_stride_m[0]   # col <- x
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, H - 2)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, W - 2)
    tx = jnp.clip(fx - x0, 0.0, 1.0)[:, None]
    ty = jnp.clip(fy - y0, 0.0, 1.0)[:, None]
    f00 = bev[x0, y0]
    f01 = bev[x0, y0 + 1]
    f10 = bev[x0 + 1, y0]
    f11 = bev[x0 + 1, y0 + 1]
    return ((1 - tx) * (1 - ty) * f00 + (1 - tx) * ty * f01
            + tx * (1 - ty) * f10 + tx * ty * f11)


def roiaware_pool(points, point_mask, feats, boxes, box_mask,
                  grid_size: int = 6, pool: str = "max"):
    """RoI-aware grid pooling (roiaware_pool3d_kernel.cu).

    Rasterizes each box into grid_size^3 cells and max/avg-pools the
    features of the points falling in each cell.

    points (N,3), feats (N,C), boxes (R,7) lwh order -> (R, G, G, G, C).
    """
    R = boxes.shape[0]
    G = grid_size
    C = feats.shape[-1]

    def per_box(box, bm):
        cx, cy, cz = box[0], box[1], box[2]
        l, w, h = box[3], box[4], box[5]
        yaw = box[6]
        ca, sa = jnp.cos(-yaw), jnp.sin(-yaw)
        dx = points[:, 0] - cx
        dy = points[:, 1] - cy
        lx = dx * ca - dy * sa
        ly = dx * sa + dy * ca
        lz = points[:, 2] - cz
        gx = jnp.floor((lx / jnp.maximum(l, 1e-4) + 0.5) * G).astype(jnp.int32)
        gy = jnp.floor((ly / jnp.maximum(w, 1e-4) + 0.5) * G).astype(jnp.int32)
        gz = jnp.floor((lz / jnp.maximum(h, 1e-4) + 0.5) * G).astype(jnp.int32)
        inside = (point_mask & bm
                  & (gx >= 0) & (gx < G) & (gy >= 0) & (gy < G)
                  & (gz >= 0) & (gz < G))
        cell = jnp.where(inside, (gx * G + gy) * G + gz, G ** 3)
        if pool == "max":
            grid = jnp.full((G ** 3 + 1, C), -_BIG).at[cell].max(
                jnp.where(inside[:, None], feats, -_BIG))[:-1]
            grid = jnp.where(grid <= -_BIG / 2, 0.0, grid)
        else:
            ssum = jnp.zeros((G ** 3 + 1, C)).at[cell].add(
                jnp.where(inside[:, None], feats, 0.0))[:-1]
            cnt = jnp.zeros(G ** 3 + 1).at[cell].add(
                inside.astype(jnp.float32))[:-1]
            grid = ssum / jnp.maximum(cnt, 1.0)[:, None]
        return grid.reshape(G, G, G, C)

    return jax.lax.map(lambda ab: per_box(*ab), (boxes, box_mask))


def points_in_boxes_index(points, boxes, box_mask, order: str = "lwh"):
    """First box index containing each point, -1 if none
    (roiaware_pool3d points_in_boxes_gpu parity). points (N,3),
    boxes (R,7) -> (N,) int32."""
    from quantv2x_tpu.utils.box_utils import to_lwh
    b = to_lwh(boxes, order)
    cx, cy, cz = b[:, 0], b[:, 1], b[:, 2]
    l, w, h = b[:, 3], b[:, 4], b[:, 5]
    yaw = b[:, 6]
    dx = points[:, None, 0] - cx[None, :]
    dy = points[:, None, 1] - cy[None, :]
    ca, sa = jnp.cos(-yaw)[None, :], jnp.sin(-yaw)[None, :]
    lx = dx * ca - dy * sa
    ly = dx * sa + dy * ca
    lz = points[:, None, 2] - cz[None, :]
    inside = ((jnp.abs(lx) <= l[None, :] / 2)
              & (jnp.abs(ly) <= w[None, :] / 2)
              & (jnp.abs(lz) <= h[None, :] / 2)
              & box_mask[None, :])
    any_in = inside.any(axis=1)
    return jnp.where(any_in, jnp.argmax(inside, axis=1), -1).astype(jnp.int32)
