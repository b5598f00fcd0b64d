import numpy as np
import pytest

from quantv2x_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)


def test_load_bin_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 8, (1000, 4)).astype(np.float32)
    pts[5, 0] = np.nan
    p = tmp_path / "x.bin"
    pts.tofile(p)
    out = native.load_bin(str(p))
    assert len(out) == 999
    out2 = native.load_bin(str(p), lidar_range=RANGE)
    assert len(out2) <= 999
    assert (np.abs(out2[:, 0]) < 19.2).all()


def test_host_voxelizer_matches_device():
    import jax.numpy as jnp
    from quantv2x_tpu.data.voxelizer import VoxelCfg, voxelize

    rng = np.random.default_rng(1)
    pts = np.concatenate(
        [rng.uniform(-19, 19, (5000, 2)), rng.uniform(-2.9, 0.9, (5000, 1)),
         rng.uniform(0, 1, (5000, 1))], axis=1
    ).astype(np.float32)
    cfg = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 4.0),
                   max_points_per_voxel=8, max_voxels=4096)
    host = native.voxelize_host(pts, RANGE, (0.4, 0.4, 4.0), 8, 4096)
    dev = voxelize(jnp.asarray(pts), jnp.ones(len(pts), bool), cfg)

    # same pillar set and per-pillar counts (order differs: first-come vs
    # sorted) as long as caps were not hit
    def key_count(coords, nums, valid_n):
        return {
            (int(coords[i, 1]), int(coords[i, 2])): int(nums[i])
            for i in range(valid_n) if nums[i] > 0
        }

    hmap = key_count(host["voxel_coords"], host["voxel_num_points"],
                     host["num_voxels"])
    dmask = np.asarray(dev["voxel_mask"])
    dmap = key_count(np.asarray(dev["voxel_coords"]),
                     np.asarray(dev["voxel_num_points"]), dmask.sum())
    assert hmap == dmap


def test_host_iou_matches_jnp():
    import jax.numpy as jnp
    from quantv2x_tpu.utils.box_utils import iou_matrix_axis_aligned

    rng = np.random.default_rng(2)
    a = np.sort(rng.uniform(-10, 10, (20, 4)).astype(np.float32), axis=-1)
    a = a[:, [0, 1, 2, 3]]
    a = np.stack([a[:, 0], a[:, 1], a[:, 2], a[:, 3]], axis=1)
    b = np.sort(rng.uniform(-10, 10, (15, 4)).astype(np.float32), axis=-1)
    got = native.iou_matrix_host(a, b)
    want = np.asarray(iou_matrix_axis_aligned(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-5)
