import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.data.pipeline import frame_to_batch
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.data.voxelizer import VoxelCfg, voxelize
from quantv2x_tpu.models.collab_model import ModelCfg, PyramidCollabModel
from quantv2x_tpu.ops.warp_affine import warp_affine

TINY_RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)
TINY_VOXEL = VoxelCfg(lidar_range=TINY_RANGE, voxel_size=(0.4, 0.4, 4.0),
                      max_points_per_voxel=8, max_voxels=1024)
TINY_MODEL = ModelCfg(voxel=TINY_VOXEL, max_cav=2)


class TestVoxelizer:
    def test_basic_grouping(self):
        pts = jnp.array([
            [0.1, 0.1, 0.0, 0.5],
            [0.15, 0.12, 0.1, 0.6],   # same pillar as point 0
            [5.0, 5.0, 0.0, 0.7],     # different pillar
            [100.0, 0.0, 0.0, 0.8],   # out of range
        ])
        mask = jnp.ones(4, bool)
        out = voxelize(pts, mask, TINY_VOXEL)
        counts = np.asarray(out["voxel_num_points"])
        assert sorted(counts[counts > 0].tolist()) == [1, 2]
        assert np.asarray(out["voxel_mask"]).sum() == 2
        # coords decode back to the right cells
        coords = np.asarray(out["voxel_coords"])[np.asarray(out["voxel_mask"])]
        x1, y1 = TINY_RANGE[0], TINY_RANGE[1]
        cells = {(int((0.1 - x1) / 0.4), int((0.1 - y1) / 0.4)),
                 (int((5.0 - x1) / 0.4), int((5.0 - y1) / 0.4))}
        got = {(c[2], c[1]) for c in coords.tolist()}
        assert got == cells

    def test_max_points_cap(self):
        pts = jnp.tile(jnp.array([[1.0, 1.0, 0.0, 0.5]]), (20, 1))
        out = voxelize(pts, jnp.ones(20, bool), TINY_VOXEL)
        counts = np.asarray(out["voxel_num_points"])
        assert counts.max() == TINY_VOXEL.max_points_per_voxel

    def test_padded_points_ignored(self):
        pts = jnp.zeros((16, 4))
        out = voxelize(pts, jnp.zeros(16, bool), TINY_VOXEL)
        assert np.asarray(out["voxel_mask"]).sum() == 0

    def test_feature_preserved(self):
        pts = jnp.array([[2.0, -3.0, -1.0, 0.9]])
        out = voxelize(pts, jnp.ones(1, bool), TINY_VOXEL)
        vm = np.asarray(out["voxel_mask"])
        feats = np.asarray(out["voxel_features"])[vm][0]
        np.testing.assert_allclose(feats[0], [2.0, -3.0, -1.0, 0.9], atol=1e-6)


class TestWarpAffine:
    def test_identity(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 24, 3)).astype(np.float32))
        theta = jnp.array([[1.0, 0, 0], [0, 1.0, 0]])
        y = warp_affine(x, theta)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_translation_shifts_content(self):
        x = jnp.zeros((8, 8, 1)).at[4, 4, 0].set(1.0)
        # theta maps output->input; tx=+2 pixels in normalized units = 2*2/8
        theta = jnp.array([[1.0, 0, 0.5], [0, 1.0, 0]])
        y = np.asarray(warp_affine(x, theta))
        # content moves left by 2 px: peak now at x=2
        assert y[4, 2, 0] == pytest.approx(1.0, abs=1e-5)
        assert y[4, 4, 0] == pytest.approx(0.0, abs=1e-5)

    def test_zero_padding_outside(self):
        x = jnp.ones((8, 8, 1))
        theta = jnp.array([[1.0, 0, 1.9], [0, 1.0, 0]])  # mostly out of range
        y = np.asarray(warp_affine(x, theta))
        assert y[:, -1].max() == 0.0  # rightmost samples fall outside input


class TestModelForward:
    @pytest.fixture(scope="class")
    def batch(self):
        frame = make_frame(SyntheticCfg(
            lidar_range=TINY_RANGE, num_agents=2, num_objects=4,
            points_per_agent=4000, seed=3))
        return frame_to_batch(frame, TINY_VOXEL, max_cav=2)

    def test_forward_shapes(self, batch):
        model = PyramidCollabModel(TINY_MODEL)
        rng = jax.random.PRNGKey(0)
        variables = model.init(rng, batch, train=False)
        out = model.apply(variables, batch, train=False)
        H, W = TINY_MODEL.bev_hw
        h, w = H // 2, W // 2
        S = TINY_MODEL.anchor_num * TINY_MODEL.num_class
        assert out["cls_preds"].shape == (1, h, w, S * 3)
        assert out["reg_preds"].shape == (1, h, w, S * 7)
        assert out["dir_preds"].shape == (1, h, w, S * 2)
        assert len(out["occ_maps"]) == 3
        assert out["occ_maps"][0].shape == (1, 2, h, w, 1)
        assert out["occ_maps"][1].shape == (1, 2, h // 2, w // 2, 1)
        for v in ("cls_preds", "reg_preds", "dir_preds"):
            assert np.isfinite(np.asarray(out[v])).all()

    def test_agent_mask_padding_invariance(self, batch):
        """Adding an all-padding agent slot must not change predictions."""
        model = PyramidCollabModel(TINY_MODEL)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        out2 = model.apply(variables, batch, train=False)

        cfg3 = ModelCfg(voxel=TINY_VOXEL, max_cav=3)
        frame = make_frame(SyntheticCfg(
            lidar_range=TINY_RANGE, num_agents=2, num_objects=4,
            points_per_agent=4000, seed=3))
        batch3 = frame_to_batch(frame, TINY_VOXEL, max_cav=3)
        model3 = PyramidCollabModel(cfg3)
        out3 = model3.apply(variables, batch3, train=False)
        np.testing.assert_allclose(
            np.asarray(out2["cls_preds"]), np.asarray(out3["cls_preds"]),
            atol=1e-4,
        )


def test_voxelizer_overflow_drop_is_spatially_unbiased():
    """When pillar count exceeds max_voxels, the dropped pillars must not
    all come from one side of the grid (a raw pid-sorted slot assignment
    always blanked the highest-y band)."""
    from quantv2x_tpu.data.voxelizer import VoxelCfg, voxelize

    rng_range = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)
    cfg = VoxelCfg(lidar_range=rng_range, voxel_size=(0.4, 0.4, 4.0),
                   max_points_per_voxel=4, max_voxels=512)
    # one point per pillar over a 96x96 grid: 9216 pillars >> 512 slots
    g = np.linspace(-19.0, 19.0, 96)
    xx, yy = np.meshgrid(g, g)
    pts = np.stack([xx.ravel(), yy.ravel(),
                    np.zeros(96 * 96), np.full(96 * 96, 0.5)], 1)
    out = voxelize(jnp.asarray(pts, jnp.float32),
                   jnp.ones(len(pts), bool), cfg)
    vm = np.asarray(out["voxel_mask"])
    assert vm.sum() == 512
    gy = np.asarray(out["voxel_coords"])[vm][:, 1]
    # kept pillars span the y range instead of clustering at low y
    assert gy.min() < 24 and gy.max() > 72
    # roughly uniform: both halves get a meaningful share
    lo = (gy < 48).mean()
    assert 0.3 < lo < 0.7
