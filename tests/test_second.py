import jax
import jax.numpy as jnp
import numpy as np

from quantv2x_tpu.data.voxelizer import VoxelCfg, voxelize
from quantv2x_tpu.models.second_encoder import (
    SECONDEncoder,
    SecondCfg,
    mean_vfe,
    scatter_to_grid3d,
)

RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)


def test_mean_vfe():
    vf = jnp.zeros((2, 4, 4)).at[0, 0].set(jnp.array([1.0, 2, 3, 4])) \
        .at[0, 1].set(jnp.array([3.0, 4, 5, 6]))
    counts = jnp.array([2, 0])
    out = np.asarray(mean_vfe(vf, counts))
    np.testing.assert_allclose(out[0], [2.0, 3, 4, 5])
    np.testing.assert_allclose(out[1], 0.0)


def test_scatter_3d_places_voxels():
    feats = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    coords = jnp.array([[1, 2, 3], [0, 0, 0]])
    mask = jnp.array([True, False])
    grid = np.asarray(scatter_to_grid3d(feats, coords, mask, (4, 5, 6)))
    np.testing.assert_allclose(grid[1, 2, 3], [1.0, 2.0])
    assert grid.sum() == 3.0  # only the valid voxel scattered


def test_second_encoder_shapes():
    vcfg = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 0.5),
                    max_points_per_voxel=5, max_voxels=2048)
    scfg = SecondCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 0.5))
    assert scfg.grid_size == (96, 96, 8)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(
        np.concatenate(
            [rng.uniform(-19, 19, (2000, 2)), rng.uniform(-2.9, 0.9, (2000, 1)),
             rng.uniform(0, 1, (2000, 1))], axis=1
        ).astype(np.float32)
    )
    vox = voxelize(pts, jnp.ones(2000, bool), vcfg)
    model = SECONDEncoder(scfg)
    variables = jax.jit(lambda v: model.init(jax.random.PRNGKey(0), v))(vox)
    out = model.apply(variables, vox)
    assert out.shape == (48, 48, 64)
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.abs(out).sum()) > 0


def test_second_intermediate_forward():
    """Per-agent SECOND trunk + per-level att fusion produces head maps."""
    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.models.collab_model import ModelCfg
    from quantv2x_tpu.models.second_encoder import SecondIntermediate

    vcfg = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 0.5),
                    max_points_per_voxel=5, max_voxels=1024)
    mcfg = ModelCfg(voxel=vcfg, max_cav=2)
    frame = make_frame(SyntheticCfg(lidar_range=RANGE, num_agents=2,
                                    num_objects=4, points_per_agent=2000,
                                    seed=3))
    batch = frame_to_batch(frame, vcfg, max_cav=2)
    model = SecondIntermediate(mcfg, layer_nums=(1, 1),
                               num_filters=(32, 64),
                               num_upsample_filters=(32, 32))
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(batch)
    out = model.apply(variables, batch, train=False)
    S = mcfg.anchor_num * mcfg.num_class
    h, w = 48, 48
    assert out["cls_preds"].shape == (1, h, w, S * mcfg.num_class)
    assert out["reg_preds"].shape == (1, h, w, S * 7)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()

    # masking agent 1 must change predictions (fusion really reads it)
    b2 = dict(batch)
    b2["agent_mask"] = jnp.array([[True, False]])
    out2 = model.apply(variables, b2, train=False)
    assert not np.allclose(np.asarray(out["cls_preds"]),
                           np.asarray(out2["cls_preds"]))
