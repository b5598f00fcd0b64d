import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.models.lss_encoder import (
    LSSCfg,
    LSSEncoder,
    create_frustum,
    frustum_to_ego,
    voxel_pool,
)

CFG = LSSCfg(
    lidar_range=(-25.6, -25.6, -3.0, 25.6, 25.6, 1.0),
    bev_resolution=0.8,
    image_size=(64, 96),
    depth_bins=(1.0, 25.0, 1.0),
    out_channels=16,
)


def test_frustum_shape_and_content():
    f = np.asarray(create_frustum(CFG))
    D = CFG.num_depth
    fH, fW = CFG.feat_hw
    assert f.shape == (D, fH, fW, 3)
    assert f[..., 2].min() == 1.0 and f[..., 2].max() == 24.0
    assert f[..., 0].max() == CFG.image_size[1] - 1


def test_geometry_principal_ray():
    """The principal-point pixel at depth d maps to d metres along the
    camera axis in the ego frame."""
    intr = jnp.array([[50.0, 0, 48.0], [0, 50.0, 32.0], [0, 0, 1.0]])
    rot = jnp.eye(3)            # camera axes = ego axes (z forward)
    trans = jnp.array([1.0, 2.0, 0.5])
    f = create_frustum(CFG)
    pts = np.asarray(frustum_to_ego(f, intr, rot, trans))
    # pixel nearest to principal point (48, 32):
    fH, fW = CFG.feat_hw
    u = np.abs(np.asarray(f[0, :, :, 0]) - 48.0)
    v = np.abs(np.asarray(f[0, :, :, 1]) - 32.0)
    iy, ix = np.unravel_index((u + v).argmin(), u.shape)
    d_idx = 5  # depth = 6.0
    p = pts[d_idx, iy, ix]
    assert p[2] == pytest.approx(0.5 + 6.0, abs=0.7)  # z = trans + depth
    assert p[0] == pytest.approx(1.0, abs=0.7)


def test_voxel_pool_places_mass():
    D, (fH, fW) = CFG.num_depth, CFG.feat_hw
    pts = jnp.zeros((D, fH, fW, 3)).at[..., 0].set(5.0).at[..., 1].set(-3.0)
    vol = jnp.ones((D, fH, fW, 4))
    bev = np.asarray(voxel_pool(pts, vol, CFG))
    gy = int((-3.0 + 25.6) / 0.8)
    gx = int((5.0 + 25.6) / 0.8)
    assert bev[gy, gx, 0] == D * fH * fW
    assert bev.sum() == D * fH * fW * 4


def test_voxel_pool_drops_out_of_range():
    D, (fH, fW) = CFG.num_depth, CFG.feat_hw
    pts = jnp.full((D, fH, fW, 3), 1000.0)
    vol = jnp.ones((D, fH, fW, 4))
    bev = np.asarray(voxel_pool(pts, vol, CFG))
    assert bev.sum() == 0


def test_lss_encoder_end_to_end():
    model = LSSEncoder(CFG)
    n_cam = 2
    imgs = jax.random.normal(jax.random.PRNGKey(0),
                             (n_cam, *CFG.image_size, 3))
    intr = jnp.broadcast_to(
        jnp.array([[50.0, 0, 48.0], [0, 50.0, 32.0], [0, 0, 1.0]]),
        (n_cam, 3, 3),
    )
    rots = jnp.broadcast_to(jnp.eye(3), (n_cam, 3, 3))
    trans = jnp.zeros((n_cam, 3))
    variables = jax.jit(
        lambda i: model.init(jax.random.PRNGKey(1), i, intr, rots, trans)
    )(imgs)
    out = model.apply(variables, imgs, intr, rots, trans)
    H, W = CFG.bev_size
    assert out.shape == (H, W, CFG.out_channels)
    assert np.isfinite(np.asarray(out)).all()
