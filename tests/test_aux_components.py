import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.data.augment import augment_frame
from quantv2x_tpu.data.noise_sim import NoiseCfg, add_pose_noise, drop_agents
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.models.naive_compress import NaiveCompressor

RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)


@pytest.fixture(scope="module")
def frame():
    return make_frame(SyntheticCfg(lidar_range=RANGE, num_agents=3,
                                   num_objects=4, points_per_agent=2000,
                                   seed=0))


def test_naive_compressor_roundtrip_shape():
    comp = NaiveCompressor(channels=16, compress_ratio=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 8, 8, 16))
    variables = comp.init(jax.random.PRNGKey(1), x)
    y, aux = comp.apply(variables, x)
    assert y.shape == x.shape
    # bottleneck is real: encoder output channel count is C/ratio
    assert variables["params"]["enc"]["conv"]["kernel"].shape[-1] == 4


def test_augment_keeps_consistency(frame):
    rng = np.random.default_rng(0)
    aug = augment_frame(frame, rng)
    assert aug["agent_points"].shape == frame["agent_points"].shape
    assert aug["gt_mask"].sum() == frame["gt_mask"].sum()
    # rotation+scale changed GT positions
    assert not np.allclose(aug["gt_boxes"][aug["gt_mask"]],
                           frame["gt_boxes"][frame["gt_mask"]])


def test_augment_scene_matches_gt_transform(frame):
    """The labels' transform must equal the INPUT scene's transform in the
    ego frame — the bug class where GT rotates but the model input doesn't
    (poses alone can't rotate the scene: pairwise transforms are invariant
    to global rigid motions)."""
    from quantv2x_tpu.data.dataset import _pose_to_T

    seed = 3
    aug = augment_frame(frame, np.random.default_rng(seed),
                        flip=(), scale_range=(1.0, 1.0))
    # replay the rng to recover the rotation angle the augmenter drew
    ang = np.random.default_rng(seed).uniform(-0.785, 0.785)
    c, s = np.cos(ang), np.sin(ang)
    M = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])

    T_ego_inv = np.linalg.inv(_pose_to_T(frame["agent_poses"][0]))
    for i in range(int(frame["agent_mask"].sum())):
        # poses must be untouched (pairwise transforms stay valid)
        np.testing.assert_allclose(aug["agent_poses"][i],
                                   frame["agent_poses"][i])
        A = T_ego_inv @ _pose_to_T(frame["agent_poses"][i])
        m = frame["agent_points_mask"][i]
        to_ego = lambda pts: pts[m][:, :3] @ A[:3, :3].T + A[:3, 3]
        want = to_ego(frame["agent_points"][i]) @ M.T
        got = to_ego(aug["agent_points"][i])
        np.testing.assert_allclose(got, want, atol=1e-3)
    # and GT moved by the same M
    gm = frame["gt_mask"]
    np.testing.assert_allclose(aug["gt_boxes"][gm][:, :2],
                               frame["gt_boxes"][gm][:, :2] @ M[:2, :2].T,
                               atol=1e-4)
    np.testing.assert_allclose(aug["gt_boxes"][gm][:, 6],
                               frame["gt_boxes"][gm][:, 6] + ang, atol=1e-5)


def test_pose_noise_only_hits_collaborators(frame):
    rng = np.random.default_rng(1)
    noisy = add_pose_noise(frame, NoiseCfg(pos_std=0.5, rot_std=2.0), rng)
    np.testing.assert_array_equal(noisy["agent_poses"][0],
                                  frame["agent_poses"][0])
    assert not np.allclose(noisy["agent_poses"][1], frame["agent_poses"][1])


def test_drop_agents_caps_collaborators(frame):
    capped = drop_agents(frame, use_cav=2)
    assert capped["agent_mask"].sum() == 2
    assert capped["agent_mask"][0]


def test_codebook_stage2_freeze_mask():
    """optax.masked freeze: only compressor params receive updates."""
    import optax
    from quantv2x_tpu.train.trainer import OptimCfg, make_optimizer, path_mask

    params = {
        "backbone": {"kernel": jnp.ones((4, 4))},
        "compressor": {"codebook": jnp.ones((8,))},
    }
    mask = path_mask(params, lambda p: p.startswith("compressor"))
    tx = make_optimizer(OptimCfg(lr=0.1, weight_decay=0.01), mask)
    opt = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(new["backbone"]["kernel"]),
                                  np.asarray(params["backbone"]["kernel"]))
    assert not np.allclose(np.asarray(new["compressor"]["codebook"]),
                           np.asarray(params["compressor"]["codebook"]))
