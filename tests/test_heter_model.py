import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.data.pipeline import frame_to_batch
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.data.voxelizer import VoxelCfg
from quantv2x_tpu.models.collab_model import ModelCfg
from quantv2x_tpu.models.heter_model import HeterCollabModel, ModalityCfg

RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)
VOXEL = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 4.0),
                 max_points_per_voxel=8, max_voxels=1024)
MODEL = ModelCfg(voxel=VOXEL, max_cav=2)


@pytest.fixture(scope="module")
def batch():
    frame = make_frame(SyntheticCfg(lidar_range=RANGE, num_agents=2,
                                    num_objects=4, points_per_agent=3000,
                                    seed=5))
    b = dict(frame_to_batch(frame, VOXEL, max_cav=2))
    b["agent_modality"] = jnp.array([[0, 1]])  # agent0 -> m1, agent1 -> m2
    return b


def test_two_lidar_modalities_routed(batch):
    model = HeterCollabModel(
        MODEL,
        modalities=(
            ModalityCfg("m1", "point_pillar"),
            ModalityCfg("m2", "point_pillar", aligner="conv"),
        ),
    )
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(batch)
    # both branches own parameters
    assert "vfe_m1" in variables["params"] and "vfe_m2" in variables["params"]
    assert "aligner_m2" in variables["params"]
    out = model.apply(variables, batch, train=False)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()

    # changing m2 branch weights must only affect predictions through agent 1
    p2 = jax.tree.map(lambda x: x, variables["params"])
    p2["vfe_m2"] = jax.tree.map(lambda x: x * 0.0, p2["vfe_m2"])
    out2 = model.apply({**variables, "params": p2}, batch, train=False)
    assert not np.allclose(np.asarray(out["cls_preds"]),
                           np.asarray(out2["cls_preds"]))

    # changing m2 weights with all agents on m1 must change nothing
    b_all_m1 = dict(batch, agent_modality=jnp.array([[0, 0]]))
    a = model.apply(variables, b_all_m1, train=False)
    b_ = model.apply({**variables, "params": p2}, b_all_m1, train=False)
    np.testing.assert_allclose(np.asarray(a["cls_preds"]),
                               np.asarray(b_["cls_preds"]), atol=1e-6)


def test_single_modality_fast_path(batch):
    model = HeterCollabModel(MODEL)
    b = dict(batch)
    b.pop("agent_modality")
    variables = jax.jit(
        lambda bb: model.init(jax.random.PRNGKey(0), bb, train=False)
    )(b)
    out = model.apply(variables, b, train=False)
    h, w = 48, 48
    assert out["cls_preds"].shape == (1, h, w, 18)


def test_convnext_aligner_variant(batch):
    model = HeterCollabModel(
        MODEL,
        modalities=(
            ModalityCfg("m1", "point_pillar", aligner="convnext",
                        aligner_depth=1),
            ModalityCfg("m2", "point_pillar"),
        ),
    )
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(batch)
    # depthwise 7x7 kernel is the ConvNeXt signature
    dw = variables["params"]["aligner_m1"]["block0"]["dw"]["kernel"]
    assert dw.shape[:2] == (7, 7)
    out = model.apply(variables, batch, train=False)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()


def test_camera_modality_routed():
    """Lidar + LSS camera agents fuse through the shared pyramid."""
    frame = make_frame(SyntheticCfg(lidar_range=RANGE, num_agents=2,
                                    num_objects=4, points_per_agent=3000,
                                    num_cameras=2, image_size=(32, 48),
                                    seed=7))
    assert frame["camera_imgs"].shape == (2, 2, 32, 48, 3)
    assert frame["camera_imgs"].max() > 0          # points really splat
    b = dict(frame_to_batch(frame, VOXEL, max_cav=2))
    b["agent_modality"] = jnp.array([[0, 1]])      # agent1 is the camera
    assert b["camera_imgs"].shape == (1, 2, 2, 32, 48, 3)

    model = HeterCollabModel(
        MODEL,
        modalities=(
            ModalityCfg("m1", "point_pillar"),
            ModalityCfg("m4", "lift_splat_shoot", image_size=(32, 48),
                        depth_bins=(1.0, 20.0, 1.0)),
        ),
    )
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(b)
    assert "lss_m4" in variables["params"]
    out = model.apply(variables, b, train=False)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()

    # zeroing the camera branch weights must change predictions (the
    # camera agent really contributes through fusion)
    p2 = jax.tree.map(lambda x: x, variables["params"])
    p2["lss_m4"] = jax.tree.map(lambda x: x * 0.0, p2["lss_m4"])
    out2 = model.apply({**variables, "params": p2}, b, train=False)
    assert not np.allclose(np.asarray(out["cls_preds"]),
                           np.asarray(out2["cls_preds"]))


def test_heter_single_scale_fusion_method(batch):
    """heter_model_baseline parity: fusion_method selects a single-scale
    fusion from the registry instead of the pyramid."""
    model = HeterCollabModel(
        MODEL,
        modalities=(ModalityCfg("m1", "point_pillar"),
                    ModalityCfg("m2", "point_pillar")),
        fusion_method="att",
    )
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(batch)
    assert not any("pyramid" in k for k in variables["params"])
    out = model.apply(variables, batch, train=False)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()
    assert out["occ_maps"] == []


def test_compacted_encode_matches_whereselect_oracle(batch):
    """encode_agents (compacted gather->encode->scatter) must equal the
    run-every-branch-and-select oracle slot for slot (eval mode)."""
    model = HeterCollabModel(
        MODEL,
        modalities=(
            ModalityCfg("m1", "point_pillar"),
            ModalityCfg("m2", "point_pillar", aligner="conv"),
        ),
    )
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(batch)

    def oracle(mdl, b):
        vf = b["voxel_features"]
        B, L = vf.shape[:2]
        mod_ids = b["agent_modality"]
        out = None
        for mi, mod in enumerate(mdl.modalities):
            feat = mdl._branch_features(mod, b, False)
            feat = feat.reshape(B, L, *feat.shape[1:])
            sel = (mod_ids == mi)[:, :, None, None, None]
            out = jnp.where(sel, feat, 0.0 if out is None else out)
        return out

    got = model.apply(variables, batch, method="encode_agents")
    want = model.apply(variables, batch, method=oracle)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=1e-6, rtol=1e-6)


def test_capacity_budget_compacts_and_drops(batch):
    """capacity=1 per modality: same outputs when counts fit the budget;
    an over-budget agent drops to zeros (reference use_cav-cap analogue)."""
    model = HeterCollabModel(
        MODEL,
        modalities=(
            ModalityCfg("m1", "point_pillar", capacity=1),
            ModalityCfg("m2", "point_pillar", capacity=1),
        ),
    )
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(batch)
    full = HeterCollabModel(
        MODEL,
        modalities=(ModalityCfg("m1", "point_pillar"),
                    ModalityCfg("m2", "point_pillar")),
    )
    # one agent of each modality: budget fits, outputs identical
    got = model.apply(variables, batch, method="encode_agents")
    want = full.apply(variables, batch, method="encode_agents")
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=1e-6)
    # both agents on m1 with budget 1: slot 0 kept, slot 1 zeroed
    b2 = dict(batch, agent_modality=jnp.array([[0, 0]]))
    got2 = np.asarray(
        model.apply(variables, b2, method="encode_agents"), np.float32)
    want2 = np.asarray(
        full.apply(variables, b2, method="encode_agents"), np.float32)
    np.testing.assert_allclose(got2[:, 0], want2[:, 0], atol=1e-6)
    assert np.all(got2[:, 1] == 0.0)
