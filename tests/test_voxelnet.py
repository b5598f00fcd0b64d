"""VoxelNet family: SVFE masking, CML depth folding, RPN shapes, fusion."""

import jax
import jax.numpy as jnp
import numpy as np

from quantv2x_tpu.data.pipeline import frame_to_batch
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.data.voxelizer import VoxelCfg, voxelize
from quantv2x_tpu.models.voxelnet import (
    CML,
    SVFE,
    VoxelNet,
    VoxelNetCfg,
    VoxelNetIntermediate,
)

RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)
VCFG = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 0.4),
                max_points_per_voxel=8, max_voxels=1024)
CFG = VoxelNetCfg(voxel=VCFG, anchor_num=2, num_class=1)


def _voxels(seed=0, n=3000):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(np.concatenate(
        [rng.uniform(-19, 19, (n, 2)), rng.uniform(-2.9, 0.9, (n, 1)),
         rng.uniform(0, 1, (n, 1))], axis=1).astype(np.float32))
    return voxelize(pts, jnp.ones(n, bool), VCFG)


def test_svfe_padded_points_do_not_leak():
    vox = _voxels()
    svfe = SVFE(CFG)
    variables = svfe.init(jax.random.PRNGKey(0), vox["voxel_features"],
                          vox["voxel_coords"], vox["voxel_num_points"])
    out = svfe.apply(variables, vox["voxel_features"], vox["voxel_coords"],
                     vox["voxel_num_points"])
    assert out.shape == (VCFG.max_voxels, CFG.vfe_units[-1])
    # corrupting padded slots must not change the output
    vf = np.asarray(vox["voxel_features"]).copy()
    P = vf.shape[1]
    pad = np.arange(P)[None, :] >= np.asarray(vox["voxel_num_points"])[:, None]
    vf[pad] = 1e6
    out2 = svfe.apply(variables, jnp.asarray(vf), vox["voxel_coords"],
                      vox["voxel_num_points"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_cml_depth_folding():
    # D=10 -> conv1 s2 -> 5 -> VALID-z conv -> 3 -> conv3 s2 -> 2 => 128 ch
    x = jnp.ones((2, 10, 16, 16, 32))
    cml = CML(64)
    variables = cml.init(jax.random.PRNGKey(0), x)
    out = cml.apply(variables, x)
    assert out.shape == (2, 16, 16, 2 * 64)


def test_voxelnet_forward_shapes():
    vox = _voxels()
    model = VoxelNet(CFG)
    variables = jax.jit(
        lambda v: model.init(jax.random.PRNGKey(0), v))(vox)
    out = model.apply(variables, vox)
    ny, nx = 96, 96
    S = CFG.anchor_num * CFG.num_class
    assert out["cls_preds"].shape == (1, ny // 2, nx // 2, S)
    assert out["reg_preds"].shape == (1, ny // 2, nx // 2, 7 * S)
    assert out["dir_preds"].shape == (1, ny // 2, nx // 2,
                                      S * CFG.num_dir_bins)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()


def test_voxelnet_intermediate_agents_fuse():
    frame = make_frame(SyntheticCfg(lidar_range=RANGE, num_agents=2,
                                    num_objects=4, points_per_agent=3000,
                                    seed=1))
    batch = frame_to_batch(frame, VCFG, max_cav=2)
    model = VoxelNetIntermediate(CFG)
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b))(batch)
    out = model.apply(variables, batch)
    assert out["cls_preds"].shape[0] == 1
    assert np.isfinite(np.asarray(out["cls_preds"])).all()
    # masking out the collaborator must change the fused prediction
    batch2 = dict(batch)
    batch2["agent_mask"] = batch["agent_mask"].at[:, 1].set(False)
    out2 = model.apply(variables, batch2)
    assert not np.allclose(np.asarray(out["cls_preds"]),
                           np.asarray(out2["cls_preds"]), atol=1e-6)
