"""Generic PTQ engine over the wider model zoo.

The reference needs a hand-written reconstruction driver per family
(quant/v2xvit_recon.py, second_recon.py, lss_recon.py — each knows one
block signature). Our functional engine quantizes any flax model whose
compute flows through the standard unit/raw layers; these tests pin that
claim on the V2X-ViT transformer fusion, the SECOND (dense Conv3D)
trunk, and the LSS camera encoder.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.data.pipeline import frame_to_batch
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.data.voxelizer import VoxelCfg
from quantv2x_tpu.models.collab_model import ModelCfg
from quantv2x_tpu.quant.ptq import ptq_calibrate

RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)


def _corr(a, b):
    return np.corrcoef(np.asarray(a, np.float32).ravel(),
                       np.asarray(b, np.float32).ravel())[0, 1]


def _batches(vcfg, n=3, **kw):
    return [
        frame_to_batch(
            make_frame(SyntheticCfg(lidar_range=RANGE, num_agents=2,
                                    num_objects=4, points_per_agent=2500,
                                    seed=s)), vcfg, max_cav=2)
        for s in range(n)
    ]


def _check_ptq(model, variables, batches, key="cls_preds", thresh=0.98):
    qvars, act_scales, qapply = ptq_calibrate(model, variables, batches[:2])
    fp = model.apply(variables, batches[2], train=False)
    q = qapply(qvars, act_scales, batches[2])
    c = _corr(fp[key], q[key])
    assert c > thresh, f"W8A8 corr {c:.4f} below {thresh}"
    return act_scales


def test_ptq_v2xvit_fusion():
    """Transformer fusion (reference v2xvit_recon.py): attention QKV/proj
    Dense layers are raw units — observed and fake-quanted like convs."""
    from quantv2x_tpu.models.baseline_model import BaselineFusionModel

    vcfg = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 4.0),
                    max_points_per_voxel=8, max_voxels=1024)
    model = BaselineFusionModel(ModelCfg(voxel=vcfg, max_cav=2),
                                fusion_method="v2xvit")
    batches = _batches(vcfg)
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(batches[0])
    scales = _check_ptq(model, variables, batches)
    # the transformer's Dense layers must actually be in the observed set
    assert any("fusion" in p for p in scales), sorted(scales)[:8]


def test_ptq_second_intermediate():
    """Dense-grid SECOND trunk (reference second_recon.py)."""
    from quantv2x_tpu.models.second_encoder import SecondIntermediate

    vcfg = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 0.5),
                    max_points_per_voxel=5, max_voxels=1024)
    model = SecondIntermediate(ModelCfg(voxel=vcfg, max_cav=2),
                               layer_nums=(1, 1), num_filters=(32, 64),
                               num_upsample_filters=(32, 32))
    batches = _batches(vcfg)
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(batches[0])
    # deeper Conv3D stack accumulates a little more per-tensor act error
    _check_ptq(model, variables, batches, thresh=0.95)


class _LSSHarness(nn.Module):
    """Adapts LSSEncoder's multi-arg signature to the batch-dict contract
    the PTQ engine drives (reference lss_recon.py plays the same role)."""
    cfg: object

    def setup(self):
        from quantv2x_tpu.models.lss_encoder import LSSEncoder
        self.enc = LSSEncoder(self.cfg)

    def __call__(self, batch, train: bool = False):
        bev = self.enc(batch["imgs"], batch["intrins"], batch["rots"],
                       batch["trans"])
        return {"cls_preds": bev}


def test_ptq_lss_camera():
    from quantv2x_tpu.models.lss_encoder import LSSCfg

    cfg = LSSCfg(lidar_range=(-25.6, -25.6, -3.0, 25.6, 25.6, 1.0),
                 bev_resolution=0.8, image_size=(64, 96),
                 depth_bins=(1.0, 25.0, 1.0), out_channels=16)
    model = _LSSHarness(cfg)
    n_cam = 2
    intr = jnp.broadcast_to(
        jnp.array([[50.0, 0, 48.0], [0, 50.0, 32.0], [0, 0, 1.0]]),
        (n_cam, 3, 3))
    # camera optical axis along ego +x (identity would aim at +z, where the
    # 1 m-tall BEV volume clips every splat to zero)
    fwd = jnp.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    batches = [
        {"imgs": jax.random.normal(jax.random.PRNGKey(s),
                                   (n_cam, *cfg.image_size, 3)),
         "intrins": intr,
         "rots": jnp.broadcast_to(fwd, (n_cam, 3, 3)),
         "trans": jnp.zeros((n_cam, 3))}
        for s in range(3)
    ]
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(batches[0])
    # random-noise images on a random-init net produce an ~88%-sparse BEV;
    # per-tensor act quant on that worst case still tracks FP
    _check_ptq(model, variables, batches, thresh=0.9)


def test_adaround_sequential_on_multicall_units():
    """Sequential AdaRound on a model whose encoder units run once per
    agent (SECOND loops B*L): FP-output capture must stay aligned with
    the first-call input capture instead of pairing inputs with outputs
    of unrelated agent calls."""
    from quantv2x_tpu.models.second_encoder import SecondIntermediate
    from quantv2x_tpu.quant.adaround import ReconCfg, adaround_reconstruct

    vcfg = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 0.5),
                    max_points_per_voxel=5, max_voxels=512)
    model = SecondIntermediate(ModelCfg(voxel=vcfg, max_cav=2),
                               layer_nums=(1,), num_filters=(32,),
                               num_upsample_filters=(32,))
    batches = _batches(vcfg)
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(batches[0])
    qvars, act_scales, qapply = adaround_reconstruct(
        model, variables, batches[:2],
        rcfg=ReconCfg(iters=10, sequential=True))
    fp = model.apply(variables, batches[2], train=False)
    q = qapply(qvars, act_scales, batches[2])
    assert _corr(fp["cls_preds"], q["cls_preds"]) > 0.9
