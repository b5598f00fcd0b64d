"""Serialized engine artifacts (tools/engine_export.py) — the .plan analogue.

Parity: build_trt{,_fp32,_int8}.py write serialized engines that a serving
process loads without model code; here jax.export StableHLO artifacts play
that role, with params baked in as constants.
"""

import numpy as np
import pytest

import jax

from quantv2x_tpu.data.pipeline import frame_to_batch
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.data.voxelizer import VoxelCfg
from quantv2x_tpu.models.collab_model import ModelCfg, PyramidCollabModel
from quantv2x_tpu.tools.engine_export import export_engine, load_engine

LR = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)


@pytest.fixture(scope="module")
def setup():
    vox = VoxelCfg(lidar_range=LR, voxel_size=(0.4, 0.4, 4.0),
                   max_points_per_voxel=8, max_voxels=1024)
    cfg = ModelCfg(voxel=vox, max_cav=2, pyramid_layers=(1, 1, 1))
    model = PyramidCollabModel(cfg)
    batches = [
        frame_to_batch(
            make_frame(SyntheticCfg(lidar_range=LR, num_agents=2,
                                    num_objects=4, points_per_agent=3000,
                                    seed=s)), vox, max_cav=2)
        for s in range(2)
    ]
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(batches[0])
    return model, variables, batches


def test_export_load_roundtrip(setup, tmp_path):
    model, variables, batches = setup

    def apply_fn(v, b):
        return model.apply(v, b, train=False)

    path = str(tmp_path / "engine.qv2x")
    size = export_engine(apply_fn, variables, batches[0], path,
                         meta={"engine": "stock"})
    assert size > 1000
    step = load_engine(path)
    assert step.meta["engine"] == "stock"
    # the loaded engine must match the live model on UNSEEN input, without
    # access to model code or variables
    out = step(batches[1])
    ref = model.apply(variables, batches[1], train=False)
    np.testing.assert_allclose(np.asarray(out["cls_preds"], np.float32),
                               np.asarray(ref["cls_preds"], np.float32),
                               atol=1e-5)


def test_export_int8_engine(setup, tmp_path):
    from quantv2x_tpu.quant.int8_engine import build_int8_engine

    model, variables, batches = setup
    tables, int8_apply = build_int8_engine(model, variables, batches[:1])
    path = str(tmp_path / "engine_int8.qv2x")
    export_engine(int8_apply, variables, batches[0], path,
                  meta={"engine": "int8"})
    step = load_engine(path)
    out = step(batches[1])
    ref = int8_apply(variables, batches[1])
    # int8 code boundaries can flip by 1 LSB between compilations (the
    # deserialized program fuses differently than the live jit — live
    # eager vs live jit already differ at ~2e-3), so compare at LSB scale
    a = np.asarray(out["cls_preds"], np.float32)
    b = np.asarray(ref["cls_preds"], np.float32)
    np.testing.assert_allclose(a, b, atol=2e-2)
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.9999
