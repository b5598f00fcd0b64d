"""SPMD codebook serving: int codes on the ICI wire (parallel/serving.py).

Parity: the reference exchanges codebook codes between agents
(models/heter_pyramid_collab_codebook_mc_encdec.py:33-181); here the
exchange is a shard_map all-gather over the agent mesh axis, and these
tests pin (a) numerical equality with the single-process codebook model
and (b) that the collective actually carries int32 codes, not features.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.data.pipeline import frame_to_batch
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.data.voxelizer import VoxelCfg
from quantv2x_tpu.models.codebook import CodebookCompressor
from quantv2x_tpu.models.collab_model import ModelCfg, PyramidCollabModel
from quantv2x_tpu.parallel.serving import (
    build_spmd_codebook_server,
    serve_stream,
    split_batch,
    wire_report,
)
from quantv2x_tpu.parallel.sharding import make_mesh

LIDAR_RANGE = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)


@pytest.fixture(scope="module")
def setup():
    vox = VoxelCfg(lidar_range=LIDAR_RANGE, voxel_size=(0.4, 0.4, 4.0),
                   max_points_per_voxel=8, max_voxels=1024)
    cfg = ModelCfg(voxel=vox, max_cav=2, pyramid_layers=(1, 1, 1))
    comp = CodebookCompressor(channel=cfg.backbone_filters[-1])
    model = PyramidCollabModel(cfg, compressor=comp)
    batch = frame_to_batch(
        make_frame(SyntheticCfg(lidar_range=LIDAR_RANGE, num_agents=2,
                                num_objects=4, points_per_agent=3000,
                                seed=11)),
        vox, max_cav=2)
    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.PRNGKey(0),
             "gumbel": jax.random.PRNGKey(1)}, b, train=False)
    )(batch)
    return model, variables, batch


def test_spmd_matches_single_process(setup):
    model, variables, batch = setup
    mesh = make_mesh(n_data=1, n_agent=2)
    step = build_spmd_codebook_server(model, mesh)
    out_spmd = jax.block_until_ready(step(variables, batch))
    out_ref = model.apply(variables, batch, train=False)
    for key in ("cls_preds", "reg_preds", "dir_preds"):
        np.testing.assert_allclose(
            np.asarray(out_spmd[key], np.float32),
            np.asarray(out_ref[key], np.float32), atol=2e-2, rtol=1e-2)


def test_wire_carries_int_codes_not_features(setup):
    model, variables, batch = setup
    mesh = make_mesh(n_data=1, n_agent=2)
    step = build_spmd_codebook_server(model, mesh)
    hlo = jax.jit(step).lower(variables, batch).compile().as_text()
    gathers = [ln for ln in hlo.splitlines() if "all-gather" in ln]
    assert gathers, "no all-gather in compiled SPMD program"
    # every cross-chip gather moves uint8 codes (K=256 fits one byte);
    # neither features (bf16/f32) nor int32 padding cross the wire
    assert any("u8[" in ln for ln in gathers), gathers
    assert not any(("bf16[" in ln or "f32[" in ln or "s32[" in ln)
                   for ln in gathers), gathers


def test_wire_report_compression():
    comp = CodebookCompressor(channel=64)  # M=2, K=256 x 3 levels defaults
    rep = wire_report(comp, 24, 24)
    assert rep["wire_bits_per_bev_pixel"] == 48
    # at K=256 the uint8 gather lanes carry exactly the entropy bits
    assert rep["gather_bits_per_bev_pixel"] == 48
    assert rep["compression_vs_fp32_x"] == pytest.approx(42.7, abs=0.1)

    # heterogeneous level sizes: bits sum per level (codebook
    # bits_per_vector semantics), not levels * log2(max)
    het = CodebookCompressor(channel=64, dict_sizes=(256, 64, 16))
    rep2 = wire_report(het, 24, 24)
    assert rep2["wire_bits_per_bev_pixel"] == 2 * (8 + 6 + 4)
    assert rep2["gather_bits_per_bev_pixel"] == 3 * 2 * 8


def test_serve_stream_continuous_batching(setup):
    model, variables, batch = setup
    mesh = make_mesh(n_data=1, n_agent=2)
    step = build_spmd_codebook_server(model, mesh)
    batches = []
    for s in (21, 22, 23):
        vox = model.cfg.voxel
        batches.append(frame_to_batch(
            make_frame(SyntheticCfg(lidar_range=LIDAR_RANGE, num_agents=2,
                                    num_objects=4, points_per_agent=3000,
                                    seed=s)), vox, max_cav=2))
    outs, fps = serve_stream(step, variables, batches, warmup=1)
    assert len(outs) == 3
    for o in outs:
        assert np.isfinite(np.asarray(o["cls_preds"], np.float32)).all()


def test_spmd_int8_engine_composes(setup):
    """North-star config #4: INT8 encoder + codebook comms + INT8 fusion.
    The int8 interceptor inside the shard_map step must reproduce the
    single-process int8_apply exactly (same math, same tables)."""
    from quantv2x_tpu.quant.int8_engine import (
        build_int8_engine, make_int8_interceptor,
    )

    model, variables, batch = setup
    tables, int8_apply = build_int8_engine(model, variables, [batch])
    assert tables, "no int8 units built"
    mesh = make_mesh(n_data=1, n_agent=2)
    step = build_spmd_codebook_server(
        model, mesh, interceptor=make_int8_interceptor(tables))
    out_spmd = jax.block_until_ready(step(variables, batch))
    out_ref = int8_apply(variables, batch)
    for key in ("cls_preds", "reg_preds", "dir_preds"):
        np.testing.assert_allclose(
            np.asarray(out_spmd[key], np.float32),
            np.asarray(out_ref[key], np.float32), atol=2e-2, rtol=1e-2)


def test_split_batch_partition(setup):
    _, _, batch = setup
    agent_in, shared_in = split_batch(batch)
    assert set(agent_in) == {"voxel_features", "voxel_coords",
                             "voxel_num_points", "voxel_mask"}
    assert "pairwise_t_matrix" in shared_in and "agent_mask" in shared_in
