"""Where2comm communication gate: request maps, multi-round, comm rate.

Parity: fuse_modules/where2comm_attn.py:174-341 +
comm_modules/where2comm.py:9-79.
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from quantv2x_tpu.config.hypes import build_hypes, load_raw
from quantv2x_tpu.data.pipeline import frame_to_batch
from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
from quantv2x_tpu.models.registry import create_model

RANGE = [-19.2, -19.2, -3.0, 19.2, 19.2, 1.0]


@pytest.fixture(scope="module")
def setup():
    raw = load_raw("configs/v2x_real/lidar_where2comm.yaml")
    raw["cav_lidar_range"] = RANGE
    raw["preprocess"]["args"]["max_voxel_train"] = 512
    raw["postprocess"]["gt_range"] = RANGE
    hypes = build_hypes(raw)
    model, contract = create_model(hypes, max_cav=2)
    assert contract == "collab"
    f = make_frame(SyntheticCfg(lidar_range=hypes.voxel.lidar_range,
                                num_agents=2, num_objects=5,
                                points_per_agent=3000, seed=1))
    b = frame_to_batch(f, hypes.voxel, max_cav=2)
    v = jax.jit(lambda bb: model.init(jax.random.PRNGKey(0), bb,
                                      train=False))(b)
    return model, v, b


def test_config_builds_gate(setup):
    model, v, b = setup
    assert model.comm is not None
    assert model.comm.request and model.comm.threshold == 0.01


def test_forward_reports_rate_and_threshold_monotone(setup):
    model, v, b = setup
    out = model.apply(v, b, train=False)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()
    r_mid = float(out["comm_rate"])
    r_hi = float(model.clone(
        comm=dataclasses.replace(model.comm, threshold=0.9),
        parent=None).apply(v, b, train=False)["comm_rate"])
    r_lo = float(model.clone(
        comm=dataclasses.replace(model.comm, threshold=0.0),
        parent=None).apply(v, b, train=False)["comm_rate"])
    assert r_hi <= r_mid <= r_lo
    assert r_lo == 1.0 and r_hi == 0.0


def test_masking_gates_collaborator_features(setup):
    """At threshold 0.9 nothing transmits: zeroing the collaborator's
    input must not change predictions (ego-only); at threshold 0 it must."""
    model, v, b = setup
    m_hi = model.clone(comm=dataclasses.replace(model.comm, threshold=0.9),
                       parent=None)
    b_zero = dict(b, voxel_features=jnp.asarray(b["voxel_features"])
                  .at[:, 1].set(0.0))
    a = m_hi.apply(v, b, train=False)["cls_preds"]
    bb = m_hi.apply(v, b_zero, train=False)["cls_preds"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-5)
    m_lo = model.clone(comm=dataclasses.replace(model.comm, threshold=0.0),
                       parent=None)
    a2 = m_lo.apply(v, b, train=False)["cls_preds"]
    b2 = m_lo.apply(v, b_zero, train=False)["cls_preds"]
    assert not np.allclose(np.asarray(a2), np.asarray(b2), atol=1e-5)


def test_multi_round_compiles(setup):
    model, v, b = setup
    m2 = model.clone(comm=dataclasses.replace(model.comm, rounds=2),
                     parent=None)
    v2 = jax.jit(lambda bb: m2.init(jax.random.PRNGKey(0), bb,
                                    train=False))(b)
    out = m2.apply(v2, b, train=False)
    assert np.isfinite(np.asarray(out["cls_preds"])).all()
    assert 0.0 <= float(out["comm_rate"]) <= 1.0