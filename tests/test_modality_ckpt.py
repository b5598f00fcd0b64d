import json

import jax.numpy as jnp
import numpy as np

from quantv2x_tpu.data.modality import ModalityAdaptor
from quantv2x_tpu.tools.ckpt_tools import merge_subtrees, report_mismatch


def test_adaptor_reorder_and_filter(tmp_path):
    assign = {"scene_a": {"1": "m3", "2": "m4", "-1": "m1"}}
    p = tmp_path / "assign.json"
    p.write_text(json.dumps(assign))
    ad = ModalityAdaptor(str(p), ego_modality="m1",
                         mapping_dict={"m1": "none", "m2": "none",
                                       "m3": "m1", "m4": "m1"},
                         model_modalities=["m1", "m2"])
    # m1-assigned infra is dropped (mapping none); m3/m4 map to m1
    order = ad.reorder_cav_list(["1", "2", "-1"], "scene_a")
    assert order == ["1", "2"]
    idx = ad.modality_indices(order, "scene_a")
    assert idx == [0, 0]


def test_merge_and_report():
    tgt = {"backbone": {"k": jnp.ones(3)}, "adapter": {"k": jnp.zeros(2)}}
    src = {"backbone": {"k": jnp.ones(3) * 5}, "adapter": {"k": jnp.ones(2)},
           "extra": {"x": jnp.ones(1)}}
    rep = report_mismatch(tgt, src)
    assert rep["matched"] == 2 and rep["extra_in_source"] == ["extra/x"]
    merged = merge_subtrees(tgt, src, ["adapter"])
    np.testing.assert_allclose(np.asarray(merged["adapter"]["k"]), 1.0)
    np.testing.assert_allclose(np.asarray(merged["backbone"]["k"]), 1.0)


def test_graft_by_path_legacy_alias():
    """Old checkpoints stored grouped-conv kernels as conv/kernel; the
    graft fallback maps them onto conv_kernel_grouped and reports (not
    fails on) missing leaves — parity train_utils.check_missing_key."""
    from quantv2x_tpu.train.checkpoint import _graft_by_path

    target = {
        "params": {
            "block": {"conv_kernel_grouped": jnp.zeros((3, 3, 4, 8)),
                      "bn": {"scale": jnp.zeros(8)}},
            "new_head": {"kernel": jnp.full((2, 2), 7.0)},
        },
        "step": jnp.zeros((), jnp.int32),
    }
    raw = {
        "params": {
            "block": {"conv": {"kernel": jnp.ones((3, 3, 4, 8))},
                      "bn": {"scale": jnp.ones(8) * 2}},
            "stale": {"kernel": jnp.ones(5)},
        },
        "step": jnp.asarray(42, jnp.int32),
    }
    out = _graft_by_path(raw, target)
    np.testing.assert_allclose(np.asarray(
        out["params"]["block"]["conv_kernel_grouped"]), 1.0)  # aliased
    np.testing.assert_allclose(np.asarray(
        out["params"]["block"]["bn"]["scale"]), 2.0)          # direct
    np.testing.assert_allclose(np.asarray(
        out["params"]["new_head"]["kernel"]), 7.0)            # kept init
    assert int(out["step"]) == 42


def test_restore_falls_back_to_graft(tmp_path):
    """A checkpoint whose tree drifted from the live model still restores."""
    import orbax.checkpoint as ocp

    from quantv2x_tpu.train.checkpoint import restore_checkpoint

    old_state = {"params": {"block": {"conv": {"kernel": jnp.ones((2, 2))}}}}
    path = str(tmp_path / "run" / "epoch_3")
    with ocp.StandardCheckpointer() as c:
        c.save(path, old_state)
    new_state = {"params": {"block": {"conv_kernel_grouped":
                                      jnp.zeros((2, 2))}}}
    out, ep = restore_checkpoint(str(tmp_path / "run"), new_state)
    assert ep == 3
    np.testing.assert_allclose(
        np.asarray(out["params"]["block"]["conv_kernel_grouped"]), 1.0)
