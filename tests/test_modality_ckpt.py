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
