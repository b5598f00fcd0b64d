"""Every shipped experiment yaml must load + resolve to a model.

Parity: the reference ships a hypes_yaml/ tree (v2x_real/LiDAROnly,
Codebook, Naive_Compressor, HEAL, STAMP, GenComm, MoreBaselines ...)
consumed by yaml_utils.load_yaml + train_utils.create_model. Here the
same contract is configs/**/*.yaml -> load_hypes -> registry.create_model.
"""

import glob
import os

import pytest

from quantv2x_tpu.config.hypes import _deep_merge, load_hypes, load_raw
from quantv2x_tpu.models.registry import create_model

ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_YAMLS = sorted(glob.glob(os.path.join(ROOT, "**", "*.yaml"),
                             recursive=True))


@pytest.mark.parametrize("path", ALL_YAMLS,
                         ids=[os.path.relpath(p, ROOT) for p in ALL_YAMLS])
def test_config_loads_and_resolves(path):
    hypes = load_hypes(path)
    model, contract = create_model(hypes)
    assert contract in ("collab", "voxels", "points", "early", "late")
    assert hypes.name


def test_extends_chain_is_recursive():
    # stage yamls extend v2xreal_codebook.yaml which itself extends the
    # base lidar yaml — all three levels must land in raw.
    raw = load_raw(os.path.join(ROOT, "v2x_real",
                                "codebook_pyramid_stage2.yaml"))
    assert raw["train_stage"] == 2            # leaf
    assert "codebook" in raw                  # middle
    assert "cav_lidar_range" in raw           # root


def test_deep_merge_preserves_sibling_keys():
    base = {"model": {"args": {"a": 1, "b": 2}}, "x": 1}
    over = {"model": {"args": {"b": 3}}}
    out = _deep_merge(base, over)
    assert out["model"]["args"] == {"a": 1, "b": 3}
    assert out["x"] == 1
    # inputs untouched
    assert base["model"]["args"]["b"] == 2


def test_naive_compressor_yaml_attaches_compressor():
    hypes = load_hypes(os.path.join(ROOT, "v2x_real",
                                    "naive_compressor_pyramid.yaml"))
    model, _ = create_model(hypes)
    from quantv2x_tpu.models.naive_compress import NaiveCompressor
    assert isinstance(model.compressor, NaiveCompressor)
    assert model.compressor.compress_ratio == 4
