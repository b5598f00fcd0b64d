"""Tests for the core_method -> model registry."""

import copy

import pytest

from quantv2x_tpu.config.hypes import load_hypes
from quantv2x_tpu.models.registry import create_model

CFG = "configs/v2xreal_lidar_pyramid.yaml"


def _hypes_with(core_method, extra_args=None):
    h = load_hypes(CFG)
    raw = copy.deepcopy(h.raw)
    raw["model"]["core_method"] = core_method
    if extra_args:
        raw["model"].setdefault("args", {}).update(extra_args)
    import dataclasses
    return dataclasses.replace(h, raw=raw)


class TestRegistry:
    @pytest.mark.parametrize("name,contract,cls_name", [
        ("heter_pyramid_collab_mc", "collab", "PyramidCollabModel"),
        ("heter_pyramid_collab_codebook_mc", "collab", "PyramidCollabModel"),
        ("heter_pyramid_single", "voxels", "PyramidSingleModel"),
        ("point_pillar_baseline_mc", "collab", "BaselineFusionModel"),
        ("pixor", "bev", "PIXOR"),
        ("pixor_intermediate", "collab-bev", "PIXORIntermediate"),
        ("ciassd", "voxels", "CIASSD"),
        ("fpvrcnn", "frame", "FPVRCNN"),
        ("second", "voxels", "SECONDEncoder"),
        ("second_ssfa", "voxels", "CIASSD"),
        ("center_point", "collab", "CenterPointCollabModel"),
        ("center_point_where2comm", "collab", "CenterPointCollabModel"),
        ("voxel_net", "voxels", "VoxelNet"),
        ("voxel_net_intermediate", "collab", "VoxelNetIntermediate"),
        ("lift_splat_shoot", "camera", "LSSEncoder"),
        ("point_pillar_disconet", "collab", "BaselineFusionModel"),
        ("point_pillar_uncertainty", "voxels", "PyramidSingleModel"),
        ("second_intermediate", "collab", "SecondIntermediate"),
        ("heter_pyramid_collab_mc_w_stamp", "collab", "StampCollabModel"),
    ])
    def test_resolution(self, name, contract, cls_name):
        model, got = create_model(_hypes_with(name))
        assert got == contract
        assert type(model).__name__ == cls_name

    def test_codebook_variant_has_compressor(self):
        model, _ = create_model(
            _hypes_with("heter_pyramid_collab_codebook_mc",
                        {"codebook": {"seg_num": 4, "dict_size": 128}}))
        assert model.compressor is not None
        assert model.compressor.seg_num == 4
        assert model.compressor.dict_sizes == (128, 128, 128)

    def test_heter_baseline_codebook_has_compressor(self):
        model, contract = create_model(
            _hypes_with("heter_baseline_collab_codebook_mc"))
        assert contract == "collab"
        assert type(model).__name__ == "HeterCollabModel"
        assert model.compressor is not None

    def test_heter_model_has_no_compressor(self):
        model, _ = create_model(_hypes_with("heter_model_baseline_mc"))
        assert model.compressor is None

    def test_baseline_fusion_method_arg(self):
        model, _ = create_model(
            _hypes_with("point_pillar_baseline",
                        {"fusion_method": "where2comm"}))
        assert model.fusion_method == "where2comm"

    def test_case_insensitive(self):
        model, _ = create_model(_hypes_with("Heter_Pyramid_Collab_MC"))
        assert type(model).__name__ == "PyramidCollabModel"

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            create_model(_hypes_with("not_a_model"))

    def test_max_cav_override(self):
        model, _ = create_model(_hypes_with("heter_pyramid_collab_mc"),
                                max_cav=7)
        assert model.cfg.max_cav == 7
