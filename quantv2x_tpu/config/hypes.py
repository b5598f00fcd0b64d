"""YAML experiment config ("hypes") loading and derived-parameter wiring.

Parity: opencood/hypes_yaml/yaml_utils.py:14-103 — load the YAML, compute
derived grid/anchor shapes from lidar range + voxel size, and hand typed
configs to every subsystem. The schema intentionally mirrors the reference's
(cav_lidar_range / preprocess / postprocess / model / loss / optimizer keys,
e.g. hypes_yaml/v2x_real/LiDAROnly/lidar_pyramid.yaml) so experiment files
port over directly.
"""

import dataclasses
from typing import Any, Dict

import yaml

from quantv2x_tpu.data.anchors import AnchorClassCfg, AnchorGridCfg
from quantv2x_tpu.data.postprocess import PostprocessCfg
from quantv2x_tpu.data.voxelizer import VoxelCfg
from quantv2x_tpu.loss.detection_loss import LossCfg
from quantv2x_tpu.models.collab_model import ModelCfg
from quantv2x_tpu.train.trainer import OptimCfg


@dataclasses.dataclass
class Hypes:
    raw: Dict[str, Any]
    voxel: VoxelCfg
    anchors: AnchorGridCfg
    model: ModelCfg
    loss: LossCfg
    postprocess: PostprocessCfg
    optim: OptimCfg
    max_cav: int
    name: str


def _deep_merge(base: Dict[str, Any], over: Dict[str, Any]) -> Dict[str, Any]:
    """Child keys override parent's; nested dicts merge key-by-key so a
    child yaml can override one leaf without restating the whole block."""
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_raw(path: str) -> Dict[str, Any]:
    """Load a yaml, resolving `extends:` chains recursively (child wins)."""
    import os
    with open(path) as f:
        raw = yaml.safe_load(f)
    if "extends" in raw:
        base_path = os.path.join(os.path.dirname(path), raw.pop("extends"))
        raw = _deep_merge(load_raw(base_path), raw)
    return raw


def load_hypes(path: str) -> Hypes:
    return build_hypes(load_raw(path))


def build_hypes(raw: Dict[str, Any]) -> Hypes:
    lidar_range = tuple(raw["cav_lidar_range"])
    pre = raw["preprocess"]["args"]
    voxel = VoxelCfg(
        lidar_range=lidar_range,
        voxel_size=tuple(pre["voxel_size"]),
        max_points_per_voxel=pre.get("max_points_per_voxel", 32),
        max_voxels=pre.get("max_voxel_train", 16000),
    )

    anchor_classes = []
    for c in raw["preprocess"].get("anchor_generator_config", []):
        l, w, h = c["anchor_sizes"][0]
        anchor_classes.append(
            AnchorClassCfg(
                name=c["class_name"],
                size_lwh=(l, w, h),
                rotations=tuple(c["anchor_rotations"]),
                bottom_height=c["anchor_bottom_heights"][0],
                matched_threshold=c["matched_threshold"],
                unmatched_threshold=c["unmatched_threshold"],
            )
        )
    post = raw.get("postprocess", {})
    stride = post.get("anchor_args", {}).get("feature_stride", 2)
    anchors = AnchorGridCfg(
        lidar_range=lidar_range,
        voxel_size=tuple(pre["voxel_size"]),
        feature_stride=stride,
        classes=tuple(anchor_classes),
    )

    m = raw["model"]["args"]
    num_class = raw.get("num_class", 3)
    fb = m.get("fusion_backbone", {})
    bb = m.get("backbone_args", {})
    model = ModelCfg(
        voxel=voxel,
        num_class=num_class,
        anchor_num=m.get("anchor_number", 2),
        num_dir_bins=m.get("dir_args", {}).get("num_bins", 2),
        pillar_filters=tuple(
            m.get("encoder_args", {}).get("pillar_vfe", {}).get(
                "num_filters", [64]
            )
        ),
        backbone_layers=tuple(bb.get("layer_nums", [3])),
        backbone_strides=tuple(bb.get("layer_strides", [2])),
        backbone_filters=tuple(bb.get("num_filters", [64])),
        pyramid_layers=tuple(fb.get("layer_nums", [3, 5, 8])),
        pyramid_strides=tuple(fb.get("layer_strides", [1, 2, 2])),
        pyramid_filters=tuple(fb.get("num_filters", [64, 128, 256])),
        pyramid_up_strides=tuple(fb.get("upsample_strides", [1, 2, 4])),
        pyramid_up_filters=tuple(fb.get("num_upsample_filter", [128, 128, 128])),
        shrink_dim=m.get("shrink_header", {}).get("dim", [256])[0],
        pyramid_block="bottleneck" if fb.get("resnext", True) else "basic",
        proj_first=fb.get("proj_first", False),
        max_cav=raw.get("train_params", {}).get("max_cav", 4),
        uncertainty_dim=m.get("uncertainty_dim", 0),
        dtype=m.get("dtype", "float32"),
    )

    lw = raw.get("loss", {}).get("args", {})
    anchor_yaws_deg = post.get("anchor_args", {}).get("r", [0, 90])
    import math
    loss = LossCfg(
        num_class=num_class,
        alpha=lw.get("cls", {}).get("alpha", 0.25),
        gamma=lw.get("cls", {}).get("gamma", 2.0),
        cls_weight=lw.get("cls", {}).get("weight", 1.0),
        reg_weight=lw.get("reg", {}).get("weight", 2.0),
        reg_sigma=lw.get("reg", {}).get("sigma", 3.0),
        dir_weight=lw.get("dir", {}).get("weight", 0.2),
        dir_offset=lw.get("dir", {}).get("args", {}).get("dir_offset", 0.7853),
        num_dir_bins=lw.get("dir", {}).get("args", {}).get("num_bins", 2),
        anchor_yaws=tuple(math.radians(r) for r in anchor_yaws_deg),
        anchor_num=m.get("anchor_number", 2),
        pos_cls_weight=lw.get("pos_cls_weight", 2.0),
        pyramid_downsample=tuple(
            lw.get("pyramid", {}).get("relative_downsample", [1, 2, 4])
        ),
        pyramid_weight=tuple(
            lw.get("pyramid", {}).get("weight", [0.4, 0.2, 0.1])
        ),
    )

    ppcfg = PostprocessCfg(
        score_threshold=post.get("target_args", {}).get("score_threshold", 0.2),
        nms_threshold=post.get("nms_thresh", 0.15),
        max_detections=post.get("max_num", 150),
        gt_range=tuple(post.get("gt_range", lidar_range)),
        order=post.get("order", "hwl"),
        num_classes=num_class,
    )

    opt = raw.get("optimizer", {})
    sched = raw.get("lr_scheduler", {})
    optim = OptimCfg(
        lr=opt.get("lr", 0.002),
        eps=float(opt.get("args", {}).get("eps", 1e-10)),
        weight_decay=float(opt.get("args", {}).get("weight_decay", 1e-4)),
        lr_milestones=tuple(sched.get("step_size", [15, 25])),
        lr_gamma=sched.get("gamma", 0.1),
    )

    return Hypes(
        raw=raw,
        voxel=voxel,
        anchors=anchors,
        model=model,
        loss=loss,
        postprocess=ppcfg,
        optim=optim,
        max_cav=model.max_cav,
        name=raw.get("name", "experiment"),
    )


def save_hypes(hypes: Hypes, path: str):
    with open(path, "w") as f:
        yaml.safe_dump(hypes.raw, f)
