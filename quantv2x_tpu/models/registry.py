"""Top-level model registry: YAML ``model.core_method`` -> model instance.

Parity: tools/train_utils.create_model:258-291 — the reference resolves the
core_method string to a class via importlib + case-insensitive match. Here
the mapping is an explicit dict (typo-proof, grep-able) and returns a
ready-to-init flax module plus its batch contract:

  contract "collab": __call__(batch_dict, train)  — the cooperative batch
      from data/pipeline.frame_to_batch (voxel stacks + agent axis);
  contract "voxels": __call__(voxel_dict, train)  — one agent's voxelizer
      output (single-agent models);
  contract "bev":    __call__(bev_raster, train)  — dense BEV input (PIXOR);
  contract "frame":  __call__(frame_dict, anchors, train) — FPV-RCNN's
      stacked-agent frame.

Reference names accepted (case-insensitive, `_mc` suffix ignored — the
multi-class variants differ only in head widths, which ModelCfg carries):
heter_pyramid_collab, heter_pyramid_collab_codebook(_encdec),
heter_pyramid_single, point_pillar(_single), point_pillar_baseline
(+ fusion_method arg for max/att/disconet/v2vnet/where2comm/who2com/
cobevt/v2xvit/f_cooper), pixor, ciassd, fpvrcnn, second, center_point.
"""

import dataclasses
from typing import Optional

from quantv2x_tpu.config.hypes import Hypes


def _codebook_from(args: dict, dtype):
    from quantv2x_tpu.models.codebook import CodebookCompressor
    cb = args.get("codebook", {})
    levels = int(cb.get("levels", 3))
    return CodebookCompressor(
        channel=int(cb.get("channel", 64)),
        seg_num=int(cb.get("seg_num", 2)),
        dict_sizes=tuple([int(cb.get("dict_size", 256))] * levels),
        dtype=dtype,
    )


def _modalities_from(raw: dict):
    from quantv2x_tpu.models.heter_model import ModalityCfg
    het = raw.get("heter", {})
    setting = het.get("modality_setting", {})
    mods = []
    for name, m in setting.items():
        core = (m.get("core_method") or
                m.get("sensor_type", "point_pillar"))
        if "second" in core:
            core = "second"
        elif ("lss" in core or "lift" in core or "camera" in core
              or m.get("sensor_type") == "camera"):
            core = "lift_splat_shoot"
        else:
            core = "point_pillar"
        kwargs = {}
        cam = m.get("img_params", {})
        if core == "lift_splat_shoot" and cam:
            if "final_dim" in cam:
                kwargs["image_size"] = tuple(cam["final_dim"])
            if "d_bound" in cam:
                kwargs["depth_bins"] = tuple(cam["d_bound"])
        mods.append(ModalityCfg(
            name=name,
            core_method=core,
            aligner=m.get("aligner", {}).get("core_method", "identity")
            if isinstance(m.get("aligner"), dict)
            else m.get("aligner", "identity"),
            **kwargs,
        ))
    return tuple(mods) or (ModalityCfg("m1", "point_pillar"),)


def create_model(hypes: Hypes, max_cav: Optional[int] = None):
    """Resolve hypes.raw['model']['core_method'] -> (model, contract)."""
    raw = hypes.raw
    name = raw["model"]["core_method"].lower()
    args = raw["model"].get("args", {})
    base = name.replace("_mc", "").replace("_3class", "")
    mcfg = hypes.model
    if max_cav is not None:
        mcfg = dataclasses.replace(mcfg, max_cav=max_cav)
    dt = mcfg.jnp_dtype

    if base in ("heter_pyramid_collab_w_stamp", "pyramid_collab_w_stamp"):
        # heter_pyramid_collab_mc_w_stamp.py — pyramid collab whose non-ego
        # agents transmit through the STAMP adapter/reverter bridge
        from quantv2x_tpu.models.collab_model import PyramidCollabModel
        from quantv2x_tpu.models.stamp import StampCollabModel
        ch = mcfg.backbone_filters[-1]
        return StampCollabModel(
            ego_model=PyramidCollabModel(mcfg, name="ego_model"),
            protocol_model=PyramidCollabModel(mcfg, name="protocol_model"),
            protocol_channels=ch, local_channels=ch,
            stage=str(args.get("stamp_stage", "infer")),
            # reference-parity variant selection (adapter.py:811-856):
            # hypes model args may carry adapter:/reverter: blocks with a
            # core_method + args (see stamp.build_adapter)
            adapter_spec=args.get("adapter"),
            reverter_spec=args.get("reverter"), dtype=dt,
        ), "collab"

    if base == "second_intermediate":
        # second_intermediate.py:15-62 — SECOND trunk per agent +
        # AttBEVBackbone per-level attention fusion across agents
        from quantv2x_tpu.models.second_encoder import SecondIntermediate
        return SecondIntermediate(mcfg), "collab"

    if base in ("heter_pyramid_collab", "pyramid_collab"):
        from quantv2x_tpu.models.collab_model import PyramidCollabModel
        comp = None
        ratio = int(args.get("compression", 0))
        if ratio:
            # reference Naive_Compressor yamls carry model.args.compression
            # as the channel ratio of sub_modules/naive_compress.py:5-33
            from quantv2x_tpu.models.naive_compress import NaiveCompressor
            comp = NaiveCompressor(channels=mcfg.backbone_filters[-1],
                                   compress_ratio=ratio, dtype=dt)
        return PyramidCollabModel(mcfg, compressor=comp), "collab"

    if base.startswith("heter_pyramid_collab_codebook"):
        from quantv2x_tpu.models.collab_model import PyramidCollabModel
        return (PyramidCollabModel(mcfg,
                                   compressor=_codebook_from(args, dt)),
                "collab")

    if base in ("heter_pyramid_single", "point_pillar_single",
                "point_pillar"):
        # the fusion block picks the dataset mixin in the reference
        # (build_dataset: early/late/intermediate); for the single-agent
        # model it decides whether eval merges clouds (early) or
        # detections (late)
        from quantv2x_tpu.models.single_model import PyramidSingleModel
        fusion_mode = str(raw.get("fusion", {}).get("core_method", ""))
        if fusion_mode.startswith("early"):
            return PyramidSingleModel(mcfg), "early"
        if fusion_mode.startswith("late"):
            return PyramidSingleModel(mcfg), "late"
        return PyramidSingleModel(mcfg), "voxels"

    if base in ("heter_model_early", "early_fusion"):
        # heter_model_early(_mc): agents' clouds merge in the ego frame
        # BEFORE voxelization; the single-agent detector runs on the merge
        # (drive with tools/inference.py, contract "early")
        from quantv2x_tpu.models.single_model import PyramidSingleModel
        return PyramidSingleModel(mcfg), "early"

    if base in ("heter_model_late", "late_fusion"):
        # heter_model_late(_mc): per-agent detection, detections projected
        # to ego and merged by one rotated NMS (contract "late")
        from quantv2x_tpu.models.single_model import PyramidSingleModel
        return PyramidSingleModel(mcfg), "late"

    if "gencomm" in base:
        # heter_model_baseline_w_gencomm_stage{1,2}: detection stack +
        # diffusion message generator (stage picked by the trainer's
        # freeze scopes, tools/train_gencomm.py)
        from quantv2x_tpu.models.collab_model import PyramidCollabModel
        from quantv2x_tpu.models.gencomm import (
            GenCommCfg,
            GenCommCollabModel,
        )
        gc_args = args.get("gencomm", {})
        gcfg = GenCommCfg(
            channels=mcfg.backbone_filters[-1],
            timesteps=int(gc_args.get("timesteps", 100)),
            message_channels=int(gc_args.get("message_channels", 8)),
            ch_mult=tuple(gc_args.get("ch_mult", (1, 2))),
            num_res_blocks=int(gc_args.get("num_res_blocks", 2)),
            attn_mid=bool(gc_args.get("attn_mid", True)),
        )
        return (GenCommCollabModel(
            base_model=PyramidCollabModel(mcfg, name="base_model"),
            cfg=gcfg,
            use_enhancer="enhancer" in args), "collab")

    if base.startswith("heter_collab") or base.startswith("heter_model") \
            or base.startswith("heter_baseline_collab") \
            or base == "heter_pyramid_single_clip":
        # the CLIP variant is the heter model driven with
        # __call__(..., with_clip_embeddings=True) + loss/aux_losses
        # .clip_loss on the returned per-modality embeddings
        # heter_baseline_collab_codebook(_mc) carries the codebook compressor
        from quantv2x_tpu.models.heter_model import HeterCollabModel
        comp = _codebook_from(args, dt) if "codebook" in base else None
        fusion = args.get("fusion_method",
                          args.get("fusion_args", {}).get("core_method",
                                                          "pyramid"))
        return (HeterCollabModel(mcfg, modalities=_modalities_from(raw),
                                 compressor=comp, fusion_method=fusion),
                "collab")

    if base.startswith("point_pillar_baseline") or base.startswith(
            "baseline"):
        from quantv2x_tpu.models.baseline_model import BaselineFusionModel
        fusion = args.get("fusion_method",
                          args.get("fusion_args", {}).get("core_method",
                                                          "att"))
        comm = None
        comm_args = args.get("communication") or args.get(
            "fusion_args", {}).get("communication")
        if fusion == "where2comm" or comm_args:
            # where2comm communication gate (comm_modules/where2comm.py +
            # where2comm_attn.py): threshold/smooth/request/round knobs
            from quantv2x_tpu.models.comm_mask import CommCfg
            ca = comm_args or {}
            g = ca.get("gaussian_smooth", {})
            comm = CommCfg(
                threshold=float(ca.get("thre", 0.01)),
                gaussian_ksize=int(g.get("k_size", 5)),
                gaussian_sigma=float(g.get("c_sigma", 1.0)),
                smooth=bool(g) or bool(ca.get("smooth", True)),
                request=bool(ca.get("request", False)),
                rounds=int(ca.get("round", 1)),
            )
        return (BaselineFusionModel(mcfg, fusion_method=fusion, comm=comm),
                "collab")

    if base == "pixor_intermediate":
        from quantv2x_tpu.models.pixor import PIXORIntermediate, PixorCfg
        geom = args.get("geometry_param", {})
        pcfg = PixorCfg(
            lidar_range=mcfg.voxel.lidar_range,
            res=float(geom.get("res", 0.2)),
            use_bn=bool(args.get("use_bn", True)),
            dtype=mcfg.dtype,
        )
        return PIXORIntermediate(pcfg), "collab-bev"

    if base == "pixor":
        from quantv2x_tpu.models.pixor import PIXOR, PixorCfg
        geom = args.get("geometry_param", {})
        pcfg = PixorCfg(
            lidar_range=mcfg.voxel.lidar_range,
            res=float(geom.get("res", 0.2)),
            use_bn=bool(args.get("use_bn", True)),
            dtype=mcfg.dtype,
        )
        return PIXOR(pcfg), "bev"

    if base == "ciassd":
        from quantv2x_tpu.models.ciassd import CIASSD, CiassdCfg
        from quantv2x_tpu.models.second_encoder import SecondCfg
        scfg = SecondCfg(lidar_range=mcfg.voxel.lidar_range,
                         voxel_size=tuple(
                             args.get("voxel_size",
                                      mcfg.voxel.voxel_size)))
        return (CIASSD(CiassdCfg(second=scfg, anchor_num=mcfg.anchor_num,
                                 num_class=mcfg.num_class,
                                 dtype=mcfg.dtype)),
                "voxels")

    if base == "fpvrcnn":
        from quantv2x_tpu.models.ciassd import CiassdCfg
        from quantv2x_tpu.models.fpvrcnn import FPVRCNN, FpvrcnnCfg
        from quantv2x_tpu.models.second_encoder import SecondCfg
        scfg = SecondCfg(lidar_range=mcfg.voxel.lidar_range,
                         voxel_size=tuple(
                             args.get("voxel_size",
                                      mcfg.voxel.voxel_size)))
        return (FPVRCNN(FpvrcnnCfg(
            ciassd=CiassdCfg(second=scfg, anchor_num=mcfg.anchor_num,
                             num_class=1, dtype=mcfg.dtype))),
                "frame")

    if base == "second":
        from quantv2x_tpu.models.second_encoder import SECONDEncoder, SecondCfg
        return (SECONDEncoder(SecondCfg(
            lidar_range=mcfg.voxel.lidar_range,
            voxel_size=tuple(args.get("voxel_size",
                                      mcfg.voxel.voxel_size)))),
                "voxels")

    if base.startswith("center_point"):
        # center_point / center_point_baseline(_multiscale) /
        # center_point_intermediate / center_point_where2comm: all share the
        # collab trunk; where2comm only changes the fusion gate
        from quantv2x_tpu.models.center_head import CenterPointCollabModel
        return CenterPointCollabModel(mcfg), "collab"

    if base == "voxel_net_intermediate":
        from quantv2x_tpu.models.voxelnet import (VoxelNetCfg,
                                                  VoxelNetIntermediate)
        vncfg = VoxelNetCfg(voxel=mcfg.voxel, anchor_num=mcfg.anchor_num,
                            num_class=mcfg.num_class,
                            compression=int(args.get("compression", 0)),
                            dtype=mcfg.dtype)
        return VoxelNetIntermediate(vncfg), "collab"

    if base == "voxel_net":
        from quantv2x_tpu.models.voxelnet import VoxelNet, VoxelNetCfg
        vncfg = VoxelNetCfg(voxel=mcfg.voxel, anchor_num=mcfg.anchor_num,
                            num_class=mcfg.num_class, dtype=mcfg.dtype)
        return VoxelNet(vncfg), "voxels"

    if base in ("lift_splat_shoot", "lift_splat_shoot_voxel",
                "lift_splat_shoot_intermediate"):
        from quantv2x_tpu.models.lss_encoder import LSSCfg, LSSEncoder
        cam = args.get("img_params", {})
        lcfg = LSSCfg(lidar_range=mcfg.voxel.lidar_range,
                      image_size=tuple(cam.get("final_dim",
                                               LSSCfg.image_size)))
        return LSSEncoder(lcfg, dtype=mcfg.jnp_dtype), "camera"

    if base in ("point_pillar_disconet", "point_pillar_disconet_teacher"):
        # student = disco-fused baseline; teacher = early-fusion-style max
        from quantv2x_tpu.models.baseline_model import BaselineFusionModel
        fusion = "disconet" if base.endswith("disconet") else "max"
        return BaselineFusionModel(mcfg, fusion_method=fusion), "collab"

    if base == "point_pillar_uncertainty":
        from quantv2x_tpu.models.single_model import PyramidSingleModel
        ucfg = dataclasses.replace(
            mcfg, uncertainty_dim=int(args.get("uncertainty_dim", 3)))
        return PyramidSingleModel(ucfg), "voxels"

    if base in ("second_ssfa", "second_ssfa_uncertainty"):
        # SECOND encoder + SSFA neck + IoU-aware head = the CIA-SSD stack
        from quantv2x_tpu.models.ciassd import CIASSD, CiassdCfg
        from quantv2x_tpu.models.second_encoder import SecondCfg
        scfg = SecondCfg(lidar_range=mcfg.voxel.lidar_range,
                         voxel_size=tuple(
                             args.get("voxel_size",
                                      mcfg.voxel.voxel_size)))
        return (CIASSD(CiassdCfg(second=scfg, anchor_num=mcfg.anchor_num,
                                 num_class=mcfg.num_class,
                                 dtype=mcfg.dtype)),
                "voxels")

    raise KeyError(
        f"unknown model.core_method {name!r}; known: heter_pyramid_collab"
        "(_codebook), heter_pyramid_single, point_pillar(_baseline, "
        "_disconet, _uncertainty), heter_collab, pixor, ciassd, fpvrcnn, "
        "second(_ssfa), center_point*, voxel_net(_intermediate), "
        "lift_splat_shoot")
