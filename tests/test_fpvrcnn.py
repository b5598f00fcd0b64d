"""Tests for FPV-RCNN: SA module, cluster fusion, RoI head, full pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantv2x_tpu.data.anchors import (
    AnchorClassCfg,
    AnchorGridCfg,
    generate_anchors,
)
from quantv2x_tpu.data.voxelizer import VoxelCfg, voxelize
from quantv2x_tpu.models.ciassd import CiassdCfg
from quantv2x_tpu.models.fpvrcnn import (
    FPVRCNN,
    FpvrcnnCfg,
    RoIHead,
    RoiHeadCfg,
    StackSAModule,
    VoxelSetAbstraction,
    VsaCfg,
    apply_roi_refinement,
    cluster_fuse_boxes,
    roi_refine_loss,
)
from quantv2x_tpu.models.second_encoder import SecondCfg

RANGE = (-9.6, -9.6, -3.0, 9.6, 9.6, 1.0)


class TestStackSA:
    def test_shapes_and_masking(self):
        rng = np.random.default_rng(0)
        xyz = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(64, 2)).astype(np.float32))
        new_xyz = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
        m = StackSAModule(radii=(1.0, 2.0), nsamples=(8, 8),
                          mlps=((16,), (16,)))
        nm = jnp.array([True] * 4 + [False] * 4)
        v = m.init(jax.random.PRNGKey(0), xyz, jnp.ones(64, bool), feats,
                   new_xyz, nm, False)
        out = m.apply(v, xyz, jnp.ones(64, bool), feats, new_xyz, nm, False)
        assert out.shape == (8, 32)
        assert np.abs(np.asarray(out[4:])).sum() == 0  # masked centers zeroed


class TestClusterFuse:
    def test_two_agents_same_object_merge(self):
        # two near-identical boxes (one per agent) -> one cluster seed
        boxes = jnp.array([
            [0.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.1],
            [0.1, 0.05, -1.0, 4.0, 2.0, 1.5, 0.12],
            [8.0, 8.0, -1.0, 4.0, 2.0, 1.5, 0.0],
        ])
        scores = jnp.array([0.9, 0.6, 0.8])
        fused, fs, seed = cluster_fuse_boxes(
            boxes, scores, jnp.ones(3, bool))
        seed = np.asarray(seed)
        assert seed.tolist() == [True, False, True]
        f0 = np.asarray(fused[0])
        # weighted mean between the two members, closer to the 0.9 box
        assert 0.0 < f0[0] < 0.1
        assert f0[0] == pytest.approx(0.1 * 0.6 / 1.5, abs=1e-5)
        # fused score boosts: s0^1 + s1^2 capped at 1
        assert float(fs[0]) == pytest.approx(min(0.9 + 0.6 ** 2, 1.0))

    def test_direction_voting_flips_antiparallel(self):
        boxes = jnp.array([
            [0.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.0],
            [0.0, 0.0, -1.0, 4.0, 2.0, 1.5, np.pi],  # same box, flipped dir
        ])
        scores = jnp.array([0.9, 0.5])
        fused, _, seed = cluster_fuse_boxes(boxes, scores, jnp.ones(2, bool))
        yaw = float(fused[0][6])
        # flipped member is aligned to dominant direction -> fused yaw ~ 0
        assert abs(np.sin(yaw)) < 1e-5 and np.cos(yaw) > 0.99

    def test_masked_boxes_do_not_cluster(self):
        boxes = jnp.tile(
            jnp.array([[0.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.0]]), (2, 1))
        fused, fs, seed = cluster_fuse_boxes(
            boxes, jnp.array([0.9, 0.9]), jnp.array([True, False]))
        assert np.asarray(seed).tolist() == [True, False]
        assert float(fs[0]) == pytest.approx(0.9)

    def test_jits(self):
        f = jax.jit(cluster_fuse_boxes)
        fused, fs, seed = f(jnp.zeros((4, 7)), jnp.zeros(4),
                            jnp.zeros(4, bool))
        assert not bool(np.asarray(seed).any())


class TestRoIHead:
    def test_refinement_shapes(self):
        rng = np.random.default_rng(1)
        kp = jnp.asarray(rng.uniform(-5, 5, (128, 3)).astype(np.float32))
        kf = jnp.asarray(rng.normal(size=(128, 16)).astype(np.float32))
        rois = jnp.array([[0.0, 0, -1.0, 4.0, 2.0, 1.5, 0.2]] * 4)
        head = RoIHead(RoiHeadCfg(grid_size=3, fc_neurons=32,
                                  mlp_channels=(8,)))
        v = head.init(jax.random.PRNGKey(0), rois, jnp.ones(4, bool), kp,
                      jnp.ones(128, bool), kf, False)
        out = head.apply(v, rois, jnp.ones(4, bool), kp,
                         jnp.ones(128, bool), kf, False)
        assert out["rcnn_cls"].shape == (4, 1)
        assert out["rcnn_reg"].shape == (4, 7)
        refined = apply_roi_refinement(rois, out)
        assert refined.shape == (4, 7)

    def test_refine_loss_perfect_prediction(self):
        rois = jnp.array([[0.0, 0, -1.0, 4.0, 2.0, 1.5, 0.0]])
        gt = jnp.array([[0.5, 0.2, -1.0, 4.0, 2.0, 1.5, 0.1]])
        res = jnp.concatenate([gt[:, :6] - rois[:, :6],
                               (gt[:, 6] - rois[:, 6])[:, None]], axis=-1)
        iou = 1.0  # roughly; just verify loss decreases with correct reg
        out_good = {"rcnn_cls": jnp.full((1, 1), 10.0),
                    "rcnn_iou": jnp.full((1, 1), 0.8),
                    "rcnn_reg": res}
        out_bad = {"rcnn_cls": jnp.full((1, 1), -10.0),
                   "rcnn_iou": jnp.zeros((1, 1)),
                   "rcnn_reg": jnp.ones((1, 7))}
        lg, _ = roi_refine_loss(out_good, rois, jnp.ones(1, bool), gt,
                                jnp.ones(1, bool))
        lb, _ = roi_refine_loss(out_bad, rois, jnp.ones(1, bool), gt,
                                jnp.ones(1, bool))
        assert float(lg) < float(lb)


class TestVSA:
    def test_keypoints_masked_to_boxes(self):
        cfg = VsaCfg(num_keypoints=32, radii=(0.8,), nsamples=(8,),
                     mlp_channels=(8,), out_features=8)
        rng = np.random.default_rng(2)
        # half the points inside a box at origin, half far away
        inside = rng.uniform(-1, 1, (64, 3)) * [1.8, 0.8, 0.5]
        outside = rng.uniform(6, 9, (64, 3))
        pts = np.concatenate([inside, outside])
        pts = np.concatenate([pts, rng.random((128, 1))], axis=1)
        pts = jnp.asarray(pts.astype(np.float32))
        bev = jnp.zeros((48, 48, 4))
        boxes = jnp.array([[0.0, 0, 0, 4.0, 2.0, 2.0, 0.0]])
        vsa = VoxelSetAbstraction(cfg, RANGE, (0.4, 0.4, 0.5))
        v = vsa.init(jax.random.PRNGKey(0), pts, jnp.ones(128, bool), bev,
                     boxes, jnp.ones(1, bool), False)
        kp, km, kf = vsa.apply(v, pts, jnp.ones(128, bool), bev, boxes,
                               jnp.ones(1, bool), False)
        kp, km = np.asarray(kp), np.asarray(km)
        assert km.sum() > 0
        # every surviving keypoint is inside the (enlarged) box
        assert (np.abs(kp[km][:, 0]) < 2.3).all()
        assert (np.abs(kp[km][:, 1]) < 1.3).all()


class TestFPVRCNNPipeline:
    def test_two_agent_forward(self):
        vcfg = VoxelCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 0.5),
                        max_points_per_voxel=4, max_voxels=512)
        scfg = SecondCfg(lidar_range=RANGE, voxel_size=(0.4, 0.4, 0.5),
                         channels=(8, 8, 16), out_channels=16)
        grid = AnchorGridCfg(
            lidar_range=RANGE, voxel_size=(0.4, 0.4, 4.0), feature_stride=2,
            classes=(AnchorClassCfg(
                name="vehicle", size_lwh=(3.9, 1.6, 1.56),
                rotations=(0.0, 1.5708), bottom_height=-1.0,
                matched_threshold=0.5, unmatched_threshold=0.3),))
        anchors, *_ = generate_anchors(grid)
        cfg = FpvrcnnCfg(
            ciassd=CiassdCfg(second=scfg, anchor_num=2, num_class=1),
            vsa=VsaCfg(num_keypoints=64, radii=(0.8,), nsamples=(8,),
                       mlp_channels=(8,), out_features=16),
            roi=RoiHeadCfg(grid_size=3, radii=(1.0,), nsamples=(8,),
                           mlp_channels=(8,), fc_neurons=32),
            stage1_top_k=16, score_thresh=0.0)

        rng = np.random.default_rng(3)
        frames = {"points": [], "point_mask": []}
        vox_stacks = {k: [] for k in ("voxel_features", "voxel_coords",
                                      "voxel_num_points", "voxel_mask")}
        for a in range(2):
            pts = np.concatenate(
                [rng.uniform(-9, 9, (800, 2)),
                 rng.uniform(-2.5, 0.5, (800, 1)),
                 rng.random((800, 1))], axis=1).astype(np.float32)
            vox = voxelize(jnp.asarray(pts), jnp.ones(800, bool), vcfg)
            for k in vox_stacks:
                vox_stacks[k].append(vox[k])
            frames["points"].append(jnp.asarray(pts))
            frames["point_mask"].append(jnp.ones(800, bool))
        frame = {k: jnp.stack(v) for k, v in vox_stacks.items()}
        frame["points"] = jnp.stack(frames["points"])
        frame["point_mask"] = jnp.stack(frames["point_mask"])
        frame["agent_mask"] = jnp.array([True, True])

        model = FPVRCNN(cfg)
        v = jax.jit(
            lambda f: model.init(jax.random.PRNGKey(0), f, anchors))(frame)
        out = model.apply(v, frame, anchors)
        K = cfg.stage1_top_k
        assert out["det_boxes"].shape == (2 * K, 7)
        assert out["boxes_fused"].shape == (2 * K, 7)
        assert out["stage2_out"]["rcnn_reg"].shape == (2 * K, 7)
        assert out["boxes_refined"].shape == (2 * K, 7)
        assert np.isfinite(np.asarray(out["boxes_refined"])).all()
