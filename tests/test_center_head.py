import jax
import jax.numpy as jnp
import numpy as np

from quantv2x_tpu.models.center_head import (
    CenterHead, CenterHeadCfg, center_loss, decode_centers,
    make_center_targets,
)

CFG = CenterHeadCfg(lidar_range=(-19.2, -19.2, -3.0, 19.2, 19.2, 1.0),
                    stride_m=0.8, max_detections=16)
HW = (48, 48)


def _gt():
    boxes = np.zeros((5, 7), np.float32)
    boxes[0] = [4.3, 2.1, -1.0, 1.6, 1.9, 4.5, 0.4]
    boxes[1] = [-8.0, -6.0, -1.2, 3.0, 2.9, 8.0, -0.8]
    cls = np.array([1, 3, 0, 0, 0], np.int32)
    mask = np.array([1, 1, 0, 0, 0], bool)
    return jnp.asarray(boxes), jnp.asarray(cls), jnp.asarray(mask)


def test_targets_place_peaks():
    boxes, cls, mask = _gt()
    t = make_center_targets(boxes, cls, mask, CFG, HW)
    hm = np.asarray(t["heatmap"])
    assert hm.shape == (48, 48, 3)
    cell = int(t["center_idx"][0])
    gy, gx = cell // 48, cell % 48
    assert gx == int((4.3 + 19.2) / 0.8) and gy == int((2.1 + 19.2) / 0.8)
    assert hm[gy, gx, 0] > 0.99          # vehicle channel peak
    assert hm[..., 1].max() == 0.0       # no pedestrians


def test_perfect_maps_decode():
    boxes, cls, mask = _gt()
    t = make_center_targets(boxes, cls, mask, CFG, HW)
    H, W = HW
    outputs = {
        "heatmap": jnp.where(t["heatmap"] > 0.99, 9.0, -9.0),
        "offset": jnp.zeros((H, W, 2)).reshape(H * W, 2).at[t["center_idx"]]
            .set(t["offset"]).reshape(H, W, 2),
        "z": jnp.zeros((H, W, 1)).reshape(H * W, 1).at[t["center_idx"]]
            .set(t["z"]).reshape(H, W, 1),
        "dim": jnp.zeros((H, W, 3)).reshape(H * W, 3).at[t["center_idx"]]
            .set(t["dim"]).reshape(H, W, 3),
        "rot": jnp.zeros((H, W, 2)).reshape(H * W, 2).at[t["center_idx"]]
            .set(t["rot"]).reshape(H, W, 2),
    }
    det = decode_centers(outputs, CFG)
    valid = np.asarray(det["valid"])
    got = np.asarray(det["boxes"])[valid]
    labels = np.asarray(det["labels"])[valid]
    assert valid.sum() == 2
    order = np.argsort(got[:, 0])
    want = np.asarray(boxes)[[1, 0]]
    np.testing.assert_allclose(got[order], want, atol=0.06)
    assert sorted(labels.tolist()) == [1, 3]


def test_loss_and_head_forward():
    boxes, cls, mask = _gt()
    t = make_center_targets(boxes, cls, mask, CFG, HW)
    head = CenterHead(CFG)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, *HW, 32))
    v = head.init(jax.random.PRNGKey(1), x)
    out = head.apply(v, x)
    out0 = {k: m[0] for k, m in out.items()}
    loss, metrics = center_loss(out0, t, mask)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_centerpoint_collab_model_forward():
    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.data.voxelizer import VoxelCfg
    from quantv2x_tpu.models.center_head import CenterPointCollabModel
    from quantv2x_tpu.models.collab_model import ModelCfg

    rng_range = (-19.2, -19.2, -3.0, 19.2, 19.2, 1.0)
    voxel = VoxelCfg(lidar_range=rng_range, voxel_size=(0.4, 0.4, 4.0),
                     max_points_per_voxel=8, max_voxels=512)
    mcfg = ModelCfg(voxel=voxel, max_cav=2)
    frame = make_frame(SyntheticCfg(lidar_range=rng_range, num_agents=2,
                                    num_objects=3, points_per_agent=2000,
                                    seed=9))
    batch = frame_to_batch(frame, voxel, max_cav=2)
    model = CenterPointCollabModel(mcfg)
    v = jax.jit(lambda b: model.init(jax.random.PRNGKey(0), b,
                                     train=False))(batch)
    out = model.apply(v, batch, train=False)
    assert out["heatmap"].shape == (1, 48, 48, 3)
    assert out["dim"].shape == (1, 48, 48, 3)
    assert np.isfinite(np.asarray(out["heatmap"])).all()
