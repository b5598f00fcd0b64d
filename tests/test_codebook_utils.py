import jax
import jax.numpy as jnp
import numpy as np

from quantv2x_tpu.models.codebook_utils import reassign_dead_codes, reassign_level
from quantv2x_tpu.utils.eval_ap import (
    accumulate_frame_by_range, new_range_stats, summarize,
)
from quantv2x_tpu.utils import box_utils as bu


def test_reassign_level_replaces_dead_only():
    rng = jax.random.PRNGKey(0)
    cb = jax.random.normal(rng, (2, 8, 4))
    freq = jnp.ones((2, 8)) / 8
    freq = freq.at[0, 3].set(0.0).at[1, 5].set(0.0)
    new = reassign_level(cb, freq, jax.random.PRNGKey(1))
    alive = np.ones((2, 8), bool); alive[0, 3] = alive[1, 5] = False
    np.testing.assert_allclose(np.asarray(new)[alive], np.asarray(cb)[alive])
    assert not np.allclose(np.asarray(new)[0, 3], np.asarray(cb)[0, 3])


def test_reassign_walks_param_tree():
    params = {"compressor": {"codebook": {"level0": {
        "codebook": jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4)),
        "temperature": jnp.ones((2, 1))}}}}
    stats = {"codebook": {"freq_ema_0": jnp.ones((2, 8)).at[0, 0].set(0.0) / 8}}
    new, dead = reassign_dead_codes(params, stats, jax.random.PRNGKey(2))
    assert dead == 1
    assert not np.allclose(
        np.asarray(new["compressor"]["codebook"]["level0"]["codebook"][0, 0]),
        np.asarray(params["compressor"]["codebook"]["level0"]["codebook"][0, 0]))


def test_range_stratified_ap():
    near = np.array([[10, 0, 0, 4, 2, 1.5, 0.0]], np.float32)   # 10 m
    far = np.array([[60, 0, 0, 4, 2, 1.5, 0.0]], np.float32)    # 60 m
    gt = np.concatenate([near, far])
    det = near  # only the near box detected
    stats = new_range_stats(num_classes=1)
    accumulate_frame_by_range(
        stats,
        np.asarray(bu.boxes_to_corners_3d(jnp.asarray(det), "lwh")),
        np.array([0.9]), np.array([1]), np.ones(1, bool),
        np.asarray(bu.boxes_to_corners_3d(jnp.asarray(gt), "lwh")),
        np.array([1, 1]), np.ones(2, bool),
    )
    res = {k: summarize(v) for k, v in stats.items()}
    assert res["0-30m"][1][0.5] == 1.0
    assert res["50-100m"][1][0.5] == 0.0
    assert res["30-50m"][1][0.5] == 0.0  # no gt, no det -> ap 0 by definition
