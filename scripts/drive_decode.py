"""Decompose decode_detections cost: top-k, delta decode, polygon IoU,
NMS loops. Marginal timing via K-times-per-step chains."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from quantv2x_tpu.data import anchors as anc
    from quantv2x_tpu.data.postprocess import PostprocessCfg, decode_detections
    from quantv2x_tpu.utils import box_utils as bu

    rng = jax.random.PRNGKey(0)
    lidar_range = (-140.8, -40.0, -3.0, 140.8, 40.0, 1.0)
    acfg = anc.AnchorGridCfg(lidar_range=lidar_range,
                             voxel_size=(0.4, 0.4, 4.0), feature_stride=2,
                             classes=anc.V2XREAL_CLASSES)
    anchors = anc.generate_anchors(acfg)[0]
    H, W, S, _ = anchors.shape
    C = 3
    pp_cfg = PostprocessCfg(gt_range=lidar_range, pre_nms_top_k=256,
                            max_detections=150)
    print(f"anchor grid {H}x{W}x{S}", flush=True)

    def timeit_marginal(fn, inputs, label):
        """Chain with fn applied r times per step; marginal r2-r1."""
        def mk(reps):
            @jax.jit
            def chain(xs):
                def body(c, x):
                    acc = c
                    y = x
                    for i in range(reps):
                        out = fn(y, i)
                        acc = acc + sum(
                            o.astype(jnp.float32).sum()
                            for o in jax.tree.leaves(out))
                    return acc, 0
                a, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
                return a
            return chain

        c1, c2 = mk(1), mk(3)
        _ = float(c1(inputs)); _ = float(c2(inputs))
        ts1, ts2 = [], []
        for _ in range(3):
            t0 = time.time(); _ = float(c1(inputs)); ts1.append(time.time() - t0)
            t0 = time.time(); _ = float(c2(inputs)); ts2.append(time.time() - t0)
        n = inputs[0].shape[0] if isinstance(inputs, tuple) else inputs.shape[0]
        d = (min(ts2) - min(ts1)) / 2 / 8
        print(f"{label}: {d*1e3:.2f} ms", flush=True)
        return d

    n_steps = 8
    cls = jax.random.normal(rng, (n_steps, H, W, S * C), jnp.float32) * 3
    reg = jax.random.normal(rng, (n_steps, H, W, S * 7), jnp.float32) * 0.2
    dirp = jax.random.normal(rng, (n_steps, H, W, S * 2), jnp.float32)

    def full(x, i):
        c, r, d = x
        det = decode_detections(c * (1 + 0.01 * i), r, anchors, pp_cfg,
                                dir_preds=d)
        return (det["scores"],)

    @jax.jit
    def zipped(c, r, d):
        return None

    xs = (cls, reg, dirp)

    def chainable(fn, label):
        def mk(reps):
            @jax.jit
            def chain(cls, reg, dirp):
                def body(carry, x):
                    c, r, d = x
                    acc = carry
                    for i in range(reps):
                        out = fn(c * (1 + 0.01 * i), r, d)
                        acc = acc + sum(o.astype(jnp.float32).sum()
                                        for o in jax.tree.leaves(out))
                    return acc, 0
                a, _ = jax.lax.scan(body, jnp.float32(0.0), (cls, reg, dirp))
                return a
            return chain
        c1, c3 = mk(1), mk(3)
        _ = float(c1(cls, reg, dirp)); _ = float(c3(cls, reg, dirp))
        t1, t3 = [], []
        for _ in range(3):
            t0 = time.time(); _ = float(c1(cls, reg, dirp)); t1.append(time.time() - t0)
            t0 = time.time(); _ = float(c3(cls, reg, dirp)); t3.append(time.time() - t0)
        d = (min(t3) - min(t1)) / 2 / n_steps
        print(f"{label}: {d*1e3:.2f} ms marginal", flush=True)

    # full decode
    chainable(lambda c, r, d: (decode_detections(
        c, r, anchors, pp_cfg, dir_preds=d)["scores"],), "full decode")

    # stages
    from quantv2x_tpu.data.anchors import decode_deltas

    def upto_topk(c, r, d):
        prob = jax.nn.sigmoid(c.reshape(H * W * S, C))
        scores = prob.max(axis=-1)
        masked = jnp.where(scores > 0.2, scores, -1.0)
        ts, ti = jax.lax.approx_max_k(masked, 256, recall_target=0.95)
        return (ts,)

    chainable(upto_topk, "sigmoid+topk")

    def upto_decode(c, r, d):
        prob = jax.nn.sigmoid(c.reshape(H * W * S, C))
        scores = prob.max(axis=-1)
        deltas = r.reshape(H * W * S, 7)
        boxes = decode_deltas(deltas, anchors.reshape(-1, 7))
        masked = jnp.where(scores > 0.2, scores, -1.0)
        ts, ti = jax.lax.approx_max_k(masked, 256, recall_target=0.95)
        return (ts, boxes[ti].sum())

    chainable(upto_decode, "sigmoid+topk+fulldecode+gather")

    # NMS alone on 256 random corner boxes
    boxes7 = jnp.concatenate([
        jax.random.uniform(rng, (256, 2), jnp.float32, -50, 50),
        jnp.zeros((256, 1)),
        jax.random.uniform(rng, (256, 3), jnp.float32, 1, 4),
        jax.random.uniform(rng, (256, 1), jnp.float32, -3, 3)], axis=1)
    corners0 = bu.boxes_to_corners_3d(boxes7, "hwl")
    sc0 = jax.random.uniform(rng, (256,))
    cstack = jnp.stack([corners0 + i * 0.01 for i in range(n_steps)])
    sstack = jnp.stack([sc0] * n_steps)

    def nms_chain(reps):
        @jax.jit
        def chain(cs, ss):
            def body(carry, x):
                co, sc = x
                acc = carry
                for i in range(reps):
                    keep = bu.nms_corners(co + 0.001 * i, sc,
                                          jnp.ones((256,), bool), 0.15)
                    acc = acc + keep.sum()
                return acc, 0
            a, _ = jax.lax.scan(body, jnp.float32(0.0), (cs, ss))
            return a
        return chain

    c1, c3 = nms_chain(1), nms_chain(3)
    _ = float(c1(cstack, sstack)); _ = float(c3(cstack, sstack))
    t1, t3 = [], []
    for _ in range(3):
        t0 = time.time(); _ = float(c1(cstack, sstack)); t1.append(time.time() - t0)
        t0 = time.time(); _ = float(c3(cstack, sstack)); t3.append(time.time() - t0)
    print(f"nms_corners(256): {(min(t3)-min(t1))/2/n_steps*1e3:.2f} ms "
          f"marginal", flush=True)

    # polygon IoU matrix alone 128x128
    def iou_chain(reps):
        @jax.jit
        def chain(cs):
            def body(carry, co):
                acc = carry
                for i in range(reps):
                    m = bu.iou_matrix_polygon(co[:128] + 0.001 * i,
                                              co[:128])
                    acc = acc + m.sum()
                return acc, 0
            a, _ = jax.lax.scan(body, jnp.float32(0.0), cs)
            return a
        return chain

    c1, c3 = iou_chain(1), iou_chain(3)
    _ = float(c1(cstack)); _ = float(c3(cstack))
    t1, t3 = [], []
    for _ in range(3):
        t0 = time.time(); _ = float(c1(cstack)); t1.append(time.time() - t0)
        t0 = time.time(); _ = float(c3(cstack)); t3.append(time.time() - t0)
    print(f"iou_matrix_polygon(128x128): {(min(t3)-min(t1))/2/n_steps*1e3:.2f}"
          f" ms marginal", flush=True)


if __name__ == "__main__":
    main()
