"""Tune (K-split, h_tile) for the stage2 int8/bf16 stacks by marginal
timing. Halo recompute scales as (th + 2*K*r)/th vs chain-DMA per split."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from quantv2x_tpu.ops import fused_block as fb
    from quantv2x_tpu.ops import int8_fused_block as ifb

    rng = jax.random.PRNGKey(0)
    N, H, W, C, width, K = 2, 25, 88, 256, 512, 7
    S = width // 128

    def mk_i8_blocks(k):
        blocks, metas = [], []
        for j in range(k):
            ks = jax.random.split(jax.random.fold_in(rng, j), 3)
            blocks.append((
                jax.random.randint(ks[0], (C, width), -127, 127, jnp.int8),
                jnp.stack([jnp.full((width,), 1e-3), jnp.zeros((width,))]),
                jax.random.randint(ks[1], (3, 3, S, 128, 128), -127, 127,
                                   jnp.int8),
                jnp.stack([jnp.full((width,), 1e-3), jnp.zeros((width,))]),
                jax.random.randint(ks[2], (width, C), -127, 127, jnp.int8),
                jnp.stack([jnp.full((C,), 1e-3), jnp.zeros((C,))]),
            ))
            metas.append(jnp.stack([jnp.float32(0.02), -128.0, 50.0,
                                    -128.0, 50.0, -128.0, 50.0, -128.0]))
        return blocks, jnp.stack(metas)

    def mk_bf_blocks(k):
        blocks = []
        for j in range(k):
            ks = jax.random.split(jax.random.fold_in(rng, j + 100), 3)
            blocks.append((
                jax.random.normal(ks[0], (C, width), jnp.bfloat16) * 0.05,
                jnp.zeros((width,), jnp.float32),
                jax.random.normal(ks[1], (3, 3, S, 128, 128),
                                  jnp.bfloat16) * 0.05,
                jnp.zeros((width,), jnp.float32),
                jax.random.normal(ks[2], (width, C), jnp.bfloat16) * 0.05,
                jnp.zeros((C,), jnp.float32),
            ))
        return blocks

    def run_i8(x, splits, th):
        blocks, meta = mk_i8_blocks(K)
        off = 0
        for k in splits:
            halo = k
            Wt = -(-(W + 2 * halo) // 32) * 32
            ngrid = -(-H // th)
            R = ngrid * th + 2 * halo
            xp = jnp.pad(x, ((0, 0), (halo, R - H - halo),
                             (halo, Wt - W - halo), (0, 0)))
            yp = ifb.int8_fused_stack_chained(
                xp, tuple(blocks[off:off + k]), meta[off:off + k],
                (H, W, C), 1, h_tile=th)
            x = yp[:, halo:halo + H, halo:halo + W, :]
            off += k
        return x

    def run_bf(x, splits, th):
        blocks = mk_bf_blocks(K)
        off = 0
        for k in splits:
            halo = k
            Wt = -(-(W + 2 * halo) // 8) * 8
            ngrid = -(-H // th)
            R = ngrid * th + 2 * halo
            xp = jnp.pad(x, ((0, 0), (halo, R - H - halo),
                             (halo, Wt - W - halo), (0, 0)))
            yp = fb.fused_stack_chained(
                xp, tuple(blocks[off:off + k]), (H, W, C), 1, h_tile=th)
            x = yp[:, halo:halo + H, halo:halo + W, :]
            off += k
        return x

    xs_i8 = jnp.stack([jax.random.randint(
        jax.random.fold_in(rng, i), (N, H, W, C), -128, 127, jnp.int8)
        for i in range(4)])
    xs_bf = jnp.stack([jax.random.normal(
        jax.random.fold_in(rng, i), (N, H, W, C), jnp.bfloat16)
        for i in range(4)])

    def marginal(runner, xs, splits, th, label):
        def mk(reps):
            @jax.jit
            def chain(xs):
                def body(c, x):
                    y = x
                    for r in range(reps):
                        y = runner(y, splits, th)
                    return c + y.astype(jnp.float32).sum(), 0
                a, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
                return a
            return chain
        try:
            c1, c3 = mk(1), mk(3)
            _ = float(c1(xs)); _ = float(c3(xs))
            t1, t3 = [], []
            for _ in range(3):
                t0 = time.time(); _ = float(c1(xs)); t1.append(time.time() - t0)
                t0 = time.time(); _ = float(c3(xs)); t3.append(time.time() - t0)
            d = (min(t3) - min(t1)) / 2 / 4
            print(f"{label} splits={splits} th={th}: {d*1e3:.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"{label} splits={splits} th={th}: FAIL {str(e)[:120]}",
                  flush=True)

    import json
    cfgs = json.loads(os.environ.get(
        "TUNE", '[["i8", [7], 4], ["i8", [7], 8], ["i8", [4, 3], 8]]'))
    for kind, splits, th in cfgs:
        if kind == "i8":
            marginal(run_i8, xs_i8, tuple(splits), th, "int8")
        else:
            marginal(run_bf, xs_bf, tuple(splits), th, "bf16")


if __name__ == "__main__":
    main()
