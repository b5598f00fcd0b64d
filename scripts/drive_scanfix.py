"""Measure the per-scan-step fixed cost and the true stack kernel time.

a) trivial scan body (x + 1) at 16 steps -> fixed cost per step;
b) stage2 int8 stack once vs twice per scan step -> marginal kernel time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from quantv2x_tpu.ops import int8_fused_block as ifb

    rng = jax.random.PRNGKey(0)

    def timeit(fn, *args):
        _ = float(fn(*args))
        ts = []
        for _ in range(3):
            t0 = time.time()
            _ = float(fn(*args))
            ts.append(time.time() - t0)
        return min(ts)

    # a) trivial scan
    @jax.jit
    def trivial(xs):
        def body(c, x):
            return c + x.sum(), 0
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
        return acc

    xs = jax.random.normal(rng, (16, 8, 128), jnp.float32)
    dt = timeit(trivial, xs)
    print(f"trivial 16-step scan: {dt*1e3:.2f} ms total "
          f"({dt/16*1e3:.2f} ms/step)", flush=True)

    # b) stage2 stack x1 vs x2 per step
    N, H, W, C, width, K = 2, 25, 88, 256, 512, 7
    g = (jnp.float32(0.02), jnp.float32(-128.0))
    blocks, metas = [], []
    ks = jax.random.split(rng, 6)
    for j in range(K):
        w1q = jax.random.randint(ks[0], (C, width), -127, 127, jnp.int8)
        sb1 = jnp.stack([jnp.full((width,), 1e-3), jnp.zeros((width,))])
        S = width // 128
        w2q = jax.random.randint(ks[2], (3, 3, S, 128, 128), -127, 127,
                                 jnp.int8)
        sb2 = jnp.stack([jnp.full((width,), 1e-3), jnp.zeros((width,))])
        w3q = jax.random.randint(ks[4], (width, C), -127, 127, jnp.int8)
        sb3 = jnp.stack([jnp.full((C,), 1e-3), jnp.zeros((C,))])
        blocks.append((w1q, sb1, w2q, sb2, w3q, sb3))
        metas.append(jnp.stack([g[0], g[1], 50.0, -128.0, 50.0, -128.0,
                                50.0, -128.0]))
    meta = jnp.stack(metas)
    halo = K
    Wt = -(-(W + 2 * halo) // 32) * 32
    Cp = 256
    th = 16
    while th > 4 and ifb.int8_stack_vmem_bytes(
            th, Wt, Cp, [width] * K, 1) > ifb._VMEM_BUDGET:
        th //= 2
    ngrid = -(-H // th)
    R = ngrid * th + 2 * halo
    print(f"th={th} ngrid={ngrid}", flush=True)
    xs2 = jnp.stack([jax.random.randint(jax.random.fold_in(rng, i),
                                        (N, R, Wt, Cp), -128, 127,
                                        jnp.int8) for i in range(4)])

    def make(reps):
        @jax.jit
        def chain(xs):
            def body(c, x):
                y = x
                for _ in range(reps):
                    y = ifb.int8_fused_stack_chained(
                        y, tuple(blocks), meta, (H, W, C), 1, h_tile=th)
                return c + y.astype(jnp.float32).sum(), 0
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
            return acc
        return chain

    d1 = timeit(make(1), xs2) / 4
    d2 = timeit(make(2), xs2) / 4
    d3 = timeit(make(3), xs2) / 4
    print(f"stack x1/step: {d1*1e3:.2f} ms", flush=True)
    print(f"stack x2/step: {d2*1e3:.2f} ms  (marginal {(d2-d1)*1e3:.2f})",
          flush=True)
    print(f"stack x3/step: {d3*1e3:.2f} ms  (marginal {(d3-d2)*1e3:.2f})",
          flush=True)


if __name__ == "__main__":
    main()
