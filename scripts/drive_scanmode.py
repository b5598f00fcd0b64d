"""Compare chaining strategies for the per-step fixed cost: scan vs
unrolled scan vs python-for, trivial and conv bodies."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)

    def timeit(fn, *args):
        _ = float(fn(*args))
        ts = []
        for _ in range(3):
            t0 = time.time()
            _ = float(fn(*args))
            ts.append(time.time() - t0)
        return min(ts)

    N = 16
    xs = jax.random.normal(rng, (N, 8, 128), jnp.float32)

    def body(c, x):
        return c + x.sum(), 0

    @jax.jit
    def f_scan(xs):
        return jax.lax.scan(body, jnp.float32(0.0), xs)[0]

    @jax.jit
    def f_unroll(xs):
        return jax.lax.scan(body, jnp.float32(0.0), xs, unroll=N)[0]

    @jax.jit
    def f_py(xs):
        c = jnp.float32(0.0)
        for i in range(N):
            c, _ = body(c, xs[i])
        return c

    for name, fn in [("scan", f_scan), ("scan-unroll", f_unroll),
                     ("python-for", f_py)]:
        dt = timeit(fn, xs)
        print(f"trivial {name}: {dt*1e3:.2f} ms ({dt/N*1e3:.3f} ms/step)",
              flush=True)

    # conv body (real work ~0.9 GFLOP/step)
    w = jax.random.normal(rng, (3, 3, 128, 128), jnp.bfloat16) * 0.05
    ys = jax.random.normal(rng, (4, 2, 100, 352, 128), jnp.bfloat16)

    def conv_body(c, x):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                         dimension_numbers=dn)
        return c + y.astype(jnp.float32).sum(), 0

    @jax.jit
    def c_scan(ys):
        return jax.lax.scan(conv_body, jnp.float32(0.0),
                            jnp.concatenate([ys] * 4))[0]

    @jax.jit
    def c_unroll(ys):
        return jax.lax.scan(conv_body, jnp.float32(0.0),
                            jnp.concatenate([ys] * 4), unroll=16)[0]

    for name, fn in [("scan", c_scan), ("scan-unroll", c_unroll)]:
        dt = timeit(fn, ys)
        print(f"conv {name}: {dt*1e3:.2f} ms ({dt/16*1e3:.3f} ms/step)",
              flush=True)


if __name__ == "__main__":
    main()
