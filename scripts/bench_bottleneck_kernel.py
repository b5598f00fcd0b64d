"""TPU micro-bench: fused Pallas bottleneck vs XLA at flagship shapes.

Scan-chain timing (varied inputs, one scalar fetch) per the repo's
benchmarking discipline (BASELINE.md environment notes).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from quantv2x_tpu.utils.runtime import enable_compile_cache

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quantv2x_tpu.ops.fused_block import (  # noqa: E402
    bottleneck_reference,
    fused_bottleneck,
)

SHAPES = [  # (N, H, W, C, width) = flagship pyramid levels, 2 agents
    (2, 352, 100, 64, 128),
    (2, 176, 50, 128, 256),
    (2, 88, 25, 256, 512),
]


UNROLL = 8


def timeit(fn, stacked_args, n_iter):
    # UNROLL chained applications per scan step amortize the backend's
    # multi-ms fixed per-step cost (BASELINE.md device calibration);
    # marginal per-block time = slope between 1x and UNROLLx programs.
    def make_chain(r):
        @jax.jit
        def chain(args):
            def body(c, a):
                x, rest = a[0], a[1:]
                for _ in range(r):
                    x = fn(x, *rest)
                return c + x.sum().astype(jnp.float32), 0

            acc, _ = jax.lax.scan(body, jnp.float32(0), args)
            return acc
        return chain

    c1, cr = make_chain(1), make_chain(UNROLL)
    t0 = time.time()
    _ = float(c1(stacked_args))
    _ = float(cr(stacked_args))
    compile_s = time.time() - t0
    t1s, trs = [], []
    for _ in range(3):
        t0 = time.time()
        _ = float(c1(stacked_args))
        t1s.append(time.time() - t0)
        t0 = time.time()
        _ = float(cr(stacked_args))
        trs.append(time.time() - t0)
    t1 = min(t1s) / n_iter
    tr = min(trs) / n_iter
    marginal_ms = (tr - t1) / (UNROLL - 1) * 1e3
    return marginal_ms, compile_s


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    K = 4
    for N, H, W, C, Wd in SHAPES:
        arrs = []
        for k in range(K):
            x = rng.normal(0, 1, (N, H, W, C)).astype(np.float32)
            w1 = rng.normal(0, 0.05, (C, Wd)).astype(np.float32)
            b1 = rng.normal(0, 0.05, (Wd,)).astype(np.float32)
            w2 = rng.normal(0, 0.05, (3, 3, Wd, Wd)).astype(np.float32)
            b2 = rng.normal(0, 0.05, (Wd,)).astype(np.float32)
            w3 = rng.normal(0, 0.05, (Wd, C)).astype(np.float32)
            b3 = rng.normal(0, 0.05, (C,)).astype(np.float32)
            arrs.append((x, w1, b1, w2, b2, w3, b3))
        stacked = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(v, jnp.bfloat16) for v in xs]),
            *arrs)
        f32b = jnp.float32

        def fused(x, w1, b1, w2, b2, w3, b3):
            return fused_bottleneck(x, w1, b1.astype(f32b), w2,
                                    b2.astype(f32b), w3, b3.astype(f32b),
                                    h_tile=16)

        ms_f, cs_f = timeit(fused, stacked, K)
        ms_r, cs_r = timeit(bottleneck_reference, stacked, K)
        print(f"({N},{H},{W},{C})->w{Wd}: fused {ms_f:7.3f} ms "
              f"(compile {cs_f:5.1f}s) | xla {ms_r:7.3f} ms "
              f"(compile {cs_r:5.1f}s) | speedup {ms_r / ms_f:4.2f}x")


if __name__ == "__main__":
    main()
