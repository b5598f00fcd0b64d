"""Isolated kernel A/B at flagship stage shapes: bf16 stack vs int8 stack.

Times ONLY the chained residual-block stacks (the part the engines fuse),
chained over distinct inputs inside one jit. Prints per-stage ms + GB/s.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from quantv2x_tpu.ops import fused_block as fb
    from quantv2x_tpu.ops import int8_fused_block as ifb
    from quantv2x_tpu.quant import int8_fused_engine as ife

    rng = jax.random.PRNGKey(0)

    # flagship ResNeXt pyramid stages (2 agents): (N,H,W,C,width,K)
    stages = [
        (2, 100, 352, 64, 128, 2),    # stage0: 3 blocks, 2 fusable
        (2, 50, 176, 128, 256, 4),    # stage1
        (2, 25, 88, 256, 512, 7),     # stage2
    ]

    def timeit_chain(fn, xs, n_rep=6):
        @jax.jit
        def chain(xs):
            def body(c, x):
                y = fn(x)
                return c + y.astype(jnp.float32).sum(), 0
            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.stack([x for x in xs] * n_rep))
            return acc
        _ = float(chain(xs))
        ts = []
        for _ in range(3):
            t0 = time.time()
            _ = float(chain(xs))
            ts.append(time.time() - t0)
        return min(ts) / (len(xs) * n_rep)

    tot_bf16, tot_int8 = 0.0, 0.0
    for (N, H, W, C, width, K) in stages:
        # ---- bf16 stack ----
        ks = jax.random.split(rng, 8)
        blocks_bf = []
        for j in range(K):
            w1 = jax.random.normal(ks[0], (C, width), jnp.bfloat16) * 0.05
            b1 = jax.random.normal(ks[1], (width,), jnp.float32) * 0.1
            S = width // 128
            w2 = jax.random.normal(ks[2], (3, 3, S, 128, 128),
                                   jnp.bfloat16) * 0.05
            b2 = jax.random.normal(ks[3], (width,), jnp.float32) * 0.1
            w3 = jax.random.normal(ks[4], (width, C), jnp.bfloat16) * 0.05
            b3 = jax.random.normal(ks[5], (C,), jnp.float32) * 0.1
            blocks_bf.append((w1, b1, w2, b2, w3, b3))
        halo = K
        Wt8 = -(-(W + 2 * halo) // 8) * 8
        Cp = -(-C // 128) * 128
        th = 16
        while th > 4 and fb._stack_vmem_bytes(
                th, Wt8, Cp, [width] * K, 1) > fb._VMEM_BUDGET:
            th //= 2
        ngrid = -(-H // th)
        R8 = ngrid * th + 2 * halo
        xs_bf = [jax.random.normal(jax.random.fold_in(rng, i),
                                   (N, R8, Wt8, Cp), jnp.bfloat16)
                 for i in range(2)]
        dt_bf = timeit_chain(
            lambda x: fb.fused_stack_chained(
                x, tuple(blocks_bf), (H, W, C), 1, h_tile=th), xs_bf)

        # ---- int8 stack ----
        g = (jnp.float32(0.02), jnp.float32(-128.0))
        blocks_i8, metas = [], []
        for j in range(K):
            w1q = jax.random.randint(ks[0], (C, width), -127, 127, jnp.int8)
            sb1 = jnp.stack([jnp.full((width,), 1e-3),
                             jnp.zeros((width,))])
            S = width // 128
            w2q = jax.random.randint(ks[2], (3, 3, S, 128, 128), -127, 127,
                                     jnp.int8)
            sb2 = jnp.stack([jnp.full((width,), 1e-3),
                             jnp.zeros((width,))])
            w3q = jax.random.randint(ks[4], (width, C), -127, 127, jnp.int8)
            sb3 = jnp.stack([jnp.full((C,), 1e-3), jnp.zeros((C,))])
            blocks_i8.append((w1q, sb1, w2q, sb2, w3q, sb3))
            metas.append(jnp.stack([g[0], g[1], 50.0, -128.0, 50.0,
                                    -128.0, 50.0, -128.0]))
        Wt32 = -(-(W + 2 * halo) // 32) * 32
        thi = 16
        while thi > 4 and ifb.int8_stack_vmem_bytes(
                thi, Wt32, Cp, [width] * K, 1) > ifb._VMEM_BUDGET:
            thi //= 2
        ngrid_i = -(-H // thi)
        Ri = ngrid_i * thi + 2 * halo
        meta = jnp.stack(metas)
        xs_i8 = [jax.random.randint(jax.random.fold_in(rng, i),
                                    (N, Ri, Wt32, Cp), -128, 127, jnp.int8)
                 for i in range(2)]
        dt_i8 = timeit_chain(
            lambda x: ifb.int8_fused_stack_chained(
                x, tuple(blocks_i8), meta, (H, W, C), 1, h_tile=thi),
            xs_i8)

        # traffic: in+out buffers per call
        gb_bf = 2 * N * R8 * Wt8 * Cp * 2 / 1e9
        gb_i8 = 2 * N * Ri * Wt32 * Cp * 1 / 1e9
        flops = sum(2 * N * H * W * (C * width * 2 + 9 * width * 128)
                    for _ in range(K)) / 1e12
        print(f"stage N{N} {H}x{W} C{C} w{width} K{K} "
              f"(th bf16={th} int8={thi}):", flush=True)
        print(f"  bf16 {dt_bf*1e3:7.2f} ms  {gb_bf/dt_bf:6.1f} GB/s "
              f"{flops/dt_bf:5.1f} TF/s", flush=True)
        print(f"  int8 {dt_i8*1e3:7.2f} ms  {gb_i8/dt_i8:6.1f} GB/s "
              f"{flops/dt_i8:5.1f} TOP/s", flush=True)
        tot_bf16 += dt_bf
        tot_int8 += dt_i8
    print(f"TOTAL stacks: bf16 {tot_bf16*1e3:.2f} ms  "
          f"int8 {tot_int8*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
