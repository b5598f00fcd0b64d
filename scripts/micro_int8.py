"""Microbenchmark on the real chip: int8 MXU rate + roll strategies.

Decides the int8 fused-block kernel design (VERDICT item 1):
  1. Pallas int8 matmul (int32 accum) vs bf16 matmul rate at block sizes.
  2. pltpu.roll on int8: native vs int32-cast round trip vs f32.
Run: timeout 600 python scripts/micro_int8.py
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=20):
    out = jax.block_until_ready(fn(*args))  # compile
    # chain executions inside one jit to beat tunnel overhead
    ts = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.time() - t0) / n)
    return min(ts)


def matmul_kernel(x_ref, w_ref, o_ref, acc_ref, *, out_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc_ref.dtype,
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "tk"))
def pallas_mm(x, w, tm=256, tn=256, tk=256):
    M, K = x.shape
    _, N = w.shape
    acc_dtype = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
    return pl.pallas_call(
        functools.partial(matmul_kernel, out_dtype=x.dtype),
        grid=(M // tm, N // tn, K // tk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), acc_dtype)],
    )(x, w)


def bench_matmul():
    key = jax.random.PRNGKey(0)
    for M, K, N in [(2048, 2048, 2048), (4096, 1024, 1024)]:
        flops = 2 * M * K * N
        xb = jax.random.normal(key, (M, K), jnp.bfloat16)
        wb = jax.random.normal(key, (K, N), jnp.bfloat16)
        dt = timeit(pallas_mm, xb, wb)
        print(f"bf16 {M}x{K}x{N}: {dt*1e3:.2f} ms  {flops/dt/1e12:.1f} TF/s",
              flush=True)
        xi = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
        wi = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
        try:
            dt = timeit(pallas_mm, xi, wi)
            print(f"int8 {M}x{K}x{N}: {dt*1e3:.2f} ms  "
                  f"{flops/dt/1e12:.1f} TOP/s", flush=True)
        except Exception as e:
            print(f"int8 {M}x{K}x{N}: FAILED {type(e).__name__}: {e}",
                  flush=True)


# --- roll strategies on a (rows, W, C) tile --------------------------------

def _mk_roll_kernel(mode):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        acc = jnp.zeros(x.shape, jnp.int32)
        for _ in range(8):          # amortize: 8 rolls per call
            if mode == "native":
                x = pltpu.roll(x, 1, axis=1)
            elif mode == "i32":
                x = pltpu.roll(x.astype(jnp.int32), 1,
                               axis=1).astype(jnp.int8)
            elif mode == "bitcast":
                x32 = pltpu.bitcast(x, jnp.int32)
                x = pltpu.bitcast(pltpu.roll(x32, 1, axis=1), jnp.int8)
            acc = acc + x.astype(jnp.int32)
        o_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def roll_bench(x, mode):
    return pl.pallas_call(
        _mk_roll_kernel(mode),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
    )(x)


def bench_rolls():
    key = jax.random.PRNGKey(1)
    x = jax.random.randint(key, (24, 360, 128), -127, 127, jnp.int8)
    xf = jax.random.normal(key, (16, 360, 128), jnp.float32)
    for mode in ["native", "i32", "bitcast"]:
        try:
            ref = roll_bench(x, "i32")
            got = roll_bench(x, mode)
            ok = bool(jnp.array_equal(ref, got))
            dt = timeit(lambda: roll_bench(x, mode))
            print(f"roll[{mode}]: {dt*1e6:.0f} us/call (8 rolls)  "
                  f"match_i32={ok}", flush=True)
        except Exception as e:
            print(f"roll[{mode}]: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # f32 roll for comparison
    def f32_kernel(x_ref, o_ref):
        x = x_ref[:]
        acc = jnp.zeros(x.shape, jnp.float32)
        for _ in range(8):
            x = pltpu.roll(x, 1, axis=1)
            acc = acc + x
        o_ref[:] = acc

    f32_roll = jax.jit(lambda x: pl.pallas_call(
        f32_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
    )(x))
    dt = timeit(f32_roll, xf)
    print(f"roll[f32 native]: {dt*1e6:.0f} us/call (8 rolls)", flush=True)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    bench_matmul()
    bench_rolls()
