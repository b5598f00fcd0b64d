"""Model profiling: params, FLOPs, throughput (parity: tools/profiler/).

Parity: params_calc.py:29-79 — fvcore FLOP count + naive and event-timed
throughput. TPU-native: FLOPs come from XLA's own cost analysis of the
compiled executable; throughput from steady-state wall clock; parameter and
activation bytes from the pytrees.

    python -m quantv2x_tpu.tools.profiler -y configs/... [--max_cav 2]
"""

import argparse
import json
import time

import jax
import numpy as np


def count_params(params):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def param_bytes(params):
    return sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in jax.tree.leaves(params)
    )


def xla_flops(jitted_fn, *args):
    """FLOP estimate from XLA cost analysis of the lowered computation."""
    try:
        lowered = jitted_fn.lower(*args)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception:
        return float("nan")


def profile_model(model, variables, batch, iters: int = 20):
    fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
    flops = xla_flops(fwd, variables, batch)
    out = jax.block_until_ready(fwd(variables, batch))
    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fwd(variables, batch))
    dt = (time.time() - t0) / iters
    return {
        "params": count_params(variables["params"]),
        "param_mb": round(param_bytes(variables["params"]) / 2 ** 20, 2),
        "flops_g": round(flops / 1e9, 2) if np.isfinite(flops) else None,
        "latency_ms": round(dt * 1e3, 2),
        "fps": round(1 / dt, 2),
    }


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-y", "--hypes", required=True)
    ap.add_argument("--max_cav", type=int, default=2)
    args = ap.parse_args()

    import dataclasses
    from quantv2x_tpu.config.hypes import load_hypes
    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.models.collab_model import PyramidCollabModel

    hypes = load_hypes(args.hypes)
    mcfg = dataclasses.replace(hypes.model, max_cav=args.max_cav)
    model = PyramidCollabModel(mcfg)
    frame = make_frame(SyntheticCfg(
        lidar_range=hypes.voxel.lidar_range, num_agents=args.max_cav,
        num_objects=12, points_per_agent=20000, seed=0,
    ))
    batch = frame_to_batch(frame, hypes.voxel, max_cav=args.max_cav)
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, train=False)
    )(batch)
    print(json.dumps(profile_model(model, variables, batch), indent=2))


if __name__ == "__main__":
    main()
