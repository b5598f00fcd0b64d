"""Serialized engine artifacts: the TensorRT .plan file analogue.

The reference's deployment flow ends in a serialized engine on disk
(tools/build_trt_int8.py:46-405 -> INT8 .plan; build_trt_fp32.py ->
FP32 .plan) that a serving process later loads without the model code.
The XLA-native equivalent is `jax.export`: the jitted inference program
(optionally with the fused-block or int8 engine transforms applied) is
lowered to versioned StableHLO and serialized together with its
calling convention; `load_engine` restores a callable without
rebuilding or re-tracing the flax model.

Artifacts are portable across processes and JAX minor versions
(StableHLO compatibility guarantees) and are compiled for the target
platform at load time — params are baked in as constants, like weights
inside a .plan.

    # build + save
    python -m quantv2x_tpu.tools.engine_export -y configs/... \
        --run_dir runs/exp --out engine.qv2x [--engine fused|int8|stock]

    # load + run (no model code needed)
    from quantv2x_tpu.tools.engine_export import load_engine
    step = load_engine("engine.qv2x")
    out = step(batch)
"""

import argparse
import json
import time


def export_engine(apply_fn, variables, example_batch, path: str,
                  meta: dict | None = None) -> int:
    """Serialize jit(apply_fn(variables, batch)) with params baked in.

    Returns the artifact size in bytes. The saved program takes ONE
    argument (the batch dict); `variables` are closed over as constants
    (weights-in-the-engine, like TensorRT).
    """
    import jax
    from jax import export as jexport

    def infer(batch):
        return apply_fn(variables, batch)

    exported = jexport.export(jax.jit(infer))(example_batch)
    blob = exported.serialize()
    header = json.dumps(meta or {}).encode()
    with open(path, "wb") as f:
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(blob)
    return len(blob)


def load_engine(path: str):
    """Load a serialized engine -> callable(batch). Also returns metadata
    via the .meta attribute."""
    from jax import export as jexport

    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(n).decode() or "{}")
        blob = f.read()
    exported = jexport.deserialize(blob)

    def step(batch):
        return exported.call(batch)

    step.meta = meta
    return step


def main():
    from quantv2x_tpu.utils.runtime import enable_compile_cache
    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-y", "--hypes", required=True)
    ap.add_argument("--run_dir", default=None)
    ap.add_argument("--out", default="engine.qv2x")
    ap.add_argument("--engine", default="fused",
                    choices=["stock", "fused", "int8"])
    ap.add_argument("--max_cav", type=int, default=2)
    args = ap.parse_args()

    import dataclasses

    import jax

    from quantv2x_tpu.config.hypes import load_hypes
    from quantv2x_tpu.data.pipeline import frame_to_batch
    from quantv2x_tpu.data.synthetic import SyntheticCfg, make_frame
    from quantv2x_tpu.models.registry import create_model
    from quantv2x_tpu.train import checkpoint as ckpt
    from quantv2x_tpu.train.trainer import OptimCfg, create_train_state

    hypes = load_hypes(args.hypes)
    hypes = dataclasses.replace(
        hypes, model=dataclasses.replace(hypes.model, max_cav=args.max_cav))
    model, _ = create_model(hypes)
    batch = frame_to_batch(
        make_frame(SyntheticCfg(lidar_range=hypes.voxel.lidar_range,
                                num_agents=args.max_cav, num_objects=8,
                                points_per_agent=20000, seed=0)),
        hypes.voxel, max_cav=args.max_cav)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), batch,
                                  OptimCfg())
    if args.run_dir:
        state, ep = ckpt.restore_checkpoint(args.run_dir, state)
        print(f"[export] loaded epoch {ep}")
    variables = {"params": state.params, "batch_stats": state.batch_stats,
                 **dict(state.extra_vars)}

    if args.engine == "fused":
        from quantv2x_tpu.quant.fused_engine import build_fused_engine
        _, apply_fn = build_fused_engine(model, variables, h_tile=16,
                                         min_channels=0)
    elif args.engine == "int8":
        from quantv2x_tpu.quant.int8_engine import build_int8_engine
        _, apply_fn = build_int8_engine(model, variables, [batch])
    else:
        def apply_fn(v, b):
            return model.apply(v, b, train=False)

    t0 = time.time()
    size = export_engine(apply_fn, variables, batch, args.out,
                         meta={"engine": args.engine,
                               "hypes": args.hypes,
                               "grid": list(hypes.voxel.grid_size),
                               "max_cav": args.max_cav})
    print(json.dumps({"out": args.out, "engine": args.engine,
                      "bytes": size, "export_s": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
