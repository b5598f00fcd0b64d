"""Multi-host worker: jax.distributed train step over a (data, agent) mesh
spanning processes. One process per "host"; run via tools/launch.py:

    python -m quantv2x_tpu.tools.launch --nprocs 2 --devices_per_proc 4 -- \
        python -m quantv2x_tpu.tools.multihost_dryrun --agent 2

Parity: the reference's multi-node DDP entry (tools/train_ddp.py:34-110,
torch.distributed env:// rank discovery at multi_gpu_utils.py:16-38). The
TPU-native design: GSPMD over a global mesh — the agent-fusion all-gather
stays on intra-host ICI, only the data-axis gradient all-reduce crosses
hosts (DCN) — instead of NCCL process groups.

Each process prints the (replicated) loss; launch.py asserts they agree —
the multi-process analogue of the single-host dryrun_multichip check.
"""

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--agent", type=int, default=2)
    ap.add_argument("--steps", type=int, default=1)
    args = ap.parse_args()

    import jax

    # the axon sitecustomize preimports jax pinned to the tunnel platform;
    # env vars are too late — switch via config BEFORE backend init (the
    # launcher's XLA_FLAGS device-count export is still honored because
    # XLA flags are read lazily at backend init)
    jax.config.update("jax_platforms",
                      os.environ.get("QV2X_PLATFORM", "cpu"))

    from quantv2x_tpu.parallel.sharding import (init_distributed,
                                                make_global_batch,
                                                make_multihost_mesh)

    if not init_distributed():
        print("[multihost_dryrun] QV2X_COORDINATOR not set — use "
              "tools/launch.py", file=sys.stderr)
        sys.exit(2)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from quantv2x_tpu.data import anchors as anc
    from quantv2x_tpu.loss.detection_loss import LossCfg
    from quantv2x_tpu.train.trainer import (OptimCfg, create_train_state,
                                            make_train_step)

    pid, nproc = jax.process_index(), jax.process_count()
    mesh = make_multihost_mesh(n_agent=args.agent)
    n_data = mesh.devices.shape[0]
    print(f"[proc {pid}/{nproc}] global devices={len(jax.devices())} "
          f"mesh=data{n_data} x agent{args.agent}", flush=True)

    model, mcfg, acfg, batch = ge._build(max_cav=2)
    batch = jax.tree.map(lambda x: np.concatenate([np.asarray(x)] * n_data,
                                                  axis=0), batch)

    state, tx = create_train_state(
        model, jax.random.PRNGKey(0),
        jax.tree.map(jnp.asarray, batch),
        OptimCfg(steps_per_epoch=10))
    anchor_pack = anc.generate_anchors(acfg)
    step = make_train_step(model, tx, anchor_pack, LossCfg())

    import time

    with jax.set_mesh(mesh):
        gbatch = make_global_batch(mesh, batch)
        state = jax.device_put(state, NamedSharding(mesh, P()))
        step_c = jax.jit(step)
        state, metrics = step_c(state, gbatch)           # compile + step 0
        total = float(metrics["total_loss"])
        t0 = time.time()
        for _ in range(max(args.steps - 1, 0)):
            state, metrics = step_c(state, gbatch)
            total = float(metrics["total_loss"])
        dt = time.time() - t0
    assert np.isfinite(total), f"non-finite loss {total}"
    if args.steps > 1:
        fps = n_data * (args.steps - 1) / max(dt, 1e-9)
        print(f"[proc {pid}] MULTIHOST_FPS={fps:.2f}", flush=True)
    # loss printed LAST after all steps — identical across processes
    # because state/collectives are deterministic and replicated
    print(f"[proc {pid}] MULTIHOST_LOSS={total:.6f}", flush=True)


if __name__ == "__main__":
    main()
