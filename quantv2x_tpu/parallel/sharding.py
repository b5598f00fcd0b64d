"""Multi-chip mapping: device mesh, shardings, and the agent->chip layout.

Replaces the reference's NCCL DDP (tools/train_ddp.py:34-110,
tools/multi_gpu_utils.py:16-38) and its codebook broadcast/barrier
(codebook.py:102-104,353-356) with GSPMD: a named Mesh + NamedSharding
annotations; XLA inserts the all-reduce/all-gather collectives over ICI.

Mesh axes:
  data  — batch (frames) data parallelism; gradients all-reduce over it.
  agent — the V2X dimension: each collaborating agent's encoder runs on its
          own chip slice; the fusion step's gather of BEV features across
          the agent axis is the on-TPU analogue of V2X communication
          (BASELINE.json north star).

For B frames x L agents on D chips: shard (B, L, ...) inputs as
P("data", "agent") — per-agent encoder compute is fully parallel, and the
weighted fusion induces an all-gather of the (compressed) BEV maps along
"agent", which XLA schedules over ICI against encoder compute.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_agent: int = 1, devices=None):
    """Build a (data, agent) mesh from available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_agent
    assert n_data * n_agent <= n, f"need {n_data * n_agent} devices, have {n}"
    arr = np.asarray(devices[: n_data * n_agent]).reshape(n_data, n_agent)
    return Mesh(arr, axis_names=("data", "agent"))


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host runtime init (replaces the reference's
    torch.distributed init, multi_gpu_utils.py:16-38).

    Env-var driven like the reference's env:// scheme: falls back to
    QV2X_COORDINATOR / QV2X_NUM_PROCESSES / QV2X_PROCESS_ID (set by
    tools/launch.py). No-op when single-process (coordinator unset)."""
    import os
    coordinator = coordinator or os.environ.get("QV2X_COORDINATOR")
    if not coordinator:
        return False
    num_processes = int(num_processes
                        or os.environ.get("QV2X_NUM_PROCESSES", "1"))
    process_id = int(process_id
                     if process_id is not None
                     else os.environ.get("QV2X_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def make_multihost_mesh(n_agent: int = 1):
    """(data, agent) mesh over ALL global devices of a multi-process run.

    Layout rule (scaling-book recipe): the agent axis — whose fusion
    all-gather is the latency-critical collective — stays INSIDE a host
    (ICI); the data axis spans hosts, so its gradient all-reduce is the
    only DCN traffic. jax.devices() orders devices process-major, so
    reshaping (n_hosts, per_host) puts hosts on the leading (data) axis.
    """
    devices = jax.devices()
    per_host = len(jax.local_devices())
    n_hosts = jax.process_count()
    assert per_host % n_agent == 0, \
        f"agent axis {n_agent} must divide per-host devices {per_host}"
    arr = np.asarray(devices).reshape(n_hosts * (per_host // n_agent),
                                      n_agent)
    return Mesh(arr, axis_names=("data", "agent"))


def make_global_batch(mesh: Mesh, batch):
    """Multi-process version of shard_batch: every process holds the SAME
    full numpy batch; each contributes its addressable shards."""
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if k in ("gt_boxes", "gt_classes", "gt_mask") or v.ndim < 2 \
                or k == "pairwise_t_matrix":
            spec = P("data")
        else:
            spec = P("data", "agent")
        sharding = NamedSharding(mesh, spec)
        out[k] = jax.make_array_from_callback(
            v.shape, sharding, lambda idx, v=v: v[idx])
    return out


def shard_batch(mesh: Mesh, batch):
    """Place a batch dict onto the mesh with (data, agent) sharding."""
    out = {}
    for k, v in batch.items():
        if k in ("gt_boxes", "gt_classes", "gt_mask") or v.ndim < 2:
            spec = P("data")
        elif k == "pairwise_t_matrix":
            # (B, L, L, 4, 4): both L axes participate in fusion; keep agent
            # axis replicated to avoid resharding inside the warp
            spec = P("data")
        else:
            spec = P("data", "agent")
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params) across the mesh."""
    return jax.device_put(
        tree, NamedSharding(mesh, P())
    )
