"""Multi-process launcher (torch.distributed.launch analogue,
tools/train_ddp.py:16).

    python -m quantv2x_tpu.tools.launch --nprocs 2 --devices_per_proc 4 -- \
        python -m quantv2x_tpu.tools.multihost_dryrun --agent 2

Spawns N copies of the command with the QV2X_* rendezvous env vars
(consumed by parallel/sharding.init_distributed) and, for CPU simulation,
JAX_PLATFORMS=cpu + xla_force_host_platform_device_count so each process
exposes `devices_per_proc` virtual chips. On real multi-host TPU pods,
drop --devices_per_proc and set --platform tpu: each process binds its
local chips and jax.distributed assembles the global topology.

When the workers print MULTIHOST_LOSS=<x> lines, the launcher verifies
they agree (replicated state => every process must compute the same loss).
"""

import argparse
import os
import re
import socket
import subprocess
import sys


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch(cmd, nprocs: int, devices_per_proc: int = 0,
           platform: str = "cpu", timeout: int = 900):
    coord = f"127.0.0.1:{free_port()}"
    procs = []
    for pid in range(nprocs):
        env = dict(os.environ)
        env["QV2X_COORDINATOR"] = coord
        env["QV2X_NUM_PROCESSES"] = str(nprocs)
        env["QV2X_PROCESS_ID"] = str(pid)
        if platform:
            # workers switch via jax.config (the axon sitecustomize
            # preimport ignores the env var); exported for reference
            env["JAX_PLATFORMS"] = platform
            env["QV2X_PLATFORM"] = platform
        if devices_per_proc:
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count"
                f"={devices_per_proc}")
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    rc = 0
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            rc = rc or 124
        outs.append(out)
        rc = rc or p.returncode
        for line in out.splitlines():
            print(f"[launch:{pid}] {line}")
    losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_LOSS=([-0-9.eE]+)", out)
        if m:
            losses.append(float(m.group(1)))
    if losses:
        if len(losses) != nprocs:
            print(f"[launch] only {len(losses)}/{nprocs} workers reported "
                  "a loss", file=sys.stderr)
            rc = rc or 1
        elif max(losses) - min(losses) > 1e-6 * max(1.0, abs(losses[0])):
            print(f"[launch] loss mismatch across processes: {losses}",
                  file=sys.stderr)
            rc = rc or 1
        else:
            print(f"[launch] {nprocs} processes agree: loss={losses[0]:.6f}")
    return rc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--devices_per_proc", type=int, default=4)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- worker command")
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("missing worker command after --")
    sys.exit(launch(cmd, args.nprocs, args.devices_per_proc,
                    args.platform, args.timeout))


if __name__ == "__main__":
    main()
