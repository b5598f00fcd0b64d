"""Multi-host (multi-process) dryrun: 2 processes x 4 virtual devices run
the FULL sharded train step over a global (data, agent) mesh and agree on
the loss with each other AND with the single-process dryrun.

Parity: tools/train_ddp.py:34-110 (multi-node DDP); here GSPMD over a
jax.distributed global mesh — see tools/multihost_dryrun.py.
"""

import os
import re
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_dryrun_agrees():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    r = subprocess.run(
        [sys.executable, "-m", "quantv2x_tpu.tools.launch",
         "--nprocs", "2", "--devices_per_proc", "4", "--",
         sys.executable, "-m", "quantv2x_tpu.tools.multihost_dryrun",
         "--agent", "2"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-3000:]
    assert "2 processes agree" in r.stdout
    losses = [float(m) for m in
              re.findall(r"MULTIHOST_LOSS=([-0-9.eE]+)", r.stdout)]
    assert len(losses) == 2 and losses[0] == losses[1]

    # numerical agreement with the single-process 8-device dryrun: the
    # multi-process mesh must be arithmetically identical
    r1 = subprocess.run(
        [sys.executable, "__graft_entry__.py"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert r1.returncode == 0, r1.stdout[-2000:]
    m = re.search(r"loss=([-0-9.]+)", r1.stdout)
    assert m, r1.stdout
    assert abs(losses[0] - float(m.group(1))) < 1e-3
