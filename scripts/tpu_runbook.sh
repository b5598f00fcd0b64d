#!/bin/bash
# TPU measurement queue — run when the axon tunnel is healthy.
# Discipline (BASELINE.md / .claude/skills/verify): one TPU process at a
# time, everything under timeout, scan-chain timing only.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_runbook_$(date +%H%M).log}
echo "== tpu runbook -> $LOG"

probe() {
  timeout 240 python -c "
import jax, jax.numpy as jnp, time
t0=time.time()
x = jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))
print('probe ok', round(time.time()-t0,1), 's')"
}

probe >>"$LOG" 2>&1 || { echo "tunnel down, aborting" | tee -a "$LOG"; exit 1; }

echo "== bench.py (headline)" | tee -a "$LOG"
timeout 2400 python bench.py >>"$LOG" 2>&1
sleep 30

echo "== proj_first A/B" | tee -a "$LOG"
timeout 2400 python scripts/bench_proj_first.py >>"$LOG" 2>&1

echo "done; results in $LOG"
tail -20 "$LOG"
