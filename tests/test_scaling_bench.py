"""Scaling benchmark harness: sharded train step runs at several device
counts (mechanism test on virtual CPU devices; real gate numbers need a
multi-chip slice). Parity: tools/profiler/traintp_calc.py + BASELINE
scaling gate."""

import quantv2x_tpu.tools.scaling_bench as sb


def test_build_step_runs_at_multiple_device_counts():
    sb.n_steps_global = 2
    for n in (1, 2, 4):
        sec, frames, loss = sb.build_step(n, grid_m=12.8, max_cav=2)
        assert sec > 0
        assert frames == n          # weak scaling: one frame per data slot
        assert loss == loss         # finite
