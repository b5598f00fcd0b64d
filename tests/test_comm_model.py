"""ICI collective cost model (tools/comm_model.py)."""

from quantv2x_tpu.tools.comm_model import model


def test_bytes_exact_flagship():
    out = model(h=100, w=352, channel=64, seg=2, levels=3, lane_bits=8,
                entropy_bits=48, chips=4, step_ms=18.9, ici_gbps=400.0,
                param_mb=21.0)
    # 100*352 px * 3 levels * 2 seg * 1 byte
    assert out["codes_kb_per_agent"] == round(100 * 352 * 6 / 1024, 1)
    assert out["bf16_feature_kb_per_agent"] == round(
        100 * 352 * 64 * 2 / 1024, 1)
    # codebook wire is ~21x cheaper on the gather than bf16 features
    assert out["agent_allgather_codes_ms"] * 20 < \
        out["agent_allgather_bf16_ms"]
    # both projected efficiencies clear the >=80% scaling gate
    assert out["projected_scaling_efficiency_serve"] > 0.99
    assert out["projected_scaling_efficiency_train"] > 0.9


def test_allreduce_scales_with_chips():
    a = model(100, 352, 64, 2, 3, 8, 48, chips=2, step_ms=0.0,
              ici_gbps=400.0, param_mb=21.0)
    b = model(100, 352, 64, 2, 3, 8, 48, chips=8, step_ms=0.0,
              ici_gbps=400.0, param_mb=21.0)
    # ring all-reduce cost 2(N-1)/N * S/W grows toward 2 S/W
    assert a["dp_grad_allreduce_ms"] < b["dp_grad_allreduce_ms"] < \
        2.1 * a["dp_grad_allreduce_ms"]
