"""Fused BF16 engine: table walk finds exactly the fusable blocks and the
intercepted model matches stock apply (Pallas interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from quantv2x_tpu.models.bev_backbone import ResNetBEVBackbone
from quantv2x_tpu.quant.fused_engine import (
    build_fused_engine,
    build_fused_tables,
)


def _backbone_and_vars(seed=0):
    model = ResNetBEVBackbone(
        layer_nums=(2, 2), layer_strides=(1, 2), num_filters=(16, 32),
        upsample_strides=(1, 2), num_upsample_filters=(32, 32),
    )
    x = jnp.asarray(
        np.random.default_rng(seed).normal(size=(1, 16, 24, 16))
        .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    # give BN stats non-trivial values so folding is actually exercised
    variables = jax.tree.map(
        lambda v: v + 0.05 * jnp.arange(v.size, dtype=v.dtype)
        .reshape(v.shape) / max(v.size, 1),
        variables)
    return model, variables, x


def test_table_walk_selects_only_stride1_blocks():
    model, variables, _ = _backbone_and_vars()
    tables = build_fused_tables(variables, dtype=jnp.float32)
    # stage 0: first block has no downsample only if Cin==16 matches input
    # (input C=16 -> stride1, fusable); stage 1 block0 strides (downsample,
    # not fusable), block1 fusable
    assert any("layer0_block0" in k for k in tables) \
        or any("layer0_block1" in k for k in tables)
    assert not any("layer1_block0" in k for k in tables)
    assert any("layer1_block1" in k for k in tables)
    for kind, w1, b1, w2, b2 in tables.values():
        assert kind == "basic"
        assert w1.shape[:2] == (3, 3) and w2.shape[:2] == (3, 3)
        assert b1.dtype == jnp.float32 and b2.dtype == jnp.float32


def test_fused_apply_matches_stock_eval():
    model, variables, x = _backbone_and_vars()
    tables, fused_apply = build_fused_engine(
        model, variables, h_tile=8, interpret=True, dtype=jnp.float32)
    assert tables, "no fusable blocks found"
    ref = model.apply(variables, x, train=False)
    got = fused_apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
    # and the fused path actually diverges if we corrupt a table (i.e. the
    # interceptor really runs the kernel, not the stock path)
    k = next(iter(tables))
    kind, w1, b1, w2, b2 = tables[k]
    tables2 = dict(tables)
    tables2[k] = (kind, w1, b1 + 10.0, w2, b2)
    from quantv2x_tpu.quant.fused_engine import make_fused_apply
    got2 = make_fused_apply(model, tables2, h_tile=8, interpret=True)(
        variables, x)
    assert not np.allclose(np.asarray(got2), np.asarray(ref), atol=1e-3)


def test_bottleneck_engine_matches_stock_eval():
    """ResNeXt bottleneck stacks (the flagship pyramid trunk) run through
    the fused bottleneck kernel with identical results."""
    from quantv2x_tpu.models.layers import ResNetModified

    model = ResNetModified(
        layer_nums=(2, 2), layer_strides=(1, 2), num_filters=(16, 32),
        block="bottleneck", groups=4, base_width=4,
    )
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 16, 24, 16))
        .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    variables = jax.tree.map(
        lambda v: v + 0.05 * jnp.arange(v.size, dtype=v.dtype)
        .reshape(v.shape) / max(v.size, 1),
        variables)
    tables, fused_apply = build_fused_engine(
        model, variables, h_tile=8, interpret=True, dtype=jnp.float32)
    # layer0 block0 (stride 1, Cin==Cout) + block1, layer1 block1 fusable;
    # layer1 block0 has a downsample -> excluded
    assert any("layer0_block0" in k for k in tables)
    assert not any("layer1_block0" in k for k in tables)
    kinds = {t[0] for t in tables.values()}
    assert kinds == {"bottleneck"}
    ref = model.apply(variables, x, train=False)
    got = fused_apply(variables, x)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-3, atol=2e-3)


def test_superblocks_match_blockdiag_dense():
    """Supergroup-packed grouped conv == block-diagonal dense (bit-equal),
    both through the fused bottleneck kernel and vs the XLA reference."""
    from quantv2x_tpu.ops.fused_block import (
        bottleneck_reference,
        fused_bottleneck,
    )
    from quantv2x_tpu.quant.fused_engine import (
        grouped_to_blockdiag,
        grouped_to_superblocks,
    )

    rng = np.random.default_rng(7)
    C, width, groups = 8, 256, 16         # cpg = 16 divides 128; S = 2
    cpg = width // groups
    a = lambda s: jnp.asarray(rng.normal(0, 0.1, s).astype(np.float32))
    kg = a((3, 3, cpg, width))
    dense = grouped_to_blockdiag(kg, groups)
    sb = grouped_to_superblocks(kg, groups)
    assert sb.shape == (3, 3, 2, 128, 128)
    # the dense form must round-trip through the superblocks exactly
    rebuilt = np.zeros_like(np.asarray(dense))
    for s in range(2):
        rebuilt[:, :, s * 128:(s + 1) * 128, s * 128:(s + 1) * 128] = \
            np.asarray(sb[:, :, s])
    np.testing.assert_array_equal(rebuilt, np.asarray(dense))

    x = a((1, 8, 9, C))
    w1, b1, b2 = a((C, width)), a((width,)), a((width,))
    w3, b3 = a((width, C)), a((C,))
    ref = bottleneck_reference(x, w1, b1, dense, b2, w3, b3)
    got_dense = fused_bottleneck(x, w1, b1, dense, b2, w3, b3,
                                 h_tile=4, interpret=True)
    got_sb = fused_bottleneck(x, w1, b1, sb, b2, w3, b3,
                              h_tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got_dense), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_sb), np.asarray(got_dense),
                               rtol=1e-6, atol=1e-6)
