"""Fused UMGM codebook wire kernels (Pallas TPU).

The codebook round trip (models/codebook.py — parity with the reference
UMGMQuantizer, opencood/models/sub_modules/codebook.py:330-343) is
compute-trivial (~60 GFLOP-bf16 at the 4-agent flagship grid) but, as a
chain of ~15 Dense(64,64)/gather stages over n = B*L*H*W ~ 1.4e5 per-pixel
vectors, stock XLA materializes every (n, C) intermediate in HBM: ~0.5 GB
of traffic per frame, measured at +7.0 ms/frame on the bench codebook arm
(BENCH_r03 int8_codebook_4agent_ms 25.89 vs int8_4agent_ms 18.89).

These kernels run the ENTIRE encode (all levels: latent/quant heads,
segment-wise nearest-codeword search, residual) and decode (codeword
gather + dequant/side/restore heads) chains inside VMEM, one row-tile at
a time — HBM touches only the feature tile in/out and the narrow code
ints:

  - codeword distance search = one MXU matmul per level against a
    block-diagonal (C, m*k) matrix holding every segment's codebook
    (argmin over each lane-aligned k-block);
  - codeword gather = one-hot (T, m*k) @ block-diagonal (m*k, C) stack —
    an MXU matmul, not a gather (TPU-native: the MXU is faster than
    dynamic-slice chains at k=256);
  - matmuls run in the model dtype (bf16) with f32 accumulation,
    matching the flax path (Dense(dtype=bf16) + einsum f32 acc).

Codes cross HBM as an (n, 8) int32 tile (L*m = 6 used columns, padded to
8 sublane-friendly columns); the serving wire narrows them to uint8
outside (parallel/serving.py).
"""

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def pack_codebook_params(params, seg_num: int, dict_sizes: Sequence[int],
                         channel: int):
    """Reorganize an UMGMCodebook param tree into stacked kernel operands.

    params: {"level0": {"latent_enc": {...}, ..., "codebook": (m,k,d)}, ...}
    Requires uniform dict size k across levels (the reference default
    256x3). Returns a dict of stacked arrays:
      Wle/Wqh/Wlh/Wdq/Wsd/Wrs: (L, C, C)   ble/...: (L, 1, C)
      Wd:  (L, C, m*k)  block-diag distance matrices (codebook.T blocks)
      cbn: (L, 1, m*k)  squared codeword norms
      CBs: (L, m*k, C)  block-diag codeword stacks (gather matrices)
    Missing heads on the last level (latent/side) are zero-filled — the
    kernels skip them statically.
    """
    L = len(dict_sizes)
    k = dict_sizes[0]
    assert all(kk == k for kk in dict_sizes), dict_sizes
    C, m = channel, seg_num
    d = C // m

    def head(i, name):
        lvl = params[f"level{i}"]
        if name in lvl:
            return lvl[name]["kernel"], lvl[name]["bias"]
        return jnp.zeros((C, C)), jnp.zeros((C,))

    out = {}
    for nm, key in (("le", "latent_enc"), ("qh", "quant_head"),
                    ("lh", "latent_head"), ("dq", "dequant_head"),
                    ("sd", "side_head"), ("rs", "restore_head")):
        ws, bs = zip(*(head(i, key) for i in range(L)))
        out[f"W{nm}"] = jnp.stack(ws).astype(jnp.float32)
        out[f"b{nm}"] = jnp.stack(bs).astype(jnp.float32)[:, None, :]
    Wd = jnp.zeros((L, C, m * k), jnp.float32)
    CBs = jnp.zeros((L, m * k, C), jnp.float32)
    cbn = jnp.zeros((L, 1, m * k), jnp.float32)
    for i in range(L):
        cb = params[f"level{i}"]["codebook"].astype(jnp.float32)  # (m,k,d)
        for s in range(m):
            Wd = Wd.at[i, s * d:(s + 1) * d, s * k:(s + 1) * k].set(
                cb[s].T)
            CBs = CBs.at[i, s * k:(s + 1) * k, s * d:(s + 1) * d].set(cb[s])
            cbn = cbn.at[i, 0, s * k:(s + 1) * k].set((cb[s] ** 2).sum(-1))
    out.update(Wd=Wd, cbn=cbn, CBs=CBs)
    return out


def _mm(a, b, dtype):
    """Matmul in compute dtype with f32 accumulation (flax Dense parity)."""
    return jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _argmin_first(blk, k):
    """First-occurrence argmin over the last (lane) axis of (T, k)."""
    mn = jnp.min(blk, axis=-1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1)
    return jnp.min(jnp.where(blk <= mn, iota, k), axis=-1)


def _encode_kernel(x_ref, Wle, ble, Wqh, bqh, Wlh, blh, Wd, cbn, CBs,
                   codes_ref, *, L, m, k, cdt):
    h = x_ref[:]
    cols = []
    for i in range(L):
        z = _mm(h, Wle[i], cdt) + ble[i]
        q = _mm(z, Wqh[i], cdt) + bqh[i]
        dist = cbn[i] - 2.0 * _mm(q, Wd[i], cdt)        # (T, m*k)
        ohs = []
        for s in range(m):
            blk = dist[:, s * k:(s + 1) * k]
            code = _argmin_first(blk, k)                 # (T,)
            cols.append(code)
            if i < L - 1:
                iota = jax.lax.broadcasted_iota(
                    jnp.int32, (blk.shape[0], k), 1)
                ohs.append((iota == code[:, None]).astype(cdt))
        if i < L - 1:
            oh = jnp.concatenate(ohs, axis=-1)           # (T, m*k)
            deq = _mm(oh, CBs[i], cdt)                   # (T, C)
            z2 = _mm(z, Wlh[i], cdt) + blh[i]
            h = (z2 - deq).astype(x_ref.dtype)
    codes = jnp.stack(cols, axis=-1)                     # (T, L*m)
    pad = codes_ref.shape[-1] - codes.shape[-1]
    codes_ref[:] = jnp.pad(codes, ((0, 0), (0, pad)))


def _decode_kernel(codes_ref, Wdq, bdq, Wsd, bsd, Wrs, brs, CBs, out_ref,
                   *, L, m, k, cdt):
    codes = codes_ref[:]
    former = None
    for i in reversed(range(L)):
        ohs = []
        for s in range(m):
            code = codes[:, i * m + s]
            iota = jax.lax.broadcasted_iota(
                jnp.int32, (codes.shape[0], k), 1)
            ohs.append((iota == code[:, None]).astype(cdt))
        oh = jnp.concatenate(ohs, axis=-1)               # (T, m*k)
        q = _mm(oh, CBs[i], cdt)                         # (T, C)
        x = _mm(q, Wdq[i], cdt) + bdq[i]
        if former is not None and i < L - 1:
            x = x + _mm(former, Wsd[i], cdt) + bsd[i]
        former = _mm(x, Wrs[i], cdt) + brs[i]
    out_ref[:] = former.astype(out_ref.dtype)


def _code_cols(L, m):
    """int32 code columns padded to a multiple-of-8 sublane tile
    (default 2x3 wire uses 6 -> 8; seg_num/levels sweeps can exceed
    8, e.g. 4x3 = 12 -> 16)."""
    return _round_up(L * m, 8)


@functools.partial(
    jax.jit,
    static_argnames=("seg_num", "dict_sizes", "dtype", "tile", "interpret"))
def fused_codebook_encode(packed, x, seg_num: int, dict_sizes,
                          dtype=jnp.bfloat16, tile: int = 512,
                          interpret: bool = False):
    """x: (n, C) features -> (n, L, m) int32 codes. One fused kernel."""
    L, k = len(dict_sizes), dict_sizes[0]
    m = seg_num
    n, C = x.shape
    npad = _round_up(max(n, 1), tile)
    xp = jnp.pad(x, ((0, npad - n), (0, 0)))
    grid = (npad // tile,)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    w_names = ("Wle", "ble", "Wqh", "bqh", "Wlh", "blh", "Wd", "cbn", "CBs")
    codes = pl.pallas_call(
        functools.partial(_encode_kernel, L=L, m=m, k=k, cdt=dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((tile, C), lambda i: (i, 0))]
        + [full(packed[nm]) for nm in w_names],
        out_specs=pl.BlockSpec((tile, _code_cols(L, m)), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, _code_cols(L, m)), jnp.int32),
        interpret=interpret,
    )(xp, *[packed[nm] for nm in w_names])
    return codes[:n, :L * m].reshape(n, L, m)


@functools.partial(
    jax.jit,
    static_argnames=("seg_num", "dict_sizes", "channel", "dtype", "tile",
                     "interpret"))
def fused_codebook_decode(packed, codes, seg_num: int, dict_sizes,
                          channel: int, dtype=jnp.bfloat16, tile: int = 512,
                          interpret: bool = False):
    """codes: (n, L, m) ints -> (n, C) restored features. One fused kernel."""
    L, k = len(dict_sizes), dict_sizes[0]
    m = seg_num
    C = channel
    n = codes.shape[0]
    flat = codes.reshape(n, L * m).astype(jnp.int32)
    npad = _round_up(max(n, 1), tile)
    cp = jnp.pad(flat, ((0, npad - n), (0, _code_cols(L, m) - L * m)))
    grid = (npad // tile,)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    w_names = ("Wdq", "bdq", "Wsd", "bsd", "Wrs", "brs", "CBs")
    out = pl.pallas_call(
        functools.partial(_decode_kernel, L=L, m=m, k=k, cdt=dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((tile, _code_cols(L, m)), lambda i: (i, 0))]
        + [full(packed[nm]) for nm in w_names],
        out_specs=pl.BlockSpec((tile, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((npad, C), dtype),
        interpret=interpret,
    )(cp, *[packed[nm] for nm in w_names])
    return out[:n]
