"""UMGM multi-stage residual multi-codebook VQ compressor (flax).

The learned-codebook compressor for the inter-agent BEV feature wire —
behavioral parity with the reference UMGMQuantizer
(/root/reference/opencood/models/sub_modules/codebook.py:16-418):

  - L levels of residual quantization; each level splits the C-dim vector
    into m segments quantized against its own k-entry codebook of dim C/m;
  - per-level heads: latentStageEncoder, quantizationHead, (latentHead,
    sideHead for non-last levels), dequantizationHead, restoreHead — all
    Dense(C, C) (heter_pyramid_collab_codebook_mc.py:38-51);
  - training path: Gumbel-softmax straight-through sampling with a learned,
    lower-bounded per-segment temperature (codebook.py:146-183);
  - EMA code-usage tracking + dead-code reassignment (codebook.py:75-100,
    353-368) — freq EMA lives in the "codebook_stats" variable collection;
    reassignment is a functional transform applied between epochs;
  - wire format: codes are (n, L, m) integers; bits/vector =
    L * m * ceil(log2(k)).

The reference's ``syncCodebook`` (dist.broadcast) is unnecessary here:
under GSPMD the codebook parameters are replicated across the mesh by
sharding annotation, so every chip already holds identical codebooks.
"""

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

EPS = 1e-7


def gumbel_softmax_st(logits, temperature, rng):
    """Straight-through Gumbel-softmax (parity: codebook_utils.gumbelSoftmax)."""
    g = jax.random.gumbel(rng, logits.shape, logits.dtype)
    y_soft = jax.nn.softmax((logits + g) / temperature, axis=-1)
    idx = jnp.argmax(y_soft, axis=-1)
    y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=logits.dtype)
    return y_hard + y_soft - jax.lax.stop_gradient(y_soft)


def soft_roundtrip_pure(params, seg_num, dict_sizes, x, rng, valid, dtype):
    """Gumbel soft round-trip as a pure function of the UMGMCodebook param
    tree — the numerical twin of the flax submodule path (kept for init),
    callable inside jax.lax.map + jax.checkpoint (flax scope reads are not
    allowed inside jax control flow, so the chunked train forward needs a
    scope-free implementation).

    Returns (restored (n, C), codes (n, L, m) int32, masked sq-err sum,
    per-level usage counts [(m, k)]). ``valid`` masks padded rows out of
    samples/counts/loss.
    """
    L = len(dict_sizes)
    m = seg_num

    def dense(h, lvlp, name):
        W = lvlp[name]["kernel"].astype(dtype)
        b = lvlp[name]["bias"].astype(dtype)
        return h.astype(dtype) @ W + b

    n = x.shape[0]
    vmask = valid[:, None, None]
    samples, codes = [], []
    h = x
    for i, k in enumerate(dict_sizes):
        lvlp = params[f"level{i}"]
        cb = lvlp["codebook"]                       # (m, k, d) f32
        is_last = i == L - 1
        z = dense(h, lvlp, "latent_enc")
        q = dense(z, lvlp, "quant_head")
        xs = q.reshape(n, m, -1)
        x2 = (xs ** 2).sum(-1, keepdims=True)
        c2 = (cb ** 2).sum(-1)
        inter = jnp.einsum("nmd,mkd->nmk", xs, cb,
                           preferred_element_type=jnp.float32)
        dist = x2 + c2[None] - 2 * inter
        logit = -dist / math.sqrt(k)
        temp = jnp.maximum(lvlp["temperature"], EPS)
        sample = gumbel_softmax_st(logit * temp, 1.0,
                                   jax.random.fold_in(rng, i))
        sample = sample * vmask.astype(sample.dtype)
        code = jnp.argmax(logit, axis=-1)
        samples.append(sample)
        codes.append(code)
        if not is_last:
            z2 = dense(z, lvlp, "latent_head")
            deq = jnp.einsum("nmk,mkd->nmd", sample, cb,
                             preferred_element_type=jnp.float32
                             ).reshape(n, -1)
            h = z2 - deq
    former = None
    for i in reversed(range(L)):
        lvlp = params[f"level{i}"]
        cb = lvlp["codebook"]
        q_vec = jnp.einsum("nmk,mkd->nmd", samples[i], cb,
                           preferred_element_type=jnp.float32).reshape(n, -1)
        y = dense(q_vec, lvlp, "dequant_head")
        if former is not None and i < L - 1:
            y = y + dense(former, lvlp, "side_head")
        former = dense(y, lvlp, "restore_head")
    vm = valid[:, None].astype(jnp.float32)
    sq = ((former.astype(jnp.float32)
           - jax.lax.stop_gradient(x).astype(jnp.float32)) ** 2 * vm).sum()
    counts = [s.sum(0) for s in samples]
    return former, jnp.stack(codes, axis=1).astype(jnp.int32), sq, counts


class _LevelQuantizer(nn.Module):
    """One residual level: encode heads + m-segment codebook + decode heads."""
    channel: int
    m: int
    k: int
    is_last: bool
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        C, m, k = self.channel, self.m, self.k
        d = C // m
        self.latent_enc = nn.Dense(C, dtype=self.dtype, name="latent_enc")
        self.quant_head = nn.Dense(C, dtype=self.dtype, name="quant_head")
        self.dequant_head = nn.Dense(C, dtype=self.dtype, name="dequant_head")
        self.restore_head = nn.Dense(C, dtype=self.dtype, name="restore_head")
        if not self.is_last:
            self.latent_head = nn.Dense(C, dtype=self.dtype, name="latent_head")
            self.side_head = nn.Dense(C, dtype=self.dtype, name="side_head")
        # SmallInit (codebook.py:315-317)
        self.codebook = self.param(
            "codebook",
            lambda rng: jax.random.normal(rng, (m, k, d))
            * math.sqrt(2 / (5 * d)),
        )
        self.log_temp = self.param(
            "temperature", nn.initializers.ones, (m, 1)
        )

    def _distance(self, x):
        """x: (n, C) -> (n, m, k) squared distances to codewords."""
        n = x.shape[0]
        xs = x.reshape(n, self.m, -1)
        x2 = (xs ** 2).sum(-1, keepdims=True)               # (n, m, 1)
        c2 = (self.codebook ** 2).sum(-1)                   # (m, k)
        inter = jnp.einsum("nmd,mkd->nmk", xs, self.codebook,
                           preferred_element_type=jnp.float32)
        return x2 + c2[None] - 2 * inter

    def _dequant_code(self, code):
        """code: (n, m) -> (n, C)."""
        gathered = jnp.take_along_axis(
            self.codebook[None], code[:, :, None, None], axis=2
        )[:, :, 0]                                          # (n, m, d)
        return gathered.reshape(code.shape[0], -1)

    def _dequant_soft(self, onehot):
        """onehot: (n, m, k) -> (n, C)."""
        return jnp.einsum("nmk,mkd->nmd", onehot, self.codebook,
                          preferred_element_type=jnp.float32).reshape(
            onehot.shape[0], -1
        )

    def encode(self, x):
        """Hard path: x -> (residual or None, code (n, m))."""
        z = self.latent_enc(x)
        code = jnp.argmin(self._distance(self.quant_head(z)), axis=-1)
        if self.is_last:
            return None, code
        z2 = self.latent_head(z)
        return z2 - self._dequant_code(code), code

    def quantize_soft(self, x, rng):
        """Training path: gumbel-softmax sample."""
        z = self.latent_enc(x)
        q = self.quant_head(z)
        scale = math.sqrt(self.k)
        logit = -self._distance(q) / scale
        temp = jnp.maximum(self.log_temp, EPS)
        sample = gumbel_softmax_st(logit * temp, 1.0, rng)  # (n, m, k)
        code = jnp.argmax(logit, axis=-1)
        residual = None
        if not self.is_last:
            z2 = self.latent_head(z)
            residual = z2 - self._dequant_soft(sample)
        return sample, residual, code, logit

    def decode_level(self, q_vec, former):
        """q_vec: (n, C) dequantized codes; former: deeper level output."""
        x = self.dequant_head(q_vec)
        if former is not None and not self.is_last:
            x = x + self.side_head(former)
        return self.restore_head(x)


class UMGMCodebook(nn.Module):
    """Full multi-level quantizer with train forward / encode / decode.

    ``use_fused``: "auto" (default) routes large eval-time encode/decode
    calls through the fused Pallas wire kernels
    (ops/codebook_kernels.py — whole level chain VMEM-resident, one HBM
    round trip instead of ~15 materialized (n, C) intermediates);
    "always"/"never" force the choice. The training path (gumbel soft
    quantization) always uses the flax path — it needs gradients.
    """
    channel: int = 64
    seg_num: int = 2
    dict_sizes: Sequence[int] = (256, 256, 256)
    dtype: jnp.dtype = jnp.float32
    freq_ema: float = 0.9
    use_fused: str = "auto"

    #: min rows before "auto" pays the kernel-launch overhead
    _FUSED_MIN_ROWS = 8192

    def setup(self):
        self.levels = [
            _LevelQuantizer(
                self.channel, self.seg_num, k,
                is_last=(i == len(self.dict_sizes) - 1),
                dtype=self.dtype, name=f"level{i}",
            )
            for i, k in enumerate(self.dict_sizes)
        ]
        self.freq_vars = [
            self.variable(
                "codebook_stats", f"freq_ema_{i}",
                lambda k=k: jnp.ones((self.seg_num, k)) / k,
            )
            for i, k in enumerate(self.dict_sizes)
        ]

    @property
    def bits_per_vector(self):
        return sum(self.seg_num * math.ceil(math.log2(k))
                   for k in self.dict_sizes)

    def _fused_ok(self, n: int) -> bool:
        if self.use_fused == "never" or self.is_initializing():
            return False
        if len(set(self.dict_sizes)) != 1 or self.channel % self.seg_num:
            return False
        return self.use_fused == "always" or n >= self._FUSED_MIN_ROWS

    def _packed(self):
        from quantv2x_tpu.ops.codebook_kernels import pack_codebook_params
        return pack_codebook_params(
            self.variables["params"], self.seg_num, tuple(self.dict_sizes),
            self.channel)

    @staticmethod
    def _interpret() -> bool:
        return jax.default_backend() != "tpu"

    def encode(self, x):
        """x: (n, C) -> codes (n, L, m) int32 — the wire payload."""
        if self._fused_ok(x.shape[0]):
            from quantv2x_tpu.ops.codebook_kernels import \
                fused_codebook_encode
            return fused_codebook_encode(
                self._packed(), x, self.seg_num, tuple(self.dict_sizes),
                dtype=self.dtype, interpret=self._interpret())
        codes = []
        for lvl in self.levels:
            x_next, code = lvl.encode(x)
            codes.append(code)
            if x_next is not None:
                x = x_next
        return jnp.stack(codes, axis=1).astype(jnp.int32)

    def decode(self, codes):
        """codes: (n, L, m) -> (n, C)."""
        if self._fused_ok(codes.shape[0]):
            from quantv2x_tpu.ops.codebook_kernels import \
                fused_codebook_decode
            return fused_codebook_decode(
                self._packed(), codes, self.seg_num,
                tuple(self.dict_sizes), self.channel,
                dtype=self.dtype, interpret=self._interpret())
        former = None
        for i in reversed(range(len(self.levels))):
            lvl = self.levels[i]
            q = lvl._dequant_code(codes[:, i])
            former = lvl.decode_level(q, former)
        return former

    #: soft-path row chunking: the gumbel train path materializes several
    #: (n, m, k) tensors through backward — at the flagship grid
    #: (n = B*L*H*W ~ 1.4e5, m*k = 512) that OOMs a 16 GB chip. Rows are
    #: independent, so the train forward maps over chunks of this many
    #: rows with jax.checkpoint (backward recomputes one chunk at a time);
    #: EMA usage counts sum across chunks exactly.
    _TRAIN_CHUNK_ROWS = 16384

    def _module_soft_chunk(self, x, rng):
        """Soft round-trip via the flax submodules — used ONLY while
        initializing (it must touch every head so setup creates params).
        `soft_roundtrip_pure` is the numerical twin used afterwards
        (tested identical in tests/test_codebook_kernels.py)."""
        samples, codes = [], []
        h = x
        for i, lvl in enumerate(self.levels):
            sample, residual, code, logit = lvl.quantize_soft(
                h, jax.random.fold_in(rng, i)
            )
            samples.append(sample)
            codes.append(code)
            if residual is not None:
                h = residual
        former = None
        for i in reversed(range(len(self.levels))):
            lvl = self.levels[i]
            q = lvl._dequant_soft(samples[i])
            former = lvl.decode_level(q, former)
        sq = ((former.astype(jnp.float32)
               - jax.lax.stop_gradient(x).astype(jnp.float32)) ** 2).sum()
        counts = [s.sum(0) for s in samples]
        return former, jnp.stack(codes, axis=1).astype(jnp.int32), sq, counts

    def __call__(self, x, train: bool = False):
        """Soft (train) or hard (eval) round-trip.

        Returns (restored (n, C), codes (n, L, m), code_loss scalar).
        """
        if not train:
            codes = self.encode(x)
            return self.decode(codes), codes, jnp.float32(0.0)

        rng = self.make_rng("gumbel")
        n, C = x.shape
        rows = self._TRAIN_CHUNK_ROWS
        if self.is_initializing():
            former, codes, sq, counts = self._module_soft_chunk(x, rng)
        else:
            params = self.variables["params"]
            sizes = tuple(self.dict_sizes)

            def chunk(xc, rng_c, valid):
                return soft_roundtrip_pure(
                    params, self.seg_num, sizes, xc, rng_c, valid,
                    self.dtype)

            if n <= rows:
                former, codes, sq, counts = chunk(
                    x, rng, jnp.ones((n,), bool))
            else:
                nc = -(-n // rows)
                xp = jnp.pad(x, ((0, nc * rows - n), (0, 0)))
                validp = jnp.arange(nc * rows) < n

                def body(args):
                    i, xc, vc = args
                    return chunk(xc, jax.random.fold_in(rng, 7 + i), vc)

                former, codes, sq, counts = jax.lax.map(
                    jax.checkpoint(body),
                    (jnp.arange(nc),
                     xp.reshape(nc, rows, C),
                     validp.reshape(nc, rows)),
                )
                former = former.reshape(nc * rows, C)[:n]
                codes = codes.reshape(nc * rows, *codes.shape[2:])[:n]
                sq = sq.sum()
                counts = [c.sum(0) for c in counts]
        # EMA code-usage stats (codebook.py updateFreq:357-368) — counts
        # summed over chunks equal the unchunked sample.sum(0) exactly
        if not self.is_initializing():
            for i, used in enumerate(counts):
                freq = self.freq_vars[i]
                norm = used / jnp.maximum(used.sum(-1, keepdims=True), 1.0)
                freq.value = (
                    self.freq_ema * freq.value + (1 - self.freq_ema) * norm
                )
        code_loss = sq / (n * C)
        return former, codes, code_loss


class CodebookCompressor(nn.Module):
    """Adapter: (B, L, H, W, C) agent features -> codebook round-trip.

    This is the communication point (heter_pyramid_collab_codebook_mc.py:
    113-128): features flatten to per-pixel vectors, quantize, restore.
    """
    channel: int = 64
    seg_num: int = 2
    dict_sizes: Sequence[int] = (256, 256, 256)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.codebook = UMGMCodebook(
            self.channel, self.seg_num, self.dict_sizes, dtype=self.dtype
        )

    def __call__(self, feats, train: bool = False):
        B, L, H, W, C = feats.shape
        flat = feats.reshape(-1, C)
        restored, codes, code_loss = self.codebook(flat, train)
        out = restored.reshape(B, L, H, W, C).astype(feats.dtype)
        aux = {"codebook_codes": codes.reshape(B, L, H, W, -1)}
        if train:
            aux["aux_loss"] = code_loss
        return out, aux
