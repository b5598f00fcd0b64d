"""STAMP protocol-space adapters (heterogeneous collaboration).

Parity: models/stamp_modules/adapter.py:93-856 (BaseAdapter + the full
variant family — identity / conv / fc / convnext / att / dsa) and the
heter_model_baseline_w_stamp wiring: each agent type owns an ``Adapter``
mapping its local BEV feature space into a shared *protocol* space (what
gets transmitted) and a ``Reverter`` mapping received protocol features
back into its local space, so heterogeneous models collaborate without
retraining their detection stacks.

Two layers of API:
  - ``Adapter``/``Reverter``/``StampBridge`` — the compact ConvNeXt-based
    pair used by ``StampCollabModel`` and ``tools/train_stamp.py``
    (channel projection + ConvNeXt blocks + optional resample);
  - ``build_adapter(spec)`` — the reference's dispatcher
    (adapter.py:811-856 ``Adapter(args)``): a ``core_method`` string
    selects among the six variants, each handling the BaseAdapter
    geometry (meters-per-pixel resize + lidar-range zero-pad/crop,
    adapter.py:113-147) before/after its learned transform.

Blocks are ConvNeXt-style (depthwise 7x7 + LayerNorm + pointwise MLP) with
optional channel change and spatial rescale, as in the reference's convnext
aligner family (stamp_modules/feature_alignnet_modules.py).
"""

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvNextBlock(nn.Module):
    """ConvNeXt residual block; ``deformable=True`` swaps the depthwise
    conv for a deformable conv (feature_alignnet_modules.ConvEncoder
    deformable flag, stamp_modules/feature_alignnet_modules.py:79-107)."""
    channels: int
    deformable: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.deformable:
            from quantv2x_tpu.ops.deform_conv import DeformableConv2d
            y = DeformableConv2d(self.channels, dtype=self.dtype,
                                 name="dw_deform")(x)
        else:
            y = nn.Conv(self.channels, (7, 7), padding="SAME",
                        feature_group_count=self.channels, dtype=self.dtype,
                        name="dw")(x)
        y = nn.LayerNorm(dtype=self.dtype, name="ln")(y)
        y = nn.Dense(4 * self.channels, dtype=self.dtype, name="pw1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.channels, dtype=self.dtype, name="pw2")(y)
        return x + y


class Adapter(nn.Module):
    """Local feature space -> protocol space (transmit side)."""
    out_channels: int
    depth: int = 2
    out_hw: Optional[tuple] = None   # protocol spatial size (resample if set)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (..., H, W, C_local) -> (..., H', W', C_protocol)."""
        lead = x.shape[:-3]
        H, W, C = x.shape[-3:]
        flat = x.reshape((-1, H, W, C))
        y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="proj")(flat)
        for d in range(self.depth):
            y = ConvNextBlock(self.out_channels, dtype=self.dtype,
                              name=f"block{d}")(y)
        if self.out_hw is not None and self.out_hw != (H, W):
            y = jax.image.resize(
                y, (y.shape[0], *self.out_hw, self.out_channels), "bilinear"
            )
        return y.reshape(lead + y.shape[1:])


class Reverter(nn.Module):
    """Protocol space -> local feature space (receive side)."""
    out_channels: int
    depth: int = 2
    out_hw: Optional[tuple] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        lead = x.shape[:-3]
        H, W, C = x.shape[-3:]
        flat = x.reshape((-1, H, W, C))
        y = flat
        if self.out_hw is not None and self.out_hw != (H, W):
            y = jax.image.resize(
                y, (y.shape[0], *self.out_hw, C), "bilinear"
            )
        y = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name="proj")(y)
        for d in range(self.depth):
            y = ConvNextBlock(self.out_channels, dtype=self.dtype,
                              name=f"block{d}")(y)
        return y.reshape(lead + y.shape[1:])


class StampCollabModel(nn.Module):
    """STAMP end-to-end wrapper: frozen ego + protocol stacks, live bridge.

    Parity: models/heter_model_baseline_w_stamp.py:132-305 and
    tools/train_stamp.py:188-244. Stages:
      - ``train_adapter``           -> (None, (FM, FP2M, FM2P2M, FP, FM2P))
      - ``train_adapter_w_output``  -> (output_dict, feats)
      - ``infer``                   -> output_dict only
    where FM is the ego-modality agent feature, FP the protocol model's,
    FM2P = adapter(FM), FP2M = reverter(FP), FM2P2M = reverter(adapter(FM)).

    Collaboration runs in protocol space: every non-ego agent transmits
    adapter(F) and the ego reverts it before fusion (the reference's
    forward_adapter_and_reverter at heter_model_baseline_w_stamp.py:885-931),
    so heterogeneous stacks interoperate without retraining the heads.
    """
    ego_model: nn.Module        # PyramidCollabModel (frozen)
    protocol_model: nn.Module   # PyramidCollabModel (frozen, "m0")
    protocol_channels: int
    local_channels: int
    stage: str = "train_adapter_w_output"
    adapter_spec: Optional[dict] = None     # hypes adapter: block
    reverter_spec: Optional[dict] = None    # hypes reverter: block
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.bridge = StampBridge(self.protocol_channels,
                                  self.local_channels,
                                  adapter_spec=self.adapter_spec,
                                  reverter_spec=self.reverter_spec,
                                  dtype=self.dtype)

    def __call__(self, batch, train: bool = False):
        fm = self.ego_model.encode_agents(batch, train=False)
        fm = jax.lax.stop_gradient(fm)
        feats = None
        if self.stage in ("infer_hetero", "infer_hetero_raw"):
            # Heterogeneous serving: collaborators really run the PROTOCOL
            # stack; the ego fuses their features after the reverter maps
            # them into its own space (reference
            # forward_adapter_and_reverter, heter_model_baseline_w_stamp
            # .py:885-931). "_raw" skips the bridge — the feature-space-
            # mismatch baseline the adapter exists to fix.
            fp = self.protocol_model.encode_agents(batch, train=False)
            fp = jax.lax.stop_gradient(fp)
            other = (fp if self.stage == "infer_hetero_raw"
                     else self.bridge.reverter(fp))
            collab = jnp.concatenate([fm[:, :1], other[:, 1:]], axis=1)
            return self.ego_model.fuse_and_predict(collab, batch,
                                                   train=False)
        if self.stage != "infer":
            fp = self.protocol_model.encode_agents(batch, train=False)
            fp = jax.lax.stop_gradient(fp)
            fm2p = self.bridge.adapter(fm)
            fp2m = self.bridge.reverter(fp)
            fm2p2m = self.bridge.reverter(fm2p)
            feats = (fm, fp2m, fm2p2m, fp, fm2p)
        else:
            fm2p2m = self.bridge.reverter(self.bridge.adapter(fm))
        if self.stage == "train_adapter":
            return None, feats
        # non-ego agents' features travel adapter->wire->reverter; the ego
        # keeps its own local feature (agent slot 0 is always ego)
        collab = jnp.concatenate([fm[:, :1], fm2p2m[:, 1:]], axis=1)
        out = self.ego_model.fuse_and_predict(collab, batch, train=False)
        if self.stage == "train_adapter_w_output":
            return out, feats
        return out


class LeadFlatten(nn.Module):
    """Run a (B, H, W, C) module over inputs with extra lead axes
    ((B, L, H, W, C) agent stacks) by flattening/restoring them."""
    inner: nn.Module

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        lead = x.shape[:-3]
        y = self.inner(x.reshape((-1,) + x.shape[-3:]),
                       deterministic=deterministic)
        return y.reshape(lead + y.shape[1:])


class StampBridge(nn.Module):
    """Adapter + Reverter pair for one agent type.

    Training objective (adapter_loss parity): adapted local features should
    match the protocol model's features, and revert(adapt(x)) ~= x.

    ``adapter_spec``/``reverter_spec`` select a reference-parity variant
    (see ``build_adapter``; hypes ``core_method`` strings) instead of the
    compact ConvNeXt default.
    """
    protocol_channels: int
    local_channels: int
    adapter_spec: Optional[dict] = None
    reverter_spec: Optional[dict] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.adapter_spec is not None:
            self.adapter = LeadFlatten(
                build_adapter(self.adapter_spec, dtype=self.dtype))
        else:
            self.adapter = Adapter(self.protocol_channels, dtype=self.dtype)
        if self.reverter_spec is not None:
            self.reverter = LeadFlatten(
                build_adapter(self.reverter_spec, dtype=self.dtype))
        else:
            self.reverter = Reverter(self.local_channels, dtype=self.dtype)

    def __call__(self, local_feats):
        protocol = self.adapter(local_feats)
        restored = self.reverter(protocol)
        return protocol, restored

    def cycle_loss(self, local_feats):
        protocol, restored = self(local_feats)
        return jnp.mean((restored - local_feats) ** 2), protocol


# ---------------------------------------------------------------------------
# Reference-parity adapter variant family (adapter.py:93-856)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AdapterGeom:
    """BaseAdapter geometry (adapter.py:93-147): the source feature map
    covers ``in_range`` meters at ``in_shape`` pixels; the protocol space
    covers ``out_range`` at ``out_shape``. The transform resizes so the
    meters-per-pixel match, then zero-pads/crops so the lidar ranges
    align (agents are range-centered, so pads can be asymmetric)."""
    in_channels: int
    out_channels: int
    in_range: Tuple[float, ...]      # (xmin, ymin, zmin, xmax, ymax, zmax)
    out_range: Tuple[float, ...]
    in_shape: Tuple[int, int]        # (H, W)
    out_shape: Tuple[int, int]

    @property
    def feat_ratio(self):
        """Resize factor (x, y) so meters/pixel match the protocol grid
        (adapter.py:122-128)."""
        in_m = (self.in_range[3] - self.in_range[0],
                self.in_range[4] - self.in_range[1])
        out_m = (self.out_range[3] - self.out_range[0],
                 self.out_range[4] - self.out_range[1])
        in_px = (self.in_shape[1], self.in_shape[0])
        out_px = (self.out_shape[1], self.out_shape[0])
        return ((out_px[0] / out_m[0]) / (in_px[0] / in_m[0]),
                (out_px[1] / out_m[1]) / (in_px[1] / in_m[1]))

    @property
    def range_ratio(self):
        """World-extent ratio out/in per (x, y) — the DSA reference-point
        scale (adapter.py:116-121 self.ratio)."""
        return ((self.out_range[3] - self.out_range[0])
                / (self.in_range[3] - self.in_range[0]),
                (self.out_range[4] - self.out_range[1])
                / (self.in_range[4] - self.in_range[1]))

    def pads(self):
        """(top, bottom, left, right) zero-pad (negative = crop) aligning
        the resized map's lidar range to the protocol's
        (adapter.py:129-145 ZeroPad2d math)."""
        rx, ry = self.feat_ratio
        in_ppm_x = self.in_shape[1] / (self.in_range[3] - self.in_range[0])
        in_ppm_y = self.in_shape[0] / (self.in_range[4] - self.in_range[1])
        out_ppm_x = self.out_shape[1] / (self.out_range[3]
                                         - self.out_range[0])
        out_ppm_y = self.out_shape[0] / (self.out_range[4]
                                         - self.out_range[1])
        left = round(self.in_range[0] * in_ppm_x * rx
                     - self.out_range[0] * out_ppm_x)
        right = round(self.out_range[3] * out_ppm_x
                      - self.in_range[3] * in_ppm_x * rx)
        top = round(self.in_range[1] * in_ppm_y * ry
                    - self.out_range[1] * out_ppm_y)
        bottom = round(self.out_range[4] * out_ppm_y
                       - self.in_range[4] * in_ppm_y * ry)
        return top, bottom, left, right

    def resized_hw(self):
        rx, ry = self.feat_ratio
        return (int(round(self.in_shape[0] * ry)),
                int(round(self.in_shape[1] * rx)))


def _geom_resize(x, geom: AdapterGeom):
    """Bilinear resize (B, H, W, C) to the meters/pixel-matched size."""
    H, W = geom.resized_hw()
    if (H, W) == tuple(x.shape[1:3]):
        return x
    return jax.image.resize(x, (x.shape[0], H, W, x.shape[3]), "bilinear")


def _geom_pad(x, geom: AdapterGeom):
    """Zero-pad/crop to the protocol grid; clamps residual rounding to
    out_shape exactly."""
    t, b, l, r = geom.pads()

    def axis(v, lo, hi, size):
        if lo < 0:
            v = v[:, -lo:] if size == 1 else v[:, :, -lo:]
            lo = 0
        if hi < 0:
            v = v[:, :v.shape[1] + hi] if size == 1 else \
                v[:, :, :v.shape[2] + hi]
            hi = 0
        pad = [(0, 0)] * 4
        pad[size] = (lo, hi)
        return jnp.pad(v, pad)

    x = axis(x, t, b, 1)
    x = axis(x, l, r, 2)
    # snap off-by-one rounding drift to the exact protocol shape
    H, W = geom.out_shape
    x = x[:, :H, :W]
    if x.shape[1] != H or x.shape[2] != W:
        x = jnp.pad(x, ((0, 0), (0, H - x.shape[1]), (0, W - x.shape[2]),
                        (0, 0)))
    return x


class AdapterIdentityV(nn.Module):
    """Resize+pad only (adapter.py:155-169); needs C_in == C_out."""
    geom: AdapterGeom
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return _geom_pad(_geom_resize(x, self.geom), self.geom)


class AdapterConvV(nn.Module):
    """Resize -> 1x1 conv -> pad (adapter.py:272-296)."""
    geom: AdapterGeom
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = _geom_resize(x, self.geom)
        y = nn.Conv(self.geom.out_channels, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.kaiming_normal(),
                    name="conv")(y)
        return _geom_pad(y, self.geom)


class AdapterFCV(nn.Module):
    """Per-PIXEL fully-connected map (adapter.py:299-350): every spatial
    position owns its own (C_in, C_out) matrix — a location-dependent
    channel mixer. Weights are sized to the post-resize grid (the
    reference sizes them to in_shape but applies them after the resize,
    which only type-checks at feat_ratio == 1 — fixed here)."""
    geom: AdapterGeom
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = _geom_resize(x, self.geom)
        H, W = y.shape[1:3]
        w = self.param(
            "weights", nn.initializers.he_uniform(),
            (H, W, self.geom.in_channels, self.geom.out_channels),
            self.dtype)
        b = self.param("biases", nn.initializers.zeros,
                       (H, W, self.geom.out_channels), self.dtype)
        y = jnp.einsum("bhwc,hwco->bhwo", y, w) + b
        return _geom_pad(y, self.geom)


class AdapterConvNextV(nn.Module):
    """1x1 projection + ConvNeXt blocks + geometry (adapter.py:172-197 /
    feature_alignnet_modules.py convnext family)."""
    geom: AdapterGeom
    depth: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = _geom_resize(x, self.geom)
        y = nn.Conv(self.geom.out_channels, (1, 1), dtype=self.dtype,
                    name="proj")(y)
        for d in range(self.depth):
            y = ConvNextBlock(self.geom.out_channels, dtype=self.dtype,
                              name=f"block{d}")(y)
        return _geom_pad(y, self.geom)


class _AttBlock(nn.Module):
    """Pre-norm MHSA + MLP token block (adapter.py AttBlock)."""
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="fc1")(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(nn.gelu(h))
        return x + h


class AdapterAttV(nn.Module):
    """Patch-token ViT adapter (adapter.py:200-265): 1x1 to a hidden dim,
    patch embed (k=p, s=p conv), learned pos embedding, transformer
    blocks, bilinear un-patch, 1x1 to out channels. ``late_upsample``
    runs the tokens on the input grid and resizes at the end."""
    geom: AdapterGeom
    dim: int = 64
    patch_size: int = 16
    num_heads: int = 4
    depth: int = 3
    late_upsample: bool = False
    early_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = x * self.early_scale
        if not self.late_upsample:
            y = _geom_resize(y, self.geom)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype,
                    name="channel_convert1")(y)
        H, W = y.shape[1:3]
        p = self.patch_size
        # pad to a whole number of patches (the reference asserts
        # divisibility implicitly; arbitrary grids must still work here)
        ph, pw = (-H) % p, (-W) % p
        if ph or pw:
            y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
        Hp, Wp = (H + ph) // p, (W + pw) // p
        t = nn.Conv(self.dim, (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embed")(y).reshape(y.shape[0], -1, self.dim)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, Hp * Wp, self.dim), self.dtype)
        t = t + pos
        for d in range(self.depth):
            t = _AttBlock(self.dim, self.num_heads, dtype=self.dtype,
                          name=f"block{d}")(t)
        t = nn.LayerNorm(dtype=self.dtype, name="norm")(t)
        y = t.reshape(y.shape[0], Hp, Wp, self.dim)
        y = jax.image.resize(
            y, (y.shape[0], Hp * p, Wp * p, self.dim), "bilinear")
        y = y[:, :H, :W]
        y = nn.Conv(self.geom.out_channels, (1, 1), dtype=self.dtype,
                    name="channel_convert2")(y)
        if self.late_upsample:
            y = _geom_resize(y, self.geom)
        return _geom_pad(y, self.geom)


class AdapterDSAV(nn.Module):
    """Deformable-spatial-attention adapter (adapter.py:633-729): query =
    1x1conv(resized input) on the protocol grid; n_layers of deformable
    attention back into the input map, sinusoidal 2D embeddings with
    learned scale on both sides, reference points scaled by the
    world-range ratio."""
    geom: AdapterGeom
    n_layers: int = 4
    num_heads: int = 8
    num_points: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from quantv2x_tpu.ops.deform_attn import (
            DeformableSpatialAttentionLayer, position_embedding_sine_2d,
        )
        geom = self.geom
        B, H, W, C = x.shape
        in_scale = self.param("in_pos_scale", nn.initializers.constant(
            1.0 / 30.0), (1,), self.dtype)
        out_scale = self.param("out_pos_scale", nn.initializers.constant(
            1.0 / 30.0), (1,), self.dtype)
        value = x + in_scale * position_embedding_sine_2d(
            H, W, C, dtype=x.dtype)

        q = _geom_resize(value, geom)
        q = nn.Conv(geom.out_channels, (1, 1), dtype=self.dtype,
                    name="conv")(q)
        oH, oW = q.shape[1:3]
        out = q.reshape(B, oH * oW, geom.out_channels)
        out_pos = position_embedding_sine_2d(
            oH, oW, geom.out_channels, dtype=x.dtype).reshape(
            1, oH * oW, geom.out_channels)
        # the query grid is conv(resize(x)) — it covers the INPUT world
        # range (just at the protocol meters/pixel), so query-normalized
        # coordinates map 1:1 onto the value map; the range alignment is
        # _geom_pad's job after attention (scaling refs by range_ratio
        # here would double-apply the conversion)
        for i in range(self.n_layers):
            out = out + out_scale * out_pos
            out = DeformableSpatialAttentionLayer(
                geom.out_channels, self.num_heads, self.num_points,
                dropout=self.dropout, dtype=self.dtype,
                name=f"layer{i}")(out, value, (oH, oW),
                                  deterministic=deterministic)
        y = out.reshape(B, oH, oW, geom.out_channels)
        return _geom_pad(y, geom)


_VARIANTS = {
    "identity": AdapterIdentityV,
    "adapterconv": AdapterConvV,
    "adapterfc": AdapterFCV,
    "adapterconvnext": AdapterConvNextV,
    "adapteratt": AdapterAttV,
    "adapterdsa": AdapterDSAV,
}


def build_adapter(spec: dict, dtype=jnp.float32, name: Optional[str] = None):
    """Reference dispatcher (adapter.py:811-856): ``spec`` mirrors the
    hypes block — ``core_method`` plus ``args`` with in/out channels,
    lidar ranges, feature shapes, and variant ``submodule_args``.

    Example::

        build_adapter({
          "core_method": "adapterconvnext",
          "args": {
            "in_channels": 64, "out_channels": 64,
            "in_cav_lidar_range":  [-102.4, -51.2, -3, 102.4, 51.2, 1],
            "out_cav_lidar_range": [-102.4, -51.2, -3, 102.4, 51.2, 1],
            "in_feature_shape": [100, 352], "out_feature_shape": [100, 352],
            "submodule_args": {"depth": 2}}})
    """
    method = spec["core_method"]
    if method not in _VARIANTS:
        raise ValueError(
            f"unknown adapter core_method {method!r}; "
            f"choices: {sorted(_VARIANTS)}")
    a = spec.get("args", {})
    geom = AdapterGeom(
        in_channels=a["in_channels"], out_channels=a["out_channels"],
        in_range=tuple(a["in_cav_lidar_range"]),
        out_range=tuple(a["out_cav_lidar_range"]),
        in_shape=tuple(a["in_feature_shape"]),
        out_shape=tuple(a["out_feature_shape"]),
    )
    sub = dict(a.get("submodule_args", {}))
    cls = _VARIANTS[method]
    field_names = {f.name for f in dataclasses.fields(cls)}
    kw = {k: v for k, v in sub.items() if k in field_names}
    return cls(geom=geom, dtype=dtype, name=name, **kw)
