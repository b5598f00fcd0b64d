"""Differentiable BEV affine warp (grid_sample equivalent) in pure jnp.

Parity target: the reference's warp_affine_simple
(/root/reference/opencood/models/sub_modules/torch_transformation_utils.py),
i.e. torch F.affine_grid + F.grid_sample(bilinear, zero padding) driven by the
normalized 2x3 affine matrices from ``normalize_pairwise_tfm``.

XLA has no native grid_sample; this builds the sample grid analytically and
gathers with bilinear weights. Layout is HWC (channels last, TPU-native).
The gather decomposes into 4 dynamic gathers + lerp — XLA fuses the address
arithmetic; a Pallas kernel can replace it later if gathers dominate.
"""

import jax.numpy as jnp


def _base_grid(H: int, W: int, align_corners: bool, dtype):
    """Normalized output-pixel coordinates, matching torch affine_grid."""
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, W, dtype=dtype)
        ys = jnp.linspace(-1.0, 1.0, H, dtype=dtype)
    else:
        xs = (2.0 * (jnp.arange(W, dtype=dtype) + 0.5) / W) - 1.0
        ys = (2.0 * (jnp.arange(H, dtype=dtype) + 0.5) / H) - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    return gx, gy


def warp_affine(features, theta, out_hw=None, align_corners: bool = False):
    """Warp a single feature map by a normalized affine matrix.

    features: (H, W, C); theta: (2, 3) mapping normalized OUTPUT coords to
    normalized INPUT coords (torch affine_grid convention). Returns
    (H_out, W_out, C) with zeros outside the input.
    """
    H, W, C = features.shape
    H_out, W_out = out_hw if out_hw is not None else (H, W)
    dtype = jnp.promote_types(features.dtype, jnp.float32)
    gx, gy = _base_grid(H_out, W_out, align_corners, dtype)

    sx = theta[0, 0] * gx + theta[0, 1] * gy + theta[0, 2]
    sy = theta[1, 0] * gx + theta[1, 1] * gy + theta[1, 2]

    # normalized -> input pixel coords (torch grid_sample convention)
    if align_corners:
        ix = (sx + 1.0) * (W - 1) / 2.0
        iy = (sy + 1.0) * (H - 1) / 2.0
    else:
        ix = ((sx + 1.0) * W - 1.0) / 2.0
        iy = ((sy + 1.0) * H - 1.0) / 2.0

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = (ix - x0)[..., None]
    wy = (iy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = features[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb[..., None], v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    return out.astype(features.dtype)


def warp_affine_batch(features, thetas, align_corners: bool = False):
    """features: (N, H, W, C), thetas: (N, 2, 3) -> (N, H, W, C)."""
    import jax
    return jax.vmap(lambda f, t: warp_affine(f, t, align_corners=align_corners))(
        features, thetas
    )
