"""Bloom with chromatic dispersion as boundary-normalized depthwise convs.

Parity target: reference `_bloom_kernel` (/root/reference/render.py:
3022-3116) — brightness extraction (threshold 0), separable horizontal +
vertical Gaussian blur with *per-channel* denominators (25, 80, 1600) *
sigma_scale (red sharp, blue wide = lens dispersion), each tap sum
normalized by the in-bounds weight sum.

On TPU this maps to two `lax.conv_general_dilated` depthwise convolutions
(one per axis) plus a ones-image convolution for the boundary
normalization; XLA fuses the divides.

Note on intensity: the reference's PNG path fetches the disk layer before
running the bloom kernel and then adds the *unscaled* blur field
(render.py:3909-3918), so the effective composite is bg + disk + blur.
`apply_bloom` therefore returns the raw normalized blur; callers choose
the add-back scale (pipeline uses 1.0 to match the reference PNG path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Per-channel Gaussian denominators: w_c(d) = exp(-d^2 / (DEN_c * sigma_scale)).
_CHANNEL_DENOMS = (25.0, 80.0, 1600.0)


def _bloom_kernels(kernel_radius: int, sigma_scale: float) -> np.ndarray:
    """(3, 2R+1) per-channel 1D Gaussian taps (unnormalized)."""
    d = np.arange(-kernel_radius, kernel_radius + 1, dtype=np.float32)
    return np.stack(
        [np.exp(-(d**2) / (den * sigma_scale)) for den in _CHANNEL_DENOMS], axis=0
    )


def _depthwise_1d(img_nchw: jnp.ndarray, taps: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Depthwise 1D convolution of (1, 3, H, W) along H (axis=0) or W (axis=1)."""
    ksize = taps.shape[1]
    if axis == 0:
        rhs = taps[:, None, :, None]  # (C, 1, K, 1)
        pad = ((ksize // 2, ksize // 2), (0, 0))
    else:
        rhs = taps[:, None, None, :]  # (C, 1, 1, K)
        pad = ((0, 0), (ksize // 2, ksize // 2))
    return jax.lax.conv_general_dilated(
        img_nchw,
        jnp.asarray(rhs),
        window_strides=(1, 1),
        padding=pad,
        feature_group_count=3,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        # Full f32 accumulation: the default (bf16-ish) conv path shows up
        # as visible ~1e-3 banding in the blur.
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.lru_cache(maxsize=8)
def _banded_blur_matrices(n: int, kernel_radius: int, sigma_scale: float):
    """(n, n, 3) per-channel banded blur matrices with boundary
    normalization folded in: B[i, j, c] = w_c(i - j) / sum_inbounds w_c.

    Separable Gaussian blur as a matmul: out[..., j, c] =
    sum_i x[..., i, c] * B[i, j, c] — this runs on the MXU, ~20x faster
    than the depthwise-conv lowering for FHD-sized kernels.
    """
    idx = np.arange(n)
    d = idx[:, None] - idx[None, :]  # (i, j)
    mats = []
    for den in _CHANNEL_DENOMS:
        w = np.exp(-(d.astype(np.float32) ** 2) / (den * sigma_scale))
        w[np.abs(d) > kernel_radius] = 0.0
        w = w / np.maximum(w.sum(axis=0, keepdims=True), 1e-12)
        mats.append(w)
    # Host numpy (NOT jnp): this function is lru_cached and may first run
    # inside a jit trace — caching a traced array would leak the tracer.
    return np.stack(mats, axis=-1)


# Output-tile size for the block-banded matmul. The dense (n, n) matmul
# wastes FLOPs outside the +-R band (bandwidth 2R+1 = 0.04n); tiling the
# output axis into T-column blocks contracts each against only its
# (T + 2R)-row input slab: FLOP ratio (T + 2R) / n, e.g. 0.17 at 4K.
# T = 256 keeps the MXU contraction dim >= 410 (well-utilized) while
# maximizing the skip.
_BLOOM_TILE = 256


@functools.lru_cache(maxsize=16)
def _tiled_blur_matrices(n: int, kernel_radius: int, sigma_scale: float,
                         tile: int):
    """Block-banded form of :func:`_banded_blur_matrices`.

    Returns (n_tiles, T + 2R, T, 3) host float32: tile t's output
    columns j in [tT, tT + T) contract against global input rows
    i in [tT - R, tT + T + R) (clipped rows zeroed — they pair with the
    caller's zero-padding). Identical coefficients to the dense matrix,
    asserted by the oracle tests.
    """
    radius = kernel_radius
    n_tiles = -(-n // tile)
    k = tile + 2 * radius
    out = np.zeros((n_tiles, k, tile, 3), np.float32)
    for t in range(n_tiles):
        j = t * tile + np.arange(tile)  # global output columns
        i = t * tile - radius + np.arange(k)  # global input rows
        d = i[:, None] - j[None, :]
        in_bounds = ((i >= 0) & (i < n))[:, None] & (j < n)[None, :]
        for c, den in enumerate(_CHANNEL_DENOMS):
            w = np.exp(-(d.astype(np.float32) ** 2) / (den * sigma_scale))
            w[np.abs(d) > radius] = 0.0
            w[~in_bounds] = 0.0
            denom = np.maximum(w.sum(axis=0, keepdims=True), 1e-12)
            out[t, :, :, c] = w / denom
    return out


def _blur_axis1_tiled(x: jnp.ndarray, n: int, kernel_radius: int,
                      sigma_scale: float) -> jnp.ndarray:
    """Blur (H, n, 3) along axis 1 via the block-banded MXU matmul."""
    tile = _BLOOM_TILE
    if n <= tile + 2 * kernel_radius:
        # Banding saves nothing once the slab covers the whole axis.
        b = jnp.asarray(_banded_blur_matrices(n, kernel_radius, sigma_scale))
        return jnp.einsum(
            "hic,ijc->hjc", x, b, precision=jax.lax.Precision.HIGHEST
        )
    mats = jnp.asarray(
        _tiled_blur_matrices(n, kernel_radius, sigma_scale, tile)
    )
    n_tiles = mats.shape[0]
    pad_cols = n_tiles * tile - n
    xp = jnp.pad(x, ((0, 0), (kernel_radius, kernel_radius + pad_cols),
                     (0, 0)))
    # (H, n_tiles, T + 2R, 3) overlapping input slabs; static slices.
    slabs = jnp.stack(
        [xp[:, t * tile: t * tile + tile + 2 * kernel_radius]
         for t in range(n_tiles)],
        axis=1,
    )
    out = jnp.einsum(
        "hnic,nijc->hnjc", slabs, mats, precision=jax.lax.Precision.HIGHEST
    )
    h = x.shape[0]
    return out.reshape(h, n_tiles * tile, 3)[:, :n]


@functools.partial(jax.jit, static_argnames=("width_ref", "threshold"))
def apply_bloom(
    disk_layer: jnp.ndarray, *, width_ref: int, threshold: float = 0.0
) -> jnp.ndarray:
    """Separable per-channel bloom via block-banded matmuls (MXU).

    Numerically identical contract to :func:`apply_bloom_conv` (same
    taps, same boundary normalization), asserted by the oracle tests.
    Large axes use the tiled block-banded form (skips the zero band
    outside +-R — ~6x fewer MXU FLOPs at 4K); small axes keep the dense
    banded matmul.
    """
    h, w = disk_layer.shape[0], disk_layer.shape[1]
    kernel_radius = max(int(width_ref * 0.02), 1)
    sigma_scale = (width_ref / 640.0) ** 2

    lum = (
        disk_layer[..., 0] * 0.2126
        + disk_layer[..., 1] * 0.7152
        + disk_layer[..., 2] * 0.0722
    )
    bright = jnp.where((lum > threshold)[..., None], disk_layer, 0.0)

    # Horizontal pass along w, then vertical along h (via transpose so
    # both use the same axis-1 tiled kernel).
    pass_h = _blur_axis1_tiled(bright, w, kernel_radius, sigma_scale)
    out_t = _blur_axis1_tiled(
        pass_h.transpose(1, 0, 2), h, kernel_radius, sigma_scale
    )
    return out_t.transpose(1, 0, 2)


@functools.partial(jax.jit, static_argnames=("width_ref", "threshold"))
def apply_bloom_conv(
    disk_layer: jnp.ndarray, *, width_ref: int, threshold: float = 0.0
) -> jnp.ndarray:
    """Separable per-channel bloom of the disk layer.

    Args:
        disk_layer: (H, W, 3) float32.
        width_ref: frame width used for the resolution-scaled radius
            (kernel_radius = width * 0.02) and sigma_scale = (width/640)^2.
        threshold: luminance threshold for the bright extraction.
    Returns:
        (H, W, 3) normalized blur (not yet scaled / added back).
    """
    kernel_radius = max(int(width_ref * 0.02), 1)
    sigma_scale = (width_ref / 640.0) ** 2
    taps = jnp.asarray(_bloom_kernels(kernel_radius, sigma_scale))

    lum = (
        disk_layer[..., 0] * 0.2126
        + disk_layer[..., 1] * 0.7152
        + disk_layer[..., 2] * 0.0722
    )
    bright = jnp.where((lum > threshold)[..., None], disk_layer, 0.0)

    img = bright.transpose(2, 0, 1)[None]  # (1, 3, H, W)
    ones = jnp.ones_like(img)

    # Horizontal pass with boundary normalization, then vertical.
    num_h = _depthwise_1d(img, taps, axis=1)
    den_h = _depthwise_1d(ones, taps, axis=1)
    pass_h = num_h / jnp.maximum(den_h, 1e-12)

    num_v = _depthwise_1d(pass_h, taps, axis=0)
    den_v = _depthwise_1d(ones, taps, axis=0)
    blur = num_v / jnp.maximum(den_v, 1e-12)

    return blur[0].transpose(1, 2, 0)
