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


@functools.partial(jax.jit, static_argnames=("width_ref", "threshold"))
def apply_bloom(
    disk_layer: jnp.ndarray, *, width_ref: int, threshold: float = 0.0
) -> jnp.ndarray:
    """Separable per-channel bloom via banded-matrix matmuls (MXU).

    Numerically identical contract to :func:`apply_bloom_conv` (same
    taps, same boundary normalization), asserted by the oracle tests.
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

    b_w = jnp.asarray(_banded_blur_matrices(w, kernel_radius, sigma_scale))
    b_h = jnp.asarray(_banded_blur_matrices(h, kernel_radius, sigma_scale))

    # Horizontal then vertical pass, per channel on the MXU.
    pass_h = jnp.einsum(
        "hwc,wvc->hvc", bright, b_w, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.einsum(
        "hwc,huc->uwc", pass_h, b_h, precision=jax.lax.Precision.HIGHEST
    )


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
