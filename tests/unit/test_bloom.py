"""Bloom vs a direct NumPy oracle of the reference convolution."""

import jax.numpy as jnp
import numpy as np

from bhr_tpu.ops.bloom import apply_bloom


def _bloom_oracle(img, width_ref):
    """Direct port of the reference separable normalized blur
    (render.py:3042-3110) in (H, W, 3) layout."""
    h, w = img.shape[:2]
    radius = max(int(width_ref * 0.02), 1)
    sigma_scale = (width_ref / 640.0) ** 2
    denoms = (25.0, 80.0, 1600.0)

    lum = img[..., 0] * 0.2126 + img[..., 1] * 0.7152 + img[..., 2] * 0.0722
    bright = np.where(lum[..., None] > 0.0, img, 0.0)

    def pass_1d(src, axis):
        out = np.zeros_like(src)
        n = src.shape[axis]
        for c, den in enumerate(denoms):
            for idx in range(n):
                acc = np.zeros_like(np.take(src, 0, axis=axis)[..., c])
                wsum = 0.0 * acc
                for d in range(-radius, radius + 1):
                    j = idx + d
                    if 0 <= j < n:
                        wgt = np.exp(-(d * d) / (den * sigma_scale))
                        acc = acc + np.take(src, j, axis=axis)[..., c] * wgt
                        wsum = wsum + wgt
                sl = [slice(None)] * src.ndim
                sl[axis] = idx
                sl[-1] = c
                out[tuple(sl)] = acc / np.maximum(wsum, 1e-12)
        return out

    h_pass = pass_1d(bright, axis=1)
    return pass_1d(h_pass, axis=0)


def test_bloom_matches_oracle():
    rng = np.random.default_rng(0)
    img = rng.random((12, 20, 3)).astype(np.float32) * 0.5
    img[5:7, 8:10] = 2.0  # bright spot
    got = np.asarray(apply_bloom(jnp.asarray(img), width_ref=160))
    want = _bloom_oracle(img, 160)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_bloom_preserves_dc():
    """A constant image stays constant under normalized blur."""
    img = np.full((10, 16, 3), 0.3, np.float32)
    got = np.asarray(apply_bloom(jnp.asarray(img), width_ref=640))
    np.testing.assert_allclose(got, 0.3, atol=1e-4)


def test_bloom_dispersion_blue_wider():
    """Blue channel spreads farther than red (chromatic dispersion)."""
    img = np.zeros((31, 63, 3), np.float32)
    img[15, 31] = 1.0
    blur = np.asarray(apply_bloom(jnp.asarray(img), width_ref=640))
    # Measure energy 8 pixels away from the impulse.
    far_red = blur[15, 39, 0]
    far_blue = blur[15, 39, 2]
    assert far_blue > far_red


def test_matmul_bloom_matches_conv_bloom():
    """The MXU banded-matmul path equals the depthwise-conv path."""
    from bhr_tpu.ops.bloom import apply_bloom_conv

    rng = np.random.default_rng(5)
    img = rng.random((24, 40, 3)).astype(np.float32)
    a = np.asarray(apply_bloom(jnp.asarray(img), width_ref=640))
    b = np.asarray(apply_bloom_conv(jnp.asarray(img), width_ref=640))
    np.testing.assert_allclose(a, b, atol=5e-4)


def test_tiled_banded_matches_conv_oracle_large():
    """Axis sizes past _BLOOM_TILE + 2R take the block-banded path —
    verify it against the depthwise-conv oracle (the small oracle tests
    exercise only the dense banded matmul)."""
    from bhr_tpu.ops.bloom import _BLOOM_TILE, apply_bloom, apply_bloom_conv

    rng = np.random.default_rng(7)
    h, w = 320, 700  # w > tile + 2R (700 > 256 + 2*14) -> tiled path
    img = rng.random((h, w, 3)).astype(np.float32)
    radius = max(int(w * 0.02), 1)
    assert w > _BLOOM_TILE + 2 * radius and h > _BLOOM_TILE + 2 * radius
    got = np.asarray(apply_bloom(jnp.asarray(img), width_ref=w))
    want = np.asarray(apply_bloom_conv(jnp.asarray(img), width_ref=w))
    np.testing.assert_allclose(got, want, atol=2e-5)
