"""Screen-space lens flare as one fused vectorized pass.

Parity target: reference `TaichiRenderer._apply_lens_flare`
(/root/reference/render.py:3925-4028): brightness-centroid light position,
8 ghost blobs along the light->center line, 3 colored diffraction rings,
a hexagonal aperture ring, and 4 star streaks, all resolution-scaled.

The reference runs this on host NumPy per frame; here it is a jitted JAX
function (a handful of fused VPU loops), so it stays on device.
Image layout is (H, W, 3); x = column, y = row (isotropic math, so the
axis convention does not change the result).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def apply_lens_flare(final: jnp.ndarray, disk: jnp.ndarray) -> jnp.ndarray:
    """Add the flare stack to ``final`` based on the disk layer's centroid.

    Args:
        final: (H, W, 3) composed image.
        disk: (H, W, 3) disk layer (light source for the flare).
    Returns:
        (H, W, 3) image with flare, clipped to [0, 1].
    """
    h, w = final.shape[0], final.shape[1]
    scale = min(w, h) / 360.0

    brightness = jnp.max(disk, axis=-1)  # (H, W)
    total = jnp.sum(brightness)

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    safe_total = jnp.maximum(total, 1e-6)
    light_x = jnp.sum(xs * brightness) / safe_total
    light_y = jnp.sum(ys * brightness) / safe_total
    cx, cy = w / 2.0, h / 2.0

    intensity = jnp.minimum(total / (w * h * 0.3), 1.0) * 1.5

    flare = jnp.zeros_like(final)

    # -- ghost blobs along the light -> screen-center line ---------------
    for g in range(8):
        t = (g + 1) * 0.15
        gx = light_x + (cx - light_x) * t
        gy = light_y + (cy - light_y) * t
        gsize = (25.0 + g * 30.0) * scale
        dist = jnp.sqrt((xs - gx) ** 2 + (ys - gy) ** 2)
        alpha = jnp.where(
            dist < gsize,
            (1.0 - dist / gsize) ** 2 * (1.0 - g * 0.08) * intensity,
            0.0,
        )
        flare = flare + alpha[..., None] * jnp.array([1.0, 0.9, 0.7])

    # -- diffraction rings with dispersion-tinted colors ------------------
    ring_colors = (
        jnp.array([0.3, 0.4, 1.0]),
        jnp.array([0.5, 0.5, 0.9]),
        jnp.array([0.7, 0.5, 0.8]),
    )
    for i in range(3):
        ring_t = 0.35 + i * 0.15
        rx = light_x + (cx - light_x) * ring_t
        ry = light_y + (cy - light_y) * ring_t
        ring_r = (60.0 + i * 40.0) * scale
        ring_w = (6.0 + i * 3.0) * scale
        dist = jnp.sqrt((xs - rx) ** 2 + (ys - ry) ** 2)
        alpha = (
            jnp.clip(1.0 - jnp.abs(dist - ring_r) / ring_w, 0.0, 1.0) ** 2
            * 0.5
            * intensity
            * (1.0 - i * 0.25)
        )
        flare = flare + alpha[..., None] * ring_colors[i]

    # -- hexagonal aperture ring ------------------------------------------
    hx = light_x + (cx - light_x) * 0.5
    hy = light_y + (cy - light_y) * 0.5
    hex_r = 100.0 * scale
    dx = xs - hx
    dy = ys - hy
    angle = jnp.arctan2(dy, dx)
    dist = jnp.sqrt(dx**2 + dy**2)
    hex_edge = jnp.abs(jnp.mod(angle, jnp.pi / 3.0) - jnp.pi / 6.0)
    hex_factor = jnp.clip(1.0 - hex_edge / 0.2, 0.0, 1.0)
    alpha = (
        jnp.clip(1.0 - jnp.abs(dist - hex_r) / (15.0 * scale), 0.0, 1.0) ** 2
        * hex_factor
        * 0.3
        * intensity
    )
    flare = flare + alpha[..., None] * jnp.array([0.6, 0.7, 1.0])

    # -- 4 star streaks -----------------------------------------------------
    streak_len = min(w, h) * 0.4
    dx = xs - light_x
    dy = ys - light_y
    dist = jnp.sqrt(dx**2 + dy**2)
    angle = jnp.arctan2(dy, dx)
    falloff = jnp.exp(-dist / streak_len)
    streak_col = jnp.array([1.0, 0.95, 0.9])
    for main_angle in (0.0, jnp.pi / 2, jnp.pi, 3 * jnp.pi / 2):
        diff = jnp.abs(jnp.mod(angle - main_angle + jnp.pi, 2 * jnp.pi) - jnp.pi)
        streak = jnp.where(diff < 0.05, falloff * intensity * 0.3, 0.0)
        flare = flare + streak[..., None] * streak_col

    out = jnp.clip(final + flare, 0.0, 1.0)
    # Disabled when the disk is essentially dark (reference guard).
    return jnp.where(total < 0.01, final, out)
