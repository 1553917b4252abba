"""Disk V2 palette: temperature + intensity -> RGB.

The reference lists palette.py ('scientific' / 'cinematic') as planned
but unbuilt (docs/design_ad_v2.md:454-470). Two mappings:

  * scientific: blackbody chromaticity at a physical temperature scale,
    luminance directly proportional to integrated intensity.
  * cinematic: warm-shifted blackbody with soft Reinhard luminance
    roll-off, matching the main renderer's look (color clamped so white
    never drifts blue, like the V1 compose).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.shading import blackbody_rgb


def apply_palette(
    intensity: jnp.ndarray,
    temperature: jnp.ndarray,
    mode: str = "cinematic",
    *,
    t_min: float = 2000.0,
    t_max: float = 12000.0,
    exposure: float = 1.0,
) -> jnp.ndarray:
    """Map (intensity, normalized temperature in [0, 1]) -> RGB.

    Args:
        intensity: (N,) nonnegative path-integrated intensities.
        temperature: (N,) normalized temperatures (0 = coolest visible).
        mode: "scientific" | "cinematic".
    Returns:
        (N, 3) RGB in [0, 1].
    """
    temp_n = jnp.clip(temperature, 0.0, 1.0)
    t_k = t_min + temp_n * (t_max - t_min)
    color = blackbody_rgb(t_k)

    if mode == "scientific":
        lum = jnp.clip(intensity * exposure, 0.0, 1.0)
    elif mode == "cinematic":
        # Warm shift: damp blue, never exceed red; Reinhard luminance.
        color = color.at[..., 2].set(
            jnp.minimum(color[..., 2] * 0.85, color[..., 0])
        )
        x = intensity * exposure
        lum = x / (1.0 + x)
    else:
        raise ValueError(f"unknown palette mode: {mode}")
    return jnp.clip(color * lum[..., None], 0.0, 1.0)
