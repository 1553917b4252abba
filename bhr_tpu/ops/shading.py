"""Color and relativistic shading ops (pure JAX, fully vectorized).

Parity targets in the reference:
  - `_blackbody_rgb`        /root/reference/render.py:136-150
  - `_color_temp_to_tint`   /root/reference/render.py:2407-2437 (scalar Taichi func)
  - `_apply_g_factor`       /root/reference/render.py:2439-2516 (per-hit Taichi func)

The reference evaluates these per-pixel inside the ray-march kernel; here
they run as a single vectorized pass over recorded disk hits, which lets
XLA fuse the whole shading chain into a few VPU loops.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import (
    DISK_COLOR_TEMPERATURE,
    DISK_RADIAL_BRIGHTNESS_MAX,
    DISK_RADIAL_BRIGHTNESS_MIN,
    DISK_RADIAL_BRIGHTNESS_POWER,
    G_BRIGHTNESS_GAIN,
    G_FACTOR_CAP,
    G_LUMINOSITY_POWER,
    RS,
)


def pow_const(x: jnp.ndarray, p: float) -> jnp.ndarray:
    """x**p with square-and-multiply for small integer and half-integer
    exponents (p = k/2, e.g. 1.5 -> x*sqrt(x)).

    XLA's algebraic simplifier only strength-reduces a handful of
    exponents (0.5, 1, 2); anything else lowers to exp(p*log(x)) —
    tens of VPU ops where the integer case needs a few multiplies and
    the half-integer case one extra sqrt.
    Valid for x >= 0 (all call sites are alphas/profiles/g-factors >= 0).
    """
    if float(2.0 * p).is_integer() and 0.5 <= p <= 16.0:
        n = int(2.0 * p)
        acc = jnp.sqrt(x) if n & 1 else None
        n >>= 1
        base = x
        while n:
            if n & 1:
                acc = base if acc is None else acc * base
            n >>= 1
            if n:
                base = base * base
        return acc
    return jnp.power(x, p)


def keplerian_omega(r_vals: jnp.ndarray) -> jnp.ndarray:
    """omega(r) = sqrt(0.5 / r^3) — THE disk rotation law (reference
    render.py:2451, 930). Single source: texture roll, entity advection,
    background noise rotation, and relativistic beaming must co-rotate,
    so every layer imports this one definition."""
    return jnp.sqrt(0.5 / (r_vals**3 + 1e-6))


def blackbody_rgb(temp_k: jnp.ndarray) -> jnp.ndarray:
    """Kelvin -> linear RGB using the Tanner Helland piecewise fit.

    Args:
        temp_k: temperatures in Kelvin, any shape.
    Returns:
        RGB array with a trailing channel axis, values in [0, 1].
    """
    t = temp_k / 100.0
    safe = jnp.maximum(t - 60.0, 1e-6)
    r = jnp.where(t <= 66.0, 1.0, jnp.clip(1.292936 * jnp.power(safe, -0.1332047592), 0.0, 1.0))
    g = jnp.where(
        t <= 66.0,
        jnp.clip(0.390082 * jnp.log(jnp.maximum(t, 1e-6)) - 0.631841, 0.0, 1.0),
        jnp.clip(1.129891 * jnp.power(safe, -0.0755148492), 0.0, 1.0),
    )
    b = jnp.where(
        t >= 66.0,
        1.0,
        jnp.where(
            t <= 19.0,
            0.0,
            jnp.clip(0.543207 * jnp.log(jnp.maximum(t - 10.0, 1e-6)) - 1.19625, 0.0, 1.0),
        ),
    )
    return jnp.stack([r, g, b], axis=-1)


def color_temp_tint(color_temp: float = DISK_COLOR_TEMPERATURE) -> jnp.ndarray:
    """Scalar color-temperature tint as an RGB triple."""
    return blackbody_rgb(jnp.asarray(color_temp, dtype=jnp.float32))


def apply_g_factor(
    base_color: jnp.ndarray,
    hit_pos: jnp.ndarray,
    hit_r: jnp.ndarray,
    ray_dir_to_cam: jnp.ndarray,
    cam_pos: jnp.ndarray,
    r_inner: float,
    r_outer: float,
    tilt_rad: float,
    color_temp: float = DISK_COLOR_TEMPERATURE,
) -> jnp.ndarray:
    """Relativistic disk shading: Doppler beaming + gravitational redshift.

    All inputs are batched over an arbitrary leading shape ``B``:
        base_color:     (*B, 3) disk texture RGB at the hit.
        hit_pos:        (*B, 3) world-space hit position on the disk plane.
        hit_r:          (*B,)   cylindrical hit radius.
        ray_dir_to_cam: (*B, 3) direction from hit back toward the camera.
        cam_pos:        (3,)    camera position.

    Pipeline (matches reference math, reference render.py:2439-2516):
      Keplerian omega = sqrt(0.5/r^3); beta = r*omega/sqrt(1-rs/r) capped
      at 0.99; disk flow direction v_hat = r_hat x n_disk(tilt);
      g = min(g_doppler * g_grav, cap); Reinhard-style brightness
      gain*g^p/(1+g^p/cap); radial boost (1-radial_t)^1.2 in [0.2, 8];
      Wien-approximation per-channel wavelength shift normalized to green;
      final tint by the global disk color temperature.
    """
    rs = jnp.float32(RS)
    r_obs = jnp.linalg.norm(cam_pos)
    r_em = jnp.linalg.norm(hit_pos, axis=-1)
    r_safe = jnp.maximum(r_em, rs + 1e-3)

    omega = keplerian_omega(r_safe)
    lorentz = jnp.sqrt(jnp.maximum(1.0 - rs / r_safe, 1e-6))
    beta = jnp.minimum(r_safe * omega / jnp.maximum(lorentz, 1e-6), 0.99)
    gamma = 1.0 / jnp.sqrt(jnp.maximum(1.0 - beta * beta, 1e-6))

    sin_t = jnp.sin(tilt_rad)
    cos_t = jnp.cos(tilt_rad)
    disk_normal = jnp.array([0.0, -sin_t, cos_t], dtype=jnp.float32)
    r_hat = hit_pos / jnp.maximum(r_em, 1e-9)[..., None]
    v_hat = jnp.cross(r_hat, jnp.broadcast_to(disk_normal, r_hat.shape))
    v_norm = jnp.linalg.norm(v_hat, axis=-1, keepdims=True)
    v_fallback = jnp.array([0.0, 1.0, 0.0], dtype=jnp.float32)
    v_hat = jnp.where(v_norm > 1e-6, v_hat / jnp.maximum(v_norm, 1e-9), v_fallback)

    ray_hat = ray_dir_to_cam / jnp.maximum(
        jnp.linalg.norm(ray_dir_to_cam, axis=-1, keepdims=True), 1e-9
    )
    cos_theta = jnp.sum(v_hat * ray_hat, axis=-1)
    denom = jnp.maximum(1.0 - beta * cos_theta, 1e-3)
    g_doppler = 1.0 / (gamma * denom)

    grav_num = jnp.sqrt(jnp.maximum(1.0 - rs / jnp.maximum(r_obs, rs + 1e-3), 1e-6))
    grav_den = jnp.sqrt(jnp.maximum(1.0 - rs / jnp.maximum(r_em, rs + 1e-3), 1e-6))
    g_grav = grav_num / grav_den

    g = jnp.minimum(g_doppler * g_grav, G_FACTOR_CAP)
    # pow_const strength-reduces the default 1.5 to g*sqrt(g) and stays
    # correct if G_LUMINOSITY_POWER is ever retuned.
    intensity = pow_const(jnp.maximum(g, 0.0), G_LUMINOSITY_POWER)
    brightness = G_BRIGHTNESS_GAIN * intensity / (1.0 + intensity / G_FACTOR_CAP)

    radial_span = max(r_outer - r_inner, 1e-3)
    radial_t = jnp.clip((jnp.maximum(hit_r, r_inner) - r_inner) / radial_span, 0.0, 1.0)
    radial_profile = jnp.power(1.0 - radial_t, DISK_RADIAL_BRIGHTNESS_POWER)
    radial_boost = DISK_RADIAL_BRIGHTNESS_MIN + (
        DISK_RADIAL_BRIGHTNESS_MAX - DISK_RADIAL_BRIGHTNESS_MIN
    ) * radial_profile
    brightness = brightness * radial_boost

    # Wien-approximation chromatic shift: B(lambda, gT)/B(lambda, T)
    # ~ exp(x * (1 - 1/g)) with x = hc/(lambda k T) at T~1e4 K for R/G/B
    # wavelengths 650/530/460nm -> x = 2.21 / 2.72 / 3.13, normalized so
    # the green channel is invariant.
    g_safe = jnp.maximum(g, 0.1)
    wien = 1.0 - 1.0 / g_safe
    # exp(x_c*w)/exp(x_g*w) == exp((x_c-x_g)*w): two exps, no division.
    r_scale = jnp.minimum(jnp.exp((2.21 - 2.72) * wien), 3.0)
    b_scale = jnp.minimum(jnp.exp((3.13 - 2.72) * wien), 3.0)

    shifted = jnp.stack(
        [
            base_color[..., 0] * r_scale,
            base_color[..., 1],
            base_color[..., 2] * b_scale,
        ],
        axis=-1,
    )
    tint = color_temp_tint(color_temp)
    return jnp.clip(shifted * tint * brightness[..., None], 0.0, 10.0)
