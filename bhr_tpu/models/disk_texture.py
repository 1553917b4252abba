"""Procedural accretion-disk texture: structure generators + compose.

Polar (n_r, n_phi, RGBA) texture built from layered structure fields,
mirroring the reference's recipe (/root/reference/render.py:795-2010)
with one JAX implementation replacing its duplicated CPU/GPU paths:

  density = (0.15 + 0.10 spiral + 0.30 turbulence + 0.20 hotspot
             + 0.30 filaments + 0.20 rt) * disturb_mod * edge / P98
  temperature = max(temp_base clamped per-row, temp_struct / P95 * 0.8)
  RGB = blackbody(T_min + temp*(0.9+0.25 az) * (T_max-T_min)) * sqrt(T)
  alpha = density

All generators are batched over their structure instances (padded to a
static max count with zero-intensity padding) instead of Python loops —
each becomes a handful of fused broadcast/reduce ops on device. The
low-resolution generation + upscale optimization (generation_scale in
{1,2,4}) is preserved via nearest-neighbor kron upscale.

RNG: jax.random keyed; determinism-by-seed holds, but streams differ
from the reference's NumPy RNG (statistical parity, per SURVEY.md §7).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..constants import (
    DISK_COLOR_TEMPERATURE,
    DISK_GENERATION_SCALE_CHOICES,
    ENABLE_DISK_SPIRAL_ARMS,
)
from ..ops.noise import fbm_noise, periodic_pixel_noise, tileable_noise
from ..ops.shading import blackbody_rgb, keplerian_omega  # noqa: F401 — keplerian_omega re-exported
from ..utils.io import compute_edge_alpha


def _validate_scale(generation_scale: int) -> int:
    if generation_scale not in DISK_GENERATION_SCALE_CHOICES:
        raise ValueError(
            f"disk_generation_scale must be one of "
            f"{DISK_GENERATION_SCALE_CHOICES}, got {generation_scale}"
        )
    return generation_scale


def _upscale(field: jnp.ndarray, scale: int, n_r: int, n_phi: int) -> jnp.ndarray:
    """Nearest-neighbor (kron) upscale back to full resolution."""
    if scale == 1:
        return field[:n_r, :n_phi]
    up = jnp.repeat(jnp.repeat(field, scale, axis=0), scale, axis=1)
    return up[:n_r, :n_phi]


def _polar_grids(n_r: int, n_phi: int):
    phi = jnp.linspace(0.0, 2.0 * jnp.pi, n_phi, endpoint=False)
    r_norm = jnp.linspace(0.0, 1.0, n_r)
    phi_g, r_g = jnp.meshgrid(phi, r_norm)
    return phi_g, r_g


def _roll_rows_by(field: jnp.ndarray, shifts: jnp.ndarray) -> jnp.ndarray:
    """Per-row circular shift along phi by -shifts[r] pixels (vectorized
    take_along_axis; replaces the reference's per-row np.roll loops)."""
    n_phi = field.shape[1]
    cols = jnp.arange(n_phi)[None, :]
    src = jnp.mod(cols + shifts[:, None], n_phi)
    return jnp.take_along_axis(field, src, axis=1)


# ---------------------------------------------------------------------------
# Structure generators. Each takes a PRNG key and returns field(s) at
# full (n_r, n_phi) resolution. "Low-res" generation uses n/scale grids.
# ---------------------------------------------------------------------------


def generate_temperature_base(key, n_r: int, n_phi: int) -> jnp.ndarray:
    """Radially decaying temperature floor with FBM modulation, <= 0.25."""
    _, r_g = _polar_grids(n_r, n_phi)
    k1, k2 = jax.random.split(key)
    decay = jnp.clip(1.0 - r_g, 0.0, 1.0) ** 1.3
    coarse = fbm_noise(k1, (n_r, n_phi), octaves=4, persistence=0.6,
                       base_scale=8, wrap_u=True)
    fine = fbm_noise(k2, (n_r, n_phi), octaves=5, persistence=0.45,
                     base_scale=3, wrap_u=True)
    noise = 0.6 * coarse + 0.4 * fine
    return jnp.clip(decay * (0.85 + 0.15 * noise), 0.0, 1.0) * 0.25


def generate_spiral_arms(
    key, n_r: int, n_phi: int, generation_scale: int = 2,
    enabled: bool = ENABLE_DISK_SPIRAL_ARMS,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Segmented logarithmic spiral arms (disabled by default, matching
    the reference kill-switch ENABLE_DISK_SPIRAL_ARMS=False).

    When enabled: 2-4 arms x 4-8 sub-arm segments along the radial span,
    von-Mises azimuthal profile around the spiral phase
    phi - base_angle + r * rotations * 2pi, noise-modulated width and
    intensity, hard radial segment masks with small edge fades.
    """
    if not enabled:
        zeros = jnp.zeros((n_r, n_phi))
        return zeros, zeros

    scale = _validate_scale(generation_scale)
    lr, lp = n_r // scale, n_phi // scale
    phi_g, r_g = _polar_grids(lr, lp)

    max_arms = 4
    max_subs = 8
    keys = jax.random.split(key, 12)
    n_arms = jax.random.randint(keys[0], (), 2, 5)
    n_from_center = jax.random.randint(keys[1], (), 2, 4)

    arm_idx = jnp.arange(max_arms)
    r_start = jnp.where(
        arm_idx < n_from_center,
        0.0,
        jax.random.uniform(keys[2], (max_arms,), minval=0.05, maxval=0.5),
    )
    base_angle = jnp.where(
        arm_idx < n_from_center,
        arm_idx * 2.0 * jnp.pi / jnp.maximum(n_from_center, 1),
        jax.random.uniform(keys[3], (max_arms,), maxval=2.0 * jnp.pi),
    )
    rotations = jax.random.uniform(keys[4], (max_arms,), minval=2.5, maxval=5.0)
    base_width = jax.random.uniform(keys[5], (max_arms,), minval=0.2, maxval=0.4)
    arm_delta_t = jax.random.uniform(keys[6], (max_arms,), minval=0.1, maxval=0.3)
    arm_alive = (arm_idx < n_arms).astype(jnp.float32)

    r_length = jnp.minimum(rotations / 6.0 * (1.0 - r_start), 1.0 - r_start)
    sub_fill = jax.random.uniform(keys[7], (max_arms,), minval=0.4, maxval=0.6)
    sub_len_raw = jax.random.uniform(
        keys[8], (max_arms, max_subs), minval=0.08, maxval=0.20
    )
    sub_count = jax.random.randint(keys[9], (max_arms,), 4, 9)
    sub_alive = (jnp.arange(max_subs)[None, :] < sub_count[:, None]).astype(
        jnp.float32
    )
    sub_len_raw = sub_len_raw * sub_alive
    sub_lengths = (
        sub_len_raw
        / (jnp.sum(sub_len_raw, axis=1, keepdims=True) + 1e-9)
        * (r_length * sub_fill)[:, None]
    )
    gaps = jax.random.uniform(keys[10], (max_arms, max_subs), minval=0.08, maxval=0.15)
    starts = jnp.cumsum(
        jnp.concatenate(
            [jnp.zeros((max_arms, 1)), sub_lengths[:, :-1] + gaps[:, :-1]], axis=1
        ),
        axis=1,
    ) + r_start[:, None]

    sub_widths = jnp.clip(
        base_width[:, None]
        * jax.random.uniform(keys[11], (max_arms, max_subs), minval=0.3, maxval=2.5),
        0.06, 1.2,
    )
    sub_int = jax.random.uniform(
        jax.random.fold_in(key, 99), (max_arms, max_subs), minval=0.1, maxval=0.7
    ) * sub_alive * arm_alive[:, None]

    arm_noise = tileable_noise(jax.random.fold_in(key, 100), (lr, lp))
    width_mod = jnp.clip(0.2 + 1.5 * arm_noise, 0.15, 3.0)
    intensity_mod = 0.1 + 0.9 * (arm_noise ** 0.15)

    arm_angle = (
        phi_g[None] - base_angle[:, None, None]
        + r_g[None] * rotations[:, None, None] * 2.0 * jnp.pi
    )  # (A, lr, lp)

    spiral = jnp.zeros((lr, lp))
    temp = jnp.zeros((lr, lp))
    fade_edge = 0.02
    for s in range(max_subs):
        sr = starts[:, s][:, None, None]
        sr_end = sr + sub_lengths[:, s][:, None, None]
        kappa = 1.5 / (sub_widths[:, s][:, None, None] ** 2)
        val = jnp.exp(kappa * (jnp.cos(arm_angle) - 1.0) * width_mod[None])
        mask = (r_g[None] >= sr) & (r_g[None] <= sr_end)
        fade_in = jnp.clip((r_g[None] - sr) / fade_edge, 0.0, 1.0)
        fade_out = jnp.clip((sr_end - r_g[None]) / fade_edge, 0.0, 1.0)
        val = jnp.where(mask, val, 0.0) * fade_in * fade_out
        val = val * sub_int[:, s][:, None, None] * intensity_mod[None]
        spiral = spiral + jnp.sum(val, axis=0)
        temp = temp + jnp.sum(val * arm_delta_t[:, None, None], axis=0)

    spiral = jnp.clip(spiral / (jnp.max(spiral) + 1e-6), 0.0, 1.0)
    return (
        _upscale(spiral, scale, n_r, n_phi),
        _upscale(temp, scale, n_r, n_phi),
    )


def generate_turbulence(
    key, n_r: int, n_phi: int, generation_scale: int = 2,
    t_offset: float = 0.0, omega_rows: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """5-layer cloudy turbulence with Keplerian shear roll + pixel grain.

    Returns (turbulence, kep_shift_pixels (n_r,), temp_contribution).
    The shear roll offsets each radial row's phi by a Keplerian-profile
    pixel count (reference render.py:1309-1382).
    """
    scale = _validate_scale(generation_scale)
    lr, lp = n_r // scale, n_phi // scale
    _, r_g = _polar_grids(lr, lp)
    r_low = r_g[:, 0]

    keys = jax.random.split(key, 7)
    shear_strength = jax.random.uniform(keys[0], (), minval=3.0, maxval=6.0)
    kep_shear = jnp.clip(
        shear_strength * (1.0 / (r_low + 0.3) ** 1.5 - 0.8),
        0.0, shear_strength * 8.0,
    )
    shift_low = jnp.clip(
        (kep_shear / (2.0 * jnp.pi) * lp).astype(jnp.int32), -lp // 4, lp // 4
    )

    layers = [
        tileable_noise(keys[1], (lr, lp)),
        tileable_noise(keys[2], (lr, lp)),
        tileable_noise(keys[3], (lr, lp)),
        tileable_noise(keys[4], (lr, lp)),
        tileable_noise(keys[5], (lr, lp)),
    ]
    # Keplerian shear: roll each row by +shift (reference np.roll(+shift)
    # rolls content right; our _roll_rows_by(-s) matches).
    layers = [_roll_rows_by(l, -shift_low) for l in layers]

    if t_offset != 0.0 and omega_rows is not None:
        omega_low = omega_rows[::scale]
        rot = (t_offset * omega_low / (2.0 * jnp.pi) * lp).astype(jnp.int32)
        layers = [_roll_rows_by(l, rot) for l in layers]

    pixel = periodic_pixel_noise(keys[6], (lr, lp))
    if t_offset != 0.0 and omega_rows is not None:
        pixel = _roll_rows_by(pixel, rot)

    w = (0.08, 0.15, 0.25, 0.22, 0.18)
    turb_low = sum(wi * li for wi, li in zip(w, layers)) + 0.12 * jnp.clip(
        pixel, 0.0, 1.0
    )
    turbulence = _upscale(turb_low, scale, n_r, n_phi)
    temp = 0.05 * jnp.clip(turbulence, 0.0, 1.0)

    # Full-res shear pixel counts for downstream disturbance generation.
    r_full = jnp.linspace(0.0, 1.0, n_r)
    kep_full = jnp.clip(
        shear_strength * (1.0 / (r_full + 0.3) ** 1.5 - 0.8),
        0.0, shear_strength * 8.0,
    )
    shift_full = jnp.clip(
        (kep_full / (2.0 * jnp.pi) * n_phi).astype(jnp.int32),
        -n_phi // 4, n_phi // 4,
    )
    return turbulence, shift_full, temp


def generate_filaments(
    key, n_r: int, n_phi: int, generation_scale: int = 2,
    max_count: int = 300, max_subs: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """150-300 azimuthally elongated filaments with 2-4 sub-segments.

    Thin radial Gaussians x wide von-Mises azimuthal profiles — the
    reference's dominant texture detail (render.py:1385-1491). Fully
    batched: (count*subs, lr, lp) broadcast evaluated in chunks.
    """
    scale = _validate_scale(generation_scale)
    lr, lp = n_r // scale, n_phi // scale
    phi_g, r_g = _polar_grids(lr, lp)

    keys = jax.random.split(key, 12)
    count = jax.random.randint(keys[0], (), 150, 301)
    alive = (jnp.arange(max_count) < count).astype(jnp.float32)

    phi_start = jax.random.uniform(keys[1], (max_count,), maxval=2.0 * jnp.pi)
    r_pos = jax.random.uniform(keys[2], (max_count,), minval=0.05, maxval=0.95)
    base_r = 0.05 + r_pos**0.6 * 0.9
    base_width = jax.random.uniform(keys[3], (max_count,), minval=0.002, maxval=0.008)
    total_len = jax.random.uniform(keys[4], (max_count,), minval=0.5, maxval=1.2)
    intensity = jax.random.uniform(keys[5], (max_count,), minval=0.7, maxval=1.0)
    delta_t = 0.3 + 0.6 * jax.random.beta(keys[6], 0.3, 1.0, (max_count,))

    sub_count = jax.random.randint(keys[7], (max_count,), 2, 5)
    sub_alive = (
        jnp.arange(max_subs)[None, :] < sub_count[:, None]
    ).astype(jnp.float32) * alive[:, None]
    sub_fill = jax.random.uniform(keys[8], (max_count,), minval=0.35, maxval=0.55)
    sub_len_raw = jax.random.uniform(
        keys[9], (max_count, max_subs), minval=0.08, maxval=0.20
    ) * sub_alive
    sub_lengths = (
        sub_len_raw
        / (jnp.sum(sub_len_raw, axis=1, keepdims=True) + 1e-9)
        * (total_len * sub_fill)[:, None]
    )
    gaps = jax.random.uniform(keys[10], (max_count, max_subs), minval=0.08, maxval=0.20)
    sub_starts = phi_start[:, None] + jnp.cumsum(
        jnp.concatenate(
            [jnp.zeros((max_count, 1)), sub_lengths[:, :-1] + gaps[:, :-1]],
            axis=1,
        ),
        axis=1,
    )
    sub_widths = jnp.clip(
        base_width[:, None]
        * jax.random.uniform(keys[11], (max_count, max_subs), minval=0.3, maxval=3.0),
        0.001, 0.025,
    )
    sub_int = intensity[:, None] * jax.random.uniform(
        jax.random.fold_in(key, 77), (max_count, max_subs), minval=0.15, maxval=1.0
    ) * sub_alive

    phi_range = sub_lengths / (base_r[:, None] + 0.01)
    phi_half = jnp.maximum(phi_range * 0.7, 0.2)
    kappa = 1.5 / (phi_half**2)  # (C, S)

    arcs = jnp.zeros((lr, lp))
    temp = jnp.zeros((lr, lp))
    chunk = 75
    for c0 in range(0, max_count, chunk):
        c1 = min(c0 + chunk, max_count)
        acc_d = jnp.zeros((c1 - c0, lr, lp))
        for s in range(max_subs):
            az = jnp.exp(
                kappa[c0:c1, s][:, None, None]
                * (jnp.cos(phi_g[None] - sub_starts[c0:c1, s][:, None, None]) - 1.0)
            )
            rp = jnp.exp(
                -0.5
                * (
                    (r_g[None] - base_r[c0:c1][:, None, None])
                    / sub_widths[c0:c1, s][:, None, None]
                )
                ** 2
            )
            acc_d = acc_d + az * rp * sub_int[c0:c1, s][:, None, None]
        arcs = arcs + jnp.sum(acc_d, axis=0)
        temp = temp + jnp.sum(
            acc_d * (delta_t[c0:c1] * 0.7)[:, None, None], axis=0
        )

    arcs_full = jnp.clip(_upscale(arcs, scale, n_r, n_phi), 0.0, 1.0)
    temp_full = jnp.clip(
        _upscale(temp, scale, n_r, n_phi), 0.0, arcs_full * 0.5
    )
    return arcs_full, temp_full


def generate_rt_spikes(
    key, n_r: int, n_phi: int, disk_area: float, enable_rt: bool = True,
    generation_scale: int = 2, max_count: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rayleigh-Taylor instability fingers, biased toward the inner disk.

    The padded slot count covers the draw's true upper bound
    ``30 * disk_area * 0.8`` (reference render.py:1517): disk_area is a
    host-side float, so the shape stays static per scene while wide
    disks get their full 100s of fingers instead of a silent cap.
    """
    if not enable_rt:
        zeros = jnp.zeros((n_r, n_phi))
        return zeros, zeros

    scale = _validate_scale(generation_scale)
    lr, lp = n_r // scale, n_phi // scale
    phi_g, r_g = _polar_grids(lr, lp)

    if max_count is None:
        max_count = max(int(30.0 * disk_area * 0.8) + 1, 1)
    keys = jax.random.split(key, 7)
    count_f = jax.random.uniform(keys[0], (), minval=15.0, maxval=30.0)
    count = (count_f * disk_area * 0.8).astype(jnp.int32)
    alive = (jnp.arange(max_count) < count).astype(jnp.float32)

    phis = jax.random.uniform(keys[1], (max_count,), maxval=2.0 * jnp.pi)
    r_bases = jnp.power(
        jax.random.uniform(keys[2], (max_count,), minval=0.01, maxval=0.15), 1.5
    )
    phi_widths = jax.random.uniform(keys[3], (max_count,), minval=0.08, maxval=0.20)
    r_lengths = jax.random.uniform(keys[4], (max_count,), minval=0.08, maxval=0.20)
    intensities = jax.random.uniform(keys[5], (max_count,), minval=0.8, maxval=1.0)
    delta_ts = jax.random.uniform(keys[6], (max_count,), minval=0.5, maxval=1.2)

    kappa = 1.5 / (phi_widths**2)
    spikes = jnp.zeros((lr, lp))
    temp = jnp.zeros((lr, lp))
    chunk = 75  # bound the (chunk, lr, lp) broadcast like generate_filaments
    for c0 in range(0, max_count, chunk):
        c1 = min(c0 + chunk, max_count)
        az = jnp.exp(
            kappa[c0:c1][:, None, None]
            * (jnp.cos(phi_g[None] - phis[c0:c1][:, None, None]) - 1.0)
        )
        r_diff = r_g[None] - r_bases[c0:c1][:, None, None]
        rl = r_lengths[c0:c1][:, None, None]
        fade_out = jnp.clip(rl * 2.0 - r_diff, 0.0, 1.0)
        fade_in = jnp.clip(r_diff / (rl * 0.3), 0.0, 1.0)
        r_prof = jnp.exp(-0.5 * (r_diff / (rl * 0.4)) ** 2) * fade_out * fade_in
        val = az * r_prof * (intensities * alive)[c0:c1][:, None, None]
        spikes = spikes + jnp.sum(val, axis=0)
        temp = temp + jnp.sum(val * delta_ts[c0:c1][:, None, None], axis=0)
    spikes = jnp.clip(spikes, 0.0, 1.0)
    return (
        _upscale(spikes, scale, n_r, n_phi),
        _upscale(temp, scale, n_r, n_phi),
    )


def generate_hotspots(
    key, n_r: int, n_phi: int, max_count: int = 40,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """20-40 roughly circular bright patches (full resolution)."""
    phi_g, r_g = _polar_grids(n_r, n_phi)
    keys = jax.random.split(key, 6)
    count_f = jax.random.uniform(keys[0], (), minval=20.0, maxval=40.0)
    alive = (jnp.arange(max_count) < count_f.astype(jnp.int32)).astype(jnp.float32)

    phis = jax.random.uniform(keys[1], (max_count,), maxval=2.0 * jnp.pi)
    rs = 0.1 + jax.random.uniform(keys[2], (max_count,)) ** 0.6 * 0.85
    phi_w = jax.random.uniform(keys[3], (max_count,), minval=0.08, maxval=0.20)
    r_w = 0.02 + jax.random.uniform(keys[4], (max_count,), maxval=0.03)
    inten = 0.3 + (1.0 - rs) * 0.6 + jax.random.uniform(keys[5], (max_count,), maxval=0.1)

    kappa = 1.5 / (phi_w**2)
    val = jnp.exp(
        kappa[:, None, None] * (jnp.cos(phi_g[None] - phis[:, None, None]) - 1.0)
    )
    val = val * jnp.exp(
        -0.5 * ((r_g[None] - rs[:, None, None]) / r_w[:, None, None]) ** 2
    )
    val = val * (inten * alive)[:, None, None]
    hotspot = jnp.clip(jnp.sum(val, axis=0), 0.0, 1.0)
    # Temperature contribution is the 0.12 aggregate (the reference draws
    # per-instance delta_Ts but never uses them, render.py:1626, 1659).
    return hotspot, 0.12 * hotspot


def generate_azimuthal_hotspot(
    key, n_r: int, n_phi: int, generation_scale: int = 2,
    t_offset: float = 0.0, omega_rows: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Low-frequency sinusoidal azimuthal wave x FBM (sheared by radius)."""
    scale = _validate_scale(generation_scale)
    lr, lp = n_r // scale, n_phi // scale
    phi_g, r_g = _polar_grids(lr, lp)
    k1, k2, k3 = jax.random.split(key, 3)
    az_freq = jax.random.randint(k1, (), 2, 5)
    shear = r_g**1.2 * jax.random.uniform(k2, (), minval=2.0, maxval=4.0)
    wave = 0.5 + 0.5 * jnp.sin((phi_g + shear) * az_freq)
    noise = fbm_noise(k3, (lr, lp), octaves=3, persistence=0.5,
                      base_scale=3, wrap_u=True)
    if t_offset != 0.0 and omega_rows is not None:
        rot = (t_offset * omega_rows[::scale] / (2.0 * jnp.pi) * lp).astype(jnp.int32)
        noise = _roll_rows_by(noise, rot)
    return _upscale(wave * noise, scale, n_r, n_phi)


def generate_disturbance_mod(
    key, n_r: int, n_phi: int, kep_shift_pixels: jnp.ndarray,
    generation_scale: int = 2, t_offset: float = 0.0,
    omega_rows: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-scale multiplicative disturbance field in [0.1, 1]."""
    scale = _validate_scale(generation_scale)
    lr, lp = n_r // scale, n_phi // scale
    _, r_g = _polar_grids(lr, lp)
    keys = jax.random.split(key, 5)

    shift_low = (kep_shift_pixels[::scale] // scale).astype(jnp.int32)
    layers = [
        tileable_noise(keys[0], (lr, lp)),
        tileable_noise(keys[1], (lr, lp)),
        tileable_noise(keys[2], (lr, lp)),
        tileable_noise(keys[3], (lr, lp)),
    ]
    layers = [_roll_rows_by(l, -shift_low) for l in layers]
    if t_offset != 0.0 and omega_rows is not None:
        rot = (t_offset * omega_rows[::scale] / (2.0 * jnp.pi) * lp).astype(jnp.int32)
        layers = [_roll_rows_by(l, rot) for l in layers]

    pixel = periodic_pixel_noise(keys[4], (lr, lp))
    if t_offset != 0.0 and omega_rows is not None:
        pixel = _roll_rows_by(pixel, rot)

    mod = (
        0.05 * layers[0] + 0.15 * layers[1] + 0.30 * layers[2]
        + 0.30 * layers[3] + 0.20 * pixel
    )
    mod = jnp.clip(mod * 1.4, 0.05, 1.0)
    mod = jnp.clip(mod * (0.6 + 0.4 * r_g), 0.1, 1.0)
    return _upscale(mod, scale, n_r, n_phi)


# ---------------------------------------------------------------------------
# Compose: 13-component contract (reference render.py:3169-3259 /
# 1014-1021) + percentile normalization stats.
# ---------------------------------------------------------------------------

# Component-field pack order — the shared CPU/GPU contract the reference
# uses (upload_parametric_state, render.py:2328-2350):
#   0 temp_base 1 spiral 2 spiral_temp 3 turbulence 4 turb_temp
#   5 arcs 6 arcs_temp 7 rt_spikes 8 rt_temp 9 hotspot 10 hotspot_temp
#   11 az_hotspot 12 disturb_mod
N_COMPONENTS = 13


def density_from_comp(comp, edge, enable_rt: bool):
    """Weighted density mix of the 13-component pack — THE density
    contract (reference render.py:1951 / 3189). Single source shared by
    the compose kernel and both stats paths (exact + histogram-approx):
    stats must be computed for exactly the field that gets composed."""
    rt_w = 0.20 if enable_rt else 0.0
    return (
        0.15 + 0.10 * comp[1] + 0.30 * comp[3] + 0.20 * comp[9]
        + 0.30 * comp[5] + rt_w * comp[7]
    ) * comp[12] * edge[:, None]


def temp_struct_from_comp(comp):
    """Structural-temperature sum of the 13-component pack (reference
    render.py:3196) — shared like density_from_comp."""
    return (comp[2] + comp[4] + comp[6] + comp[8] + comp[10]) * comp[12]


def _field_stats(density, temp_struct):
    """Exact percentile normalization stats from mixed fields:
    (density P98, positive-struct P95, per-row [max, P70] of the scaled
    struct field) — reference render.py:2361-2383."""
    density_p98 = jnp.percentile(density, 98.0)
    pos = temp_struct > 0
    struct_scale = jnp.where(
        jnp.any(pos),
        jnp.nanpercentile(jnp.where(pos, temp_struct, jnp.nan), 95.0),
        1.0,
    )
    ts_scaled = jnp.clip(temp_struct / (struct_scale + 1e-6) * 0.8, 0.0, 1.2)
    row_stats = jnp.stack(
        [jnp.max(ts_scaled, axis=1), jnp.quantile(ts_scaled, 0.7, axis=1)],
        axis=1,
    )
    return density_p98, struct_scale, row_stats


def _normalize_and_colorize(
    temp_base, temp_struct, density, az_hotspot,
    density_p98, struct_scale, row_stats, color_temp,
):
    """Normalization + colorize chain given precomputed stats — the
    single implementation behind every compose path (reference GPU
    kernel math, render.py:3189-3238)."""
    density = jnp.clip(density / (density_p98 + 1e-6), 0.0, 1.0)
    ts_scaled = jnp.clip(temp_struct / (struct_scale + 1e-6) * 0.8, 0.0, 1.2)
    ceiling = jnp.maximum(row_stats[:, 1], 0.05)
    tb = jnp.minimum(temp_base, ceiling[:, None])
    tb = jnp.minimum(tb, row_stats[:, 0][:, None])
    temperature = jnp.clip(jnp.maximum(tb, ts_scaled), 0.0, 1.0)
    return _colorize(temperature, az_hotspot, density, color_temp)


def compose_disk_texture(
    temp_base: jnp.ndarray,
    temp_struct: jnp.ndarray,
    density: jnp.ndarray,
    az_hotspot: jnp.ndarray,
    edge: jnp.ndarray,
    color_temp: float,
) -> jnp.ndarray:
    """Final RGBA from pre-mixed temperature/density fields, stats
    computed on the fly (percentiles on device).

    density is edge-softened then normalized by its P98; structural
    temperature scaled by the P95 of its positive values; the
    temperature floor is clamped per-row so structure stays dominant.
    """
    density = density * edge[:, None]
    stats = _field_stats(density, temp_struct)
    return _normalize_and_colorize(
        temp_base, temp_struct, density, az_hotspot, *stats, color_temp
    )


def _colorize(temperature, az_hotspot, density, color_temp):
    """Blackbody coloring: color_temp shifts the [T_min, T_max] mapping."""
    t_factor = (color_temp - 4500.0) / (6500.0 - 2700.0)
    t_min = 2000.0 + t_factor * 1000.0
    t_max = 9000.0 + t_factor * 3000.0

    temp_aniso = jnp.clip(temperature * (0.9 + 0.25 * az_hotspot), 0.0, 1.0)
    t_k = t_min + temp_aniso * (t_max - t_min)
    bb = blackbody_rgb(t_k)
    # White-hot must not drift blue: clamp B <= R.
    bb = bb.at[..., 2].set(jnp.minimum(bb[..., 2], bb[..., 0]))
    lum = jnp.clip(jnp.sqrt(temp_aniso), 0.0, 1.0)
    rgb = jnp.clip(bb * lum[..., None], 0.0, 1.0)
    return jnp.concatenate([rgb, jnp.clip(density, 0.0, 1.0)[..., None]], axis=-1)


@dataclass(frozen=True)
class ParametricDiskState:
    """Precomputed 13-component state for the parametric rotating texture.

    TPU equivalent of the reference's DiskTextureRotatingState +
    upload_parametric_state (render.py:462-486, 2314-2387): components
    packed as one (13, n_r, n_phi) device array plus precomputed
    normalization stats, so per-frame regeneration is a single
    gather + compose program.
    """

    comp: jnp.ndarray  # (13, n_r, n_phi)
    omega_rows: jnp.ndarray  # (n_r,)
    edge: jnp.ndarray  # (n_r,)
    density_p98: jnp.ndarray  # ()
    struct_scale: jnp.ndarray  # ()
    row_stats: jnp.ndarray  # (n_r, 2): [struct_max, struct_p70]
    enable_rt: bool
    color_temp: float
    n_r: int
    n_phi: int
    generation_scale: int
    seed: int


def _component_stats(comp, edge, enable_rt):
    """Normalization stats from the 13-component pack (t=0)."""
    return _field_stats(
        density_from_comp(comp, edge, enable_rt), temp_struct_from_comp(comp)
    )


def generate_component_fields(
    seed: int, n_r: int, n_phi: int, r_inner: float, r_outer: float,
    enable_rt: bool = True, generation_scale: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate the full 13-component pack. Returns (comp, omega_rows)."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 9)
    r_norm = jnp.linspace(0.0, 1.0, n_r)
    r_vals = r_inner + (r_outer - r_inner) * r_norm
    omega_rows = keplerian_omega(r_vals)
    disk_area = (r_outer**2 - r_inner**2) / 10.0

    temp_base = generate_temperature_base(ks[0], n_r, n_phi)
    spiral, spiral_t = generate_spiral_arms(ks[1], n_r, n_phi, generation_scale)
    turb, kep_shift, turb_t = generate_turbulence(ks[2], n_r, n_phi, generation_scale)
    arcs, arcs_t = generate_filaments(ks[3], n_r, n_phi, generation_scale)
    rt, rt_t = generate_rt_spikes(ks[4], n_r, n_phi, disk_area, enable_rt,
                                  generation_scale)
    hs, hs_t = generate_hotspots(ks[5], n_r, n_phi)
    az = generate_azimuthal_hotspot(ks[6], n_r, n_phi, generation_scale)
    dm = generate_disturbance_mod(ks[7], n_r, n_phi, kep_shift, generation_scale)

    comp = jnp.stack(
        [temp_base, spiral, spiral_t, turb, turb_t, arcs, arcs_t, rt, rt_t,
         hs, hs_t, az, dm],
        axis=0,
    )
    return comp, omega_rows


def build_parametric_state(
    n_phi: int = 1024, n_r: int = 512, seed: int = 42,
    r_inner: float = 2.0, r_outer: float = 3.5,
    enable_rt: bool = True, color_temp: Optional[float] = None,
    generation_scale: int = 2,
) -> ParametricDiskState:
    """Precompute the parametric rotating-texture state (device-resident)."""
    _validate_scale(generation_scale)
    if color_temp is None:
        color_temp = DISK_COLOR_TEMPERATURE
    comp, omega_rows = generate_component_fields(
        seed, n_r, n_phi, r_inner, r_outer, enable_rt, generation_scale
    )
    edge = jnp.asarray(compute_edge_alpha(n_r))
    density_p98, struct_scale, row_stats = _component_stats(comp, edge, enable_rt)
    return ParametricDiskState(
        comp=comp, omega_rows=omega_rows, edge=edge,
        density_p98=density_p98, struct_scale=struct_scale,
        row_stats=row_stats, enable_rt=enable_rt,
        color_temp=float(color_temp), n_r=n_r, n_phi=n_phi,
        generation_scale=generation_scale, seed=seed,
    )


def compose_from_components(
    comp: jnp.ndarray,
    omega_rows: jnp.ndarray,
    edge: jnp.ndarray,
    density_p98: jnp.ndarray,
    struct_scale: jnp.ndarray,
    row_stats: jnp.ndarray,
    t_offset,
    enable_rt: bool,
    color_temp,
) -> jnp.ndarray:
    """Compose the RGBA texture from components with per-row Keplerian
    rotation — the reference GPU compose kernel's contract
    (render.py:3169-3259), one fused gather+math program here.

    A *Python-scalar* t_offset of 0.0 statically elides the
    13 x n_r x n_phi roll gather (the dynamic lifecycle path always
    composes at t=0: rotation lives in the background's rotating
    coordinates + entity phases). The check must happen outside the
    jitted body — inside it every argument is a tracer.
    """
    skip_roll = isinstance(t_offset, (int, float)) and float(t_offset) == 0.0
    return _compose_from_components(
        comp, omega_rows, edge, density_p98, struct_scale, row_stats,
        jnp.asarray(t_offset, jnp.float32), enable_rt, color_temp,
        skip_roll=skip_roll,
    )


@functools.partial(
    jax.jit, static_argnames=("enable_rt", "skip_roll")
)
def _compose_from_components(
    comp, omega_rows, edge, density_p98, struct_scale, row_stats,
    t_offset, enable_rt: bool, color_temp, skip_roll: bool = False,
) -> jnp.ndarray:
    n_phi = comp.shape[2]
    if skip_roll:
        rolled = comp
    else:
        shift = (
            t_offset * omega_rows / (2.0 * jnp.pi) * n_phi
        ).astype(jnp.int32)
        cols = jnp.arange(n_phi)[None, :]
        src = jnp.mod(cols + shift[:, None], n_phi)  # (n_r, n_phi)
        rolled = jnp.take_along_axis(comp, src[None], axis=2)

    return _normalize_and_colorize(
        rolled[0], temp_struct_from_comp(rolled),
        density_from_comp(rolled, edge, enable_rt), rolled[11],
        density_p98, struct_scale, row_stats, color_temp,
    )


def compose_from_state(state: ParametricDiskState, t_offset: float = 0.0,
                       color_temp: Optional[float] = None) -> jnp.ndarray:
    """Texture at rotation time t_offset from a precomputed state."""
    ct = state.color_temp if color_temp is None else float(color_temp)
    # Host scalars pass through unwrapped so compose_from_components can
    # statically elide the per-row roll gather at t_offset == 0.
    t = (
        t_offset
        if isinstance(t_offset, (int, float))
        else jnp.float32(t_offset)
    )
    return compose_from_components(
        state.comp, state.omega_rows, state.edge, state.density_p98,
        state.struct_scale, state.row_stats, t,
        state.enable_rt, jnp.float32(ct),
    )


def generate_disk_texture(
    n_phi: int = 1024, n_r: int = 512, seed: int = 42,
    r_inner: float = 2.0, r_outer: float = 3.5,
    enable_rt: bool = True, color_temp: Optional[float] = None,
    generation_scale: int = 2,
) -> jnp.ndarray:
    """One-shot static texture — (n_r, n_phi, 4) float32 RGBA.

    Equivalent to composing the parametric state at t=0 (the reference's
    static generate_disk_texture, render.py:1869-2010).
    """
    state = build_parametric_state(
        n_phi=n_phi, n_r=n_r, seed=seed, r_inner=r_inner, r_outer=r_outer,
        enable_rt=enable_rt, color_temp=color_temp,
        generation_scale=generation_scale,
    )
    return compose_from_state(state, 0.0)
