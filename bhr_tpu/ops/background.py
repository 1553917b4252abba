"""Time-evolving background components for the dynamic disk.

JAX port of the reference's GPU background kernel
(/root/reference/render.py:3332-3453): writes the wide-r component
slices [0 temp_base, 1-2 spiral (zeroed), 3-4 turbulence, 11 az_hotspot,
12 disturb_mod] of the 13-component field using 3D simplex/FBM noise in
seamlessly-rotating coordinates (cos(phi_rot), sin(phi_rot), r) with
phi_rot = phi + omega(r) * t — differential Keplerian rotation with no
roll and no seam. The entity lifecycle system fills slices [5..10].

One jitted program per texture shape; runs per frame on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .noise import fbm_3d, simplex_noise_3d
from .shading import keplerian_omega


@functools.partial(
    jax.jit, static_argnames=("n_r", "n_phi", "generation_scale")
)
def generate_background_components(
    n_r: int,
    n_phi: int,
    az_freq,
    az_shear,
    r_inner,
    r_outer,
    t,
    generation_scale: int = 1,
) -> jnp.ndarray:
    """Return a (7, n_r, n_phi) stack for comp indices [0,1,2,3,4,11,12].

    Order in the output stack: [temp_base, spiral(0), spiral_temp(0),
    turbulence, turb_temp, az_hotspot, disturb_mod].

    ``generation_scale`` > 1 evaluates the noise on an (n_r/s, n_phi/s)
    grid and kron-upscales — the same low-res optimization the
    reference applies to its texture generators (render.py:78-87); the
    ~42 simplex evaluations per texel are the dominant per-frame
    texture cost at scale 1.
    """
    if n_r % generation_scale or n_phi % generation_scale:
        raise ValueError(
            f"texture size ({n_r}, {n_phi}) must be divisible by "
            f"generation_scale {generation_scale}"
        )
    gr, gp = n_r // generation_scale, n_phi // generation_scale
    r = jnp.arange(gr, dtype=jnp.float32)[:, None] * generation_scale / n_r
    phi = (
        jnp.arange(gp, dtype=jnp.float32)[None, :]
        * generation_scale / n_phi * (2.0 * jnp.pi)
    )
    r = jnp.broadcast_to(r, (gr, gp))
    phi = jnp.broadcast_to(phi, (gr, gp))
    n_r, n_phi = gr, gp  # noise evaluates on the coarse grid below

    r_phys = r_inner + (r_outer - r_inner) * r
    omega = keplerian_omega(r_phys)
    phi_rot = phi + omega * t
    cx = jnp.cos(phi_rot)
    cy = jnp.sin(phi_rot)

    def unit(v):
        return jnp.clip(0.5 + 0.5 * v, 0.0, 1.0)

    # temp_base: radial decay x slow FBM.
    decay = jnp.power(jnp.maximum(1.0 - r, 0.0), 1.3)
    tb_noise = unit(fbm_3d(cx * 8.0, cy * 8.0, r * 8.0 + t * 0.05, 4, 0.6, 2.0))
    temp_base = decay * (0.85 + 0.15 * tb_noise) * 0.25

    zeros = jnp.zeros((n_r, n_phi))

    # turbulence: six time-evolving scales.
    t_coarse = unit(fbm_3d(cx * 8.0, cy * 8.0, r * 4.0 + t * 0.06, 3, 0.45, 2.0)) * 0.08
    t_mid = unit(fbm_3d(cx * 24.0, cy * 24.0, r * 12.0 + t * 0.08, 4, 0.45, 2.0)) * 0.15
    t_fine = unit(fbm_3d(cx * 80.0, cy * 80.0, r * 40.0 + t * 0.1, 5, 0.45, 2.0)) * 0.25
    t_extra = unit(fbm_3d(cx * 200.0, cy * 200.0, r * 100.0 + t * 0.12, 4, 0.4, 2.0)) * 0.22
    t_ultra = unit(fbm_3d(cx * 400.0, cy * 400.0, r * 200.0 + t * 0.15, 3, 0.35, 2.0)) * 0.18
    t_pixel = jnp.clip(
        simplex_noise_3d(cx * 800.0, cy * 800.0, r * 400.0 + t * 0.2), 0.0, 1.0
    ) * 0.12
    turb = jnp.clip(t_coarse + t_mid + t_fine + t_extra + t_ultra + t_pixel, 0.0, 1.0)

    # az_hotspot: sinusoidal azimuthal wave with radial shear x FBM.
    shear = jnp.power(r, 1.2) * az_shear
    az_wave = 0.5 + 0.5 * jnp.sin((phi_rot + shear) * az_freq)
    az_n = unit(fbm_3d(cx * 3.0, cy * 3.0, r * 3.0 + t * 0.04, 3, 0.5, 2.0))
    az_hotspot = az_wave * az_n

    # disturb_mod: slow multi-scale modulation in [0.1, 1].
    d_coarse = unit(fbm_3d(cx * 8.0, cy * 8.0, r * 4.0 + t * 0.003, 3, 0.5, 2.0)) * 0.05
    d_mid = unit(fbm_3d(cx * 32.0, cy * 32.0, r * 16.0 + t * 0.005, 3, 0.5, 2.0)) * 0.15
    d_fine = unit(fbm_3d(cx * 100.0, cy * 100.0, r * 50.0 + t * 0.006, 4, 0.45, 2.0)) * 0.30
    d_extra = unit(fbm_3d(cx * 250.0, cy * 250.0, r * 125.0 + t * 0.008, 4, 0.4, 2.0)) * 0.30
    d_pixel = jnp.clip(
        simplex_noise_3d(cx * 500.0, cy * 500.0, r * 250.0 + t * 0.01), 0.0, 1.0
    ) * 0.20
    disturb = jnp.clip((d_coarse + d_mid + d_fine + d_extra + d_pixel) * 1.4, 0.05, 1.0)
    disturb = jnp.clip(disturb * (0.6 + 0.4 * r), 0.1, 1.0)

    stack = jnp.stack(
        [temp_base, zeros, zeros, turb, 0.05 * turb, az_hotspot, disturb],
        axis=0,
    )
    if generation_scale > 1:
        stack = jnp.repeat(
            jnp.repeat(stack, generation_scale, axis=1),
            generation_scale, axis=2,
        )
    return stack


def write_background_into_comp(comp: jnp.ndarray, bg: jnp.ndarray) -> jnp.ndarray:
    """Scatter the 7 background planes into the (13, n_r, n_phi) pack."""
    comp = comp.at[0].set(bg[0])
    comp = comp.at[1].set(bg[1])
    comp = comp.at[2].set(bg[2])
    comp = comp.at[3].set(bg[3])
    comp = comp.at[4].set(bg[4])
    comp = comp.at[11].set(bg[5])
    comp = comp.at[12].set(bg[6])
    return comp
