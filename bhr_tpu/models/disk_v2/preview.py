"""Disk V2 preview renders (planned module, design_ad_v2.md:454-470).

Quick diagnostic views of the V2 fields without ray tracing:
  * top view: face-on midplane emissivity map in cartesian coordinates;
  * cross-section: (r, z) slice of density / temperature.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .integrator import emissivity_volume
from .palette import apply_palette
from .params import DiskV2Params, DiskV2StructureParams
from .physical_fields import density_field, midplane_temperature_field, temperature_field


def render_top_view(
    params: DiskV2Params,
    structure_params: Optional[DiskV2StructureParams] = None,
    size: int = 512,
    seed: int = 42,
    t: float = 0.0,
    palette: str = "cinematic",
) -> jnp.ndarray:
    """(size, size, 3) face-on view of the midplane emission."""
    extent = params.r_out * 1.05
    xs = jnp.linspace(-extent, extent, size)
    x, y = jnp.meshgrid(xs, -xs)
    r = jnp.sqrt(x**2 + y**2)
    phi = jnp.arctan2(y, x)

    j, _ = emissivity_volume(r, jnp.zeros_like(r), phi, params,
                             structure_params, seed=seed, t=t)
    t_mid = midplane_temperature_field(r, params)
    t_norm = t_mid / (jnp.max(t_mid) + 1e-9)
    rgb = apply_palette(
        j.reshape(-1) / (jnp.max(j) + 1e-9) * 3.0,
        t_norm.reshape(-1),
        palette,
    )
    return rgb.reshape(size, size, 3)


def render_cross_section(
    params: DiskV2Params,
    size_r: int = 512,
    size_z: int = 128,
    field: str = "density",
) -> jnp.ndarray:
    """(size_z, size_r) vertical slice of density or temperature."""
    rs = jnp.linspace(params.r_in * 0.8, params.r_out * 1.05, size_r)
    # Span the ACTUAL outer half-thickness H(r_out) = h0*r_out*
    # (r_out/r_in)^beta_h (geometry.disk_half_thickness) with headroom;
    # a plain h0*r_out*2 clips the flared surface when the flare
    # exponent makes (r_out/r_in)^beta_h exceed 2.
    from .geometry import disk_half_thickness

    z_max = 1.25 * float(
        disk_half_thickness(jnp.asarray(params.r_out), params)
    )
    zs = jnp.linspace(-z_max, z_max, size_z)
    r_g, z_g = jnp.meshgrid(rs, zs)
    if field == "density":
        vals = density_field(r_g, z_g, params)
    elif field == "temperature":
        vals = temperature_field(r_g, z_g, params)
    else:
        raise ValueError(f"unknown field: {field}")
    return vals / (jnp.max(vals) + 1e-9)
