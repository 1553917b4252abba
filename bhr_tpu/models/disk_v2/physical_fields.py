"""Disk V2 base physical fields: Omega(r), rho(r, z), T(r, z).

Parity: reference disk_v2/physical_fields.py —
    Omega(r) = omega_scale * (r/r_in)^(-3/2)
    rho_mid(r) = (r/r_in)^(-rho_power) * W_r(r)
    T_mid(r) = temp_scale * (r/r_in)^(-3/4) * (1 - sqrt(r_in/r))^(1/4) * W_r
    rho(r,z) = rho_mid * exp(-z^2 / (2 H^2)) * W_z, zeroed outside the volume
    T(r,z)   = T_mid * clip(1 - 0.25 |z|/H, 0, 1) * W_z, zeroed outside
"""

from __future__ import annotations

import jax.numpy as jnp

from .geometry import (
    _EPS,
    disk_half_thickness,
    disk_radial_weight,
    disk_vertical_weight,
    disk_volume_mask,
)
from .params import DiskV2Params


def angular_velocity_field(r, params: DiskV2Params) -> jnp.ndarray:
    """Keplerian angular velocity scaling (always positive; no cutoff)."""
    safe_r = jnp.maximum(jnp.asarray(r), params.r_in)
    return params.omega_scale * jnp.power(safe_r / params.r_in, -1.5)


def midplane_density_field(r, params: DiskV2Params) -> jnp.ndarray:
    """Power-law midplane density, smoothly windowed at the edges."""
    r = jnp.asarray(r)
    safe_r = jnp.maximum(r, params.r_in)
    return jnp.power(safe_r / params.r_in, -params.rho_power) * disk_radial_weight(
        r, params
    )


def midplane_temperature_field(r, params: DiskV2Params) -> jnp.ndarray:
    """Thin-disk temperature profile; peaks outside r_in, 0 at/inside it."""
    r = jnp.asarray(r)
    safe_r = jnp.maximum(r, params.r_in)
    inner = jnp.clip(1.0 - jnp.sqrt(params.r_in / safe_r), 0.0, None)
    t = (
        params.temp_scale
        * jnp.power(safe_r / params.r_in, -0.75)
        * jnp.power(inner, 0.25)
        * disk_radial_weight(r, params)
    )
    return jnp.where(r <= params.r_in, 0.0, t)


def density_field(r, z, params: DiskV2Params) -> jnp.ndarray:
    """rho(r, z): Gaussian vertical profile closed by W_z, hard-zeroed
    outside the geometric volume."""
    r = jnp.asarray(r)
    z = jnp.asarray(z)
    thickness = jnp.maximum(disk_half_thickness(r, params), _EPS)
    field = (
        midplane_density_field(r, params)
        * jnp.exp(-0.5 * jnp.square(z / thickness))
        * disk_vertical_weight(r, z, params)
    )
    return jnp.where(disk_volume_mask(r, z, params), field, 0.0)


def temperature_field(r, z, params: DiskV2Params) -> jnp.ndarray:
    """T(r, z): midplane-hot with weak linear vertical cooling, closed by
    W_z, hard-zeroed outside the volume."""
    r = jnp.asarray(r)
    z = jnp.asarray(z)
    thickness = jnp.maximum(disk_half_thickness(r, params), _EPS)
    vertical = jnp.clip(1.0 - 0.25 * jnp.abs(z) / thickness, 0.0, 1.0)
    field = (
        midplane_temperature_field(r, params)
        * vertical
        * disk_vertical_weight(r, z, params)
    )
    return jnp.where(disk_volume_mask(r, z, params), field, 0.0)
