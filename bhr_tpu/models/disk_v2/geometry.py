"""Disk V2 geometry: boundaries, masks, smooth weights.

Parity: reference disk_v2/geometry.py. Invariant preserved from the
design doc (design_ad_v2.md:180-193): hard masks use closed-interval
membership (boundary points count as inside) while smooth weights close
to exactly 0 on those same boundaries, so base fields vanish smoothly at
the geometric surface.

JAX style: everything broadcasts; scalar inputs return 0-d arrays (use
float() to unwrap).
"""

from __future__ import annotations

import jax.numpy as jnp

from .params import DiskV2Params

_EPS = 2.220446049250313e-16  # float64 machine epsilon, matching the
# reference's np.finfo guards even though computation may run in f32.


def smoothstep(edge0: float, edge1: float, x) -> jnp.ndarray:
    """Cubic smoothstep: 0 below edge0, 1 above edge1, C1-smooth between."""
    if edge1 <= edge0:
        raise ValueError("edge1 must be greater than edge0")
    t = jnp.clip((jnp.asarray(x) - edge0) / (edge1 - edge0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def disk_half_thickness(r, params: DiskV2Params) -> jnp.ndarray:
    """H(r) = h0 * r * (r / r_in)^beta_h, with r clamped to >= r_in."""
    safe_r = jnp.maximum(jnp.asarray(r), params.r_in)
    return params.h0 * safe_r * jnp.power(safe_r / params.r_in, params.beta_h)


def disk_radial_mask(r, params: DiskV2Params) -> jnp.ndarray:
    """Hard membership: r_in <= r <= r_out (closed interval)."""
    r = jnp.asarray(r)
    return (r >= params.r_in) & (r <= params.r_out)


def disk_radial_weight(r, params: DiskV2Params) -> jnp.ndarray:
    """Smooth radial window W_r(r) in [0, 1].

    W_r = smoothstep(r_in, r_in + dr, r) * (1 - smoothstep(r_out - dr,
    r_out, r)) with dr = edge_softness * (r_out - r_in); exactly 0 at
    and outside both boundaries.
    """
    r = jnp.asarray(r)
    span = params.r_out - params.r_in
    soft = max(span * params.edge_softness, _EPS)
    inner = smoothstep(params.r_in, params.r_in + soft, r)
    outer = 1.0 - smoothstep(params.r_out - soft, params.r_out, r)
    w = inner * outer
    return jnp.where((r <= params.r_in) | (r >= params.r_out), 0.0, w)


def disk_vertical_weight(r, z, params: DiskV2Params) -> jnp.ndarray:
    """Smooth vertical window W_z(r, z): 1 at the midplane, 0 at the
    geometric surface |z| = H(r) and outside the radial domain."""
    r = jnp.asarray(r)
    z = jnp.asarray(z)
    thickness = jnp.maximum(disk_half_thickness(r, params), _EPS)
    xi = jnp.abs(z) / thickness
    w = 1.0 - smoothstep(0.0, 1.0, xi)
    return jnp.where(disk_radial_mask(r, params), w, 0.0)


def disk_volume_mask(r, z, params: DiskV2Params) -> jnp.ndarray:
    """Hard volume membership: radial mask AND |z| <= H(r) (closed)."""
    r = jnp.asarray(r)
    z = jnp.asarray(z)
    thickness = disk_half_thickness(r, params)
    return disk_radial_mask(r, params) & (jnp.abs(z) <= thickness)
