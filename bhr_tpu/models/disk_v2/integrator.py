"""Disk V2 emission-absorption path integration.

Builds the piece the reference planned but never shipped
(docs/design_ad_v2.md:370-405, status table :454-470): finite-thickness
radiative transfer I = integral j * exp(-tau) ds through the disk slab,
with grazing-angle opacity gain, unified advection phi_adv =
phi - Omega(r) t, and structure modulation of the emissivity.

Fits the deferred-shading pipeline: each recorded disk-plane crossing
(hit position + ray direction from the geodesic tracer) becomes a short
straight segment through the slab — curvature over one slab thickness is
negligible — integrated with a fixed number of samples, fully
vectorized over hits. This replaces the texture lookup of the V1 path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .geometry import disk_half_thickness
from .params import DiskV2Params, DiskV2StructureParams
from .physical_fields import density_field, temperature_field
from .structure_modulations import structure_modulation


def emissivity_volume(
    r, z, phi, params: DiskV2Params,
    structure_params: Optional[DiskV2StructureParams] = None,
    seed: int = 42, t: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(emissivity j, opacity kappa*rho) at disk points.

    j = rho * T * F_struct — density-weighted thermal emission modulated
    by the static structure layer; absorption follows density.
    """
    rho = density_field(r, z, params)
    temp = temperature_field(r, z, params)
    mod = structure_modulation(r, phi, params, structure_params, seed=seed, t=t)
    j = rho * temp * mod
    absorption = rho
    return j, absorption


@functools.partial(
    jax.jit,
    static_argnames=("params", "structure_params", "n_samples", "seed"),
)
def integrate_emission(
    hit_pos: jnp.ndarray,
    ray_dir: jnp.ndarray,
    params: DiskV2Params,
    structure_params: Optional[DiskV2StructureParams] = None,
    *,
    n_samples: int = 8,
    opacity_scale: float = 1.5,
    emission_scale: float = 1.0,
    seed: int = 42,
    t: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Integrate emission through the slab at each midplane crossing.

    Args:
        hit_pos: (N, 3) positions on the disk midplane (local disk frame:
            the disk lies in z = 0; apply any tilt rotation beforehand).
        ray_dir: (N, 3) unit ray directions at the crossings.
        n_samples: fixed sample count along each slab segment.
        opacity_scale: absorption coefficient scale (tau per unit rho*ds).
        emission_scale: emissivity scale.

    Returns:
        (intensity (N,), temperature_mean (N,), alpha (N,)):
        path-integrated I = sum j exp(-tau) ds, the emission-weighted
        mean temperature (for palette mapping), and 1 - exp(-tau_total).

    Grazing-angle behavior: the segment length through the slab is
    2 H(r) / |dz_hat|, so shallow rays traverse more material — the
    opacity gain the design doc calls for arises geometrically.
    """
    r_hit = jnp.sqrt(hit_pos[:, 0] ** 2 + hit_pos[:, 1] ** 2)
    h = disk_half_thickness(r_hit, params)  # (N,)
    dz = ray_dir[:, 2]
    inv_dz = 1.0 / jnp.clip(jnp.abs(dz), 0.05, None)  # cap grazing gain
    half_len = h * inv_dz  # half segment length through the slab

    # Sample midpoints, symmetric about the crossing.
    u = (jnp.arange(n_samples) + 0.5) / n_samples  # (S,) in (0, 1)
    s = (u[None, :] * 2.0 - 1.0) * half_len[:, None]  # (N, S)
    ds = (2.0 * half_len / n_samples)[:, None]  # (N, 1)

    pts = hit_pos[:, None, :] + s[..., None] * ray_dir[:, None, :]  # (N,S,3)
    r_s = jnp.sqrt(pts[..., 0] ** 2 + pts[..., 1] ** 2)
    z_s = pts[..., 2]

    # Thin-slab modulation: the structure modulation varies on disk
    # scales (m=1/2 modes, low-frequency shear texture, hotspot radii)
    # — larger than the slab segment — so instead of evaluating the
    # full stack at every quadrature sample (measured: ~95% of the
    # integrator's TPU time at FHD; the hotspot Gaussian sum dominates)
    # it is evaluated at the segment's ENTRY and EXIT points only and
    # linearly interpolated across samples. The two-point lerp keeps
    # first-order accuracy for grazing rays, whose segment can sweep a
    # large azimuth arc (half_len up to 20 H at the inv_dz cap) where a
    # single midpoint sample would misplace hotspot edges.
    rho_s = density_field(r_s, z_s, params)
    temp_s = temperature_field(r_s, z_s, params)
    ends = jnp.concatenate(
        [
            hit_pos - half_len[:, None] * ray_dir,  # segment entry (u=0)
            hit_pos + half_len[:, None] * ray_dir,  # segment exit (u=1)
        ],
        axis=0,
    )  # (2N, 3)
    r_ends = jnp.sqrt(ends[:, 0] ** 2 + ends[:, 1] ** 2)
    phi_ends = jnp.arctan2(ends[:, 1], ends[:, 0])
    mod_ends = structure_modulation(
        r_ends, phi_ends, params, structure_params, seed=seed, t=t
    )
    # Materialize before the (N, S) broadcast: XLA's producer fusion
    # otherwise recomputes the whole modulation stack once per sample
    # inside the S-shaped fused loop (measured 26 -> 8 ms at FHD).
    mod_ends = jax.lax.optimization_barrier(mod_ends)
    n = hit_pos.shape[0]
    mod = mod_ends[:n, None] * (1.0 - u)[None, :] + mod_ends[n:, None] * u[None, :]
    j = rho_s * temp_s * mod * emission_scale
    absorb = rho_s
    dtau = absorb * opacity_scale * ds

    # Front-to-back transfer: tau before each sample is the cumulative
    # optical depth of preceding samples (exclusive prefix sum).
    tau_before = jnp.cumsum(dtau, axis=1) - dtau
    transmit = jnp.exp(-tau_before)
    intensity = jnp.sum(j * transmit * ds, axis=1)
    tau_total = jnp.sum(dtau, axis=1)
    alpha = 1.0 - jnp.exp(-tau_total)

    temp = temp_s
    weight = j * transmit * ds
    temp_mean = jnp.sum(temp * weight, axis=1) / jnp.maximum(
        jnp.sum(weight, axis=1), 1e-12
    )
    return intensity, temp_mean, alpha
