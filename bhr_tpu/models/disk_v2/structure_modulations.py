"""Disk V2 static structure modulations (multiplicative factors ~ 1).

Parity: reference disk_v2/structure_modulations.py — three layers:
weak m=1/m=2 modes with log-r phase coupling, a seeded random-Fourier
shear texture in (phi, log r), and sparse difference-of-Gaussian
hotspots biased toward the inner disk; composed multiplicatively and
neutral (= 1) outside the disk.

Advection hook (the reference's planned phi_adv, design_ad_v2.md:
370-405): every layer takes an optional time `t`; coordinates advect as
phi_adv = phi - Omega(r) * t, giving differential rotation of the
static pattern.

Deviation from the reference: the reference normalizes shear/hotspot
fields by the max over the *evaluated batch*
(disk_v2/structure_modulations.py:27-44) — well-defined there because
it only ever evaluates dense (r, phi) grids. This renderer evaluates
sparse per-ray point sets, where batch-max normalization would make a
pixel's value depend on which other pixels share the frame (and differ
between the windowed and full shading passes). Normalization here uses
the pattern's max over a fixed dense lattice instead — a compile-time
constant, identical for every evaluation set.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .geometry import disk_radial_weight
from .params import DiskV2Params, DiskV2StructureParams
from .physical_fields import angular_velocity_field


# Fixed normalization lattice: the raw shear/hotspot patterns are
# functions of (phi_adv, log r) only, so their global max over full phi
# coverage is advection-invariant. Evaluating the max on this static
# lattice makes the normalization a *compile-time constant* — per-ray
# modulation no longer depends on which other rays share the batch
# (window pass == full pass; no frame-to-frame normalization flicker).
# 512 phi x 128 log-r samples resolve every shear component (m <= 10,
# n <= 5.5 by construction -> >= 50 samples/period). Hotspot sigmas are
# user-set and can be arbitrarily narrow, so the hotspot max is
# additionally probed at sigma-scaled offsets around every spot center
# (see hotspot_modulation) — the lattice alone would miss sub-lattice
# Gaussian cores and the resulting over-normalization would saturate
# the clip to [-1, 1] into hard-edged binary blobs.
_LATTICE_PHI = 512
_LATTICE_LOGR = 128

# Probe offsets in units of sigma; the extrema of a difference-of-
# Gaussians sum lie at/near the cores and halo rings these cover.
_PROBE_OFFSETS = np.array([-3.0, -2.0, -1.5, -1.0, -0.5, 0.0,
                           0.5, 1.0, 1.5, 2.0, 3.0])


def _lattice_max_abs(
    raw_fn, log_span: float, probe_phi=None, probe_logr=None
) -> jnp.ndarray:
    """max |raw_fn(phi, log_r)| over the fixed (phi, log r) lattice,
    optionally augmented with exact probe points (both compile-time
    constants, so the normalization stays evaluation-set independent)."""
    phi_l = jnp.linspace(0.0, 2.0 * jnp.pi, _LATTICE_PHI, endpoint=False)
    logr_l = jnp.linspace(0.0, max(log_span, 1e-6), _LATTICE_LOGR)
    m = jnp.max(jnp.abs(raw_fn(phi_l[None, :], logr_l[:, None])))
    if probe_phi is not None:
        m = jnp.maximum(m, jnp.max(jnp.abs(raw_fn(probe_phi, probe_logr))))
    return jnp.maximum(m, 1e-15)


def _wrapped_delta_phi(phi: jnp.ndarray, center: float) -> jnp.ndarray:
    """Shortest signed angular difference in [-pi, pi]."""
    return jnp.arctan2(jnp.sin(phi - center), jnp.cos(phi - center))


def _log_radius(r: jnp.ndarray, params: DiskV2Params) -> jnp.ndarray:
    return jnp.log(jnp.maximum(r, params.r_in) / params.r_in)


def _advected_phi(r, phi, params: DiskV2Params, t) -> jnp.ndarray:
    """phi_adv = phi - Omega(r) * t — unified differential advection.

    ``t`` may be a traced scalar (always computed; XLA folds t=0 away).
    """
    return jnp.asarray(phi) - angular_velocity_field(r, params) * t


def weak_mode_modulation(
    r, phi, params: DiskV2Params,
    structure_params: DiskV2StructureParams | None = None,
    t: float = 0.0,
) -> jnp.ndarray:
    """F_mode = 1 + a1 cos(phi + 0.35 log r) + a2 cos(2 phi - 0.65 log r);
    neutral (1) outside the radial window."""
    sp = structure_params or DiskV2StructureParams()
    r = jnp.asarray(r)
    phi = _advected_phi(r, phi, params, t)
    log_r = _log_radius(r, params)
    raw = sp.mode1_strength * jnp.cos(phi + 0.35 * log_r) + sp.mode2_strength * jnp.cos(
        2.0 * phi - 0.65 * log_r
    )
    window = disk_radial_weight(r, params)
    return jnp.where(window > 0.0, 1.0 + raw, 1.0)


def shear_modulation(
    r, phi, params: DiskV2Params,
    structure_params: DiskV2StructureParams | None = None,
    seed: int = 42,
    t: float = 0.0,
) -> jnp.ndarray:
    """Random-Fourier shear texture: sum of cos(m phi + n log r + psi)
    components with geometric amplitude decay, normalized to [-1, 1] and
    applied as 1 + strength * signed."""
    sp = structure_params or DiskV2StructureParams()
    rng = np.random.default_rng(seed)
    r = jnp.asarray(r)
    phi = _advected_phi(r, phi, params, t)
    log_r = _log_radius(r, params)

    terms = []
    for idx in range(sp.shear_components):
        m = int(rng.integers(2, 10))
        n = int(rng.integers(1, 6))
        psi = float(rng.uniform(0.0, 2.0 * np.pi))
        terms.append((m, n, psi, 0.5**idx))

    def raw_fn(phi_a, log_r_a):
        raw = jnp.zeros(jnp.broadcast_shapes(
            jnp.shape(phi_a), jnp.shape(log_r_a)
        ))
        for m, n, psi, amp in terms:
            raw = raw + amp * jnp.cos(m * phi_a + n * log_r_a + psi)
            raw = raw + 0.6 * amp * jnp.sin(
                (m + 1) * phi_a - (n + 0.5) * log_r_a + 0.7 * psi
            )
        return raw

    log_span = float(np.log(params.r_out / params.r_in))
    signed = jnp.clip(
        raw_fn(phi, log_r) / _lattice_max_abs(raw_fn, log_span), -1.0, 1.0
    )
    window = disk_radial_weight(r, params)
    return jnp.where(window > 0.0, 1.0 + sp.shear_strength * signed, 1.0)


def hotspot_modulation(
    r, phi, params: DiskV2Params,
    structure_params: DiskV2StructureParams | None = None,
    seed: int = 42,
    t: float = 0.0,
) -> jnp.ndarray:
    """Sparse difference-of-Gaussian hotspots (bright core - 0.6 halo) in
    (phi, log r), inner-biased via u^bias, as a signed modulation."""
    sp = structure_params or DiskV2StructureParams()
    rng = np.random.default_rng(seed)
    r = jnp.asarray(r)
    phi = _advected_phi(r, phi, params, t)
    log_r = _log_radius(r, params)
    log_span = float(np.log(params.r_out / params.r_in))
    halo_phi, halo_logr, halo_w = 1.8, 1.8, 0.6

    spots = []
    for _ in range(sp.hotspot_count):
        center_phi = float(rng.uniform(0.0, 2.0 * np.pi))
        center_logr = float(
            (rng.uniform(0.0, 1.0) ** sp.hotspot_inner_bias) * log_span
        )
        weight = float(rng.uniform(0.6, 1.0))
        spots.append((center_phi, center_logr, weight))

    def raw_fn(phi_a, log_r_a):
        raw = jnp.zeros(jnp.broadcast_shapes(
            jnp.shape(phi_a), jnp.shape(log_r_a)
        ))
        for center_phi, center_logr, weight in spots:
            d_phi = _wrapped_delta_phi(phi_a, center_phi)
            d_logr = (log_r_a - center_logr) / sp.hotspot_logr_sigma
            core = jnp.exp(
                -0.5 * (d_phi / sp.hotspot_phi_sigma) ** 2 - 0.5 * d_logr**2
            )
            halo = jnp.exp(
                -0.5 * (d_phi / (halo_phi * sp.hotspot_phi_sigma)) ** 2
                - 0.5 * ((log_r_a - center_logr)
                         / (halo_logr * sp.hotspot_logr_sigma)) ** 2
            )
            raw = raw + weight * (core - halo_w * halo)
        return raw

    # spots is never empty: DiskV2StructureParams rejects
    # hotspot_count <= 0 in __post_init__. Probe a sigma-scaled grid
    # around each center so narrow (sub-lattice) cores still normalize
    # by their true peak instead of a lattice tail sample.
    pp, pl = [], []
    for center_phi, center_logr, _ in spots:
        gp, gl = np.meshgrid(
            center_phi + _PROBE_OFFSETS * sp.hotspot_phi_sigma,
            center_logr + _PROBE_OFFSETS * sp.hotspot_logr_sigma,
        )
        pp.append(gp.ravel())
        pl.append(gl.ravel())
    probe_phi = jnp.asarray(np.concatenate(pp))
    probe_logr = jnp.asarray(np.concatenate(pl))
    signed = jnp.clip(
        raw_fn(phi, log_r)
        / _lattice_max_abs(raw_fn, log_span, probe_phi, probe_logr),
        -1.0, 1.0,
    )
    window = disk_radial_weight(r, params)
    return jnp.where(window > 0.0, 1.0 + sp.hotspot_strength * signed, 1.0)


def structure_modulation(
    r, phi, params: DiskV2Params,
    structure_params: DiskV2StructureParams | None = None,
    seed: int = 42,
    t: float = 0.0,
) -> jnp.ndarray:
    """Composite F_struct = F_mode * F_shear * F_hotspot, neutral outside."""
    sp = structure_params or DiskV2StructureParams()
    mode = weak_mode_modulation(r, phi, params, sp, t=t)
    shear = shear_modulation(r, phi, params, sp, seed=seed, t=t)
    hotspot = hotspot_modulation(r, phi, params, sp, seed=seed + 1, t=t)
    combined = mode * shear * hotspot
    window = disk_radial_weight(jnp.asarray(r), params)
    return jnp.where(window > 0.0, combined, 1.0)
