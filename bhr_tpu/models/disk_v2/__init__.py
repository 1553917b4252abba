"""Disk V2: physically-structured accretion disk model (JAX).

Capability-parity port of the reference's disk_v2 package
(/root/reference/disk_v2/, design: docs/design_ad_v2.md) plus the
planned-but-unbuilt pieces the reference marks as targets
(design_ad_v2.md:370-405): finite-thickness emission-absorption path
integration, unified advection, and palette mapping.

All field functions are pure, broadcasting, jit-compatible JAX; scalars
in -> scalars out (matching the reference's array-utils convention).
"""

from .params import DiskV2Params, DiskV2StructureParams
from .geometry import (
    disk_half_thickness,
    disk_radial_mask,
    disk_radial_weight,
    disk_vertical_weight,
    disk_volume_mask,
    smoothstep,
)
from .physical_fields import (
    angular_velocity_field,
    density_field,
    midplane_density_field,
    midplane_temperature_field,
    temperature_field,
)
from .structure_modulations import (
    hotspot_modulation,
    shear_modulation,
    structure_modulation,
    weak_mode_modulation,
)
from .integrator import emissivity_volume, integrate_emission
from .palette import apply_palette
from .preview import render_cross_section, render_top_view

__all__ = [
    "DiskV2Params",
    "DiskV2StructureParams",
    "smoothstep",
    "disk_half_thickness",
    "disk_radial_mask",
    "disk_radial_weight",
    "disk_vertical_weight",
    "disk_volume_mask",
    "angular_velocity_field",
    "midplane_density_field",
    "midplane_temperature_field",
    "density_field",
    "temperature_field",
    "weak_mode_modulation",
    "shear_modulation",
    "hotspot_modulation",
    "structure_modulation",
    "emissivity_volume",
    "integrate_emission",
    "apply_palette",
    "render_top_view",
    "render_cross_section",
]
