"""bhr_tpu — a TPU-native Schwarzschild black-hole rendering framework.

Built from scratch on JAX/XLA/Pallas with the capability surface of the
reference renderer at /root/reference (hwuu/black-hole-renderer):
GR null-geodesic ray tracing, procedural accretion-disk + skybox
generation, relativistic shading, lens post-FX, ray-differential AA, and
single-frame / orbit-video / interactive-preview run modes — plus
mesh-sharded multi-chip frame rendering.
"""

from .camera import Camera, build_camera, orbit_camera_position
from .config import RESOLUTIONS, SceneConfig, compute_disk_texture_resolution
from .pipeline import Renderer, shade_frame

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "build_camera",
    "orbit_camera_position",
    "SceneConfig",
    "RESOLUTIONS",
    "compute_disk_texture_resolution",
    "Renderer",
    "shade_frame",
]
