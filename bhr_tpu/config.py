"""Scene configuration: a single dataclass mirroring the reference CLI.

Parity target: `parse_args`/`validate_args` (/root/reference/render.py:
4518-4616). The dataclass is the API; the CLI (cli.py) is a thin shell.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

from .constants import (
    DISK_GENERATION_SCALE_CHOICES,
    R_DISK_INNER_DEFAULT,
    R_DISK_OUTER_DEFAULT,
    RS,
)

RESOLUTIONS = {
    "4k": (3840, 2160),
    "fhd": (1920, 1080),
    "hd": (1280, 720),
    "sd": (640, 360),
}


@dataclass(frozen=True)
class SceneConfig:
    """Complete scene + run configuration (the reference's CLI surface)."""

    # Camera
    pov: Tuple[float, float, float] = (6.0, 0.0, 0.5)
    fov: float = 90.0
    resolution: str = "fhd"
    width: Optional[int] = None  # explicit override of resolution preset
    height: Optional[int] = None

    # Integration
    step_size: float = 0.1
    r_max: float = 10.0

    # Skybox
    texture: Optional[str] = None
    n_stars: int = 6000
    skybox_seed: int = 42

    # Disk
    disk_model: str = "texture"  # "texture" (V1) | "v2" (volume integration)
    disk_texture: Optional[str] = None
    disk_inner_radius: float = R_DISK_INNER_DEFAULT
    disk_outer_radius: float = R_DISK_OUTER_DEFAULT
    disk_tilt: float = 0.0
    disk_rotation_speed: float = 0.1
    seed: int = 42

    # Disk V2 (volume model) surface — mirrors DiskV2Params /
    # DiskV2StructureParams (reference disk_v2/params.py:12-144) plus
    # the renderer knobs (palette, quadrature samples). r_in/r_out come
    # from disk_inner_radius/disk_outer_radius.
    v2_palette: str = "cinematic"  # "scientific" | "cinematic"
    v2_samples: int = 8  # slab quadrature samples per crossing
    v2_h0: float = 0.05
    v2_beta_h: float = 0.05
    v2_rho_power: float = 1.0
    v2_temp_scale: float = 1.0
    v2_omega_scale: float = 1.0
    v2_edge_softness: float = 0.1
    # Structure modulation layer (off by default, like the reference's
    # model-less default track); strengths validated by
    # DiskV2StructureParams.__post_init__.
    v2_structure: bool = False
    v2_mode1_strength: float = 0.03
    v2_mode2_strength: float = 0.05
    v2_shear_strength: float = 0.22
    v2_shear_components: int = 8
    v2_hotspot_strength: float = 0.16
    v2_hotspot_count: int = 8
    v2_hotspot_phi_sigma: float = 0.18
    v2_hotspot_logr_sigma: float = 0.12
    v2_hotspot_inner_bias: float = 2.0

    # Post-FX / AA
    lens_flare: bool = False
    anti_alias: str = "disabled"  # "disabled" | "lod_radius"
    aa_strength: float = 1.0

    # Modes
    video: bool = False
    interactive: bool = False
    orbit: bool = False
    orbit_degrees: float = 360.0
    n_frames: int = 3600
    fps: int = 36
    # H.264 quality for assembled videos (x264 CRF: 0 lossless ..
    # 51 worst; 18 ~ visually lossless). Used by the native writer;
    # the pyav/ffmpeg fallbacks keep their own defaults.
    video_crf: int = 18
    resume: bool = False
    output: str = "output/blackhole.png"

    # Device / parallelism
    device: str = "auto"  # "auto" | "tpu" | "cpu"
    frame_shards: int = 0  # 0 = all local devices
    # Single-frame spatial sharding: split pixel rows of ONE frame over
    # this many devices ("tile" mesh axis; 0/1 = off). For large stills
    # (4K/8K) on a pod slice; video shards whole frames instead.
    tile_shards: int = 0
    # Video frames rendered per device per dispatch (0 = adaptive:
    # batch small frames until a dispatch carries ~4 FHD frames of
    # pixels, capped at 16). Each dispatch pays a fixed host round
    # trip, so bigger batches amortize it; smaller batches reduce
    # per-batch memory and resume-loss granularity. Like the engine
    # choice, this does not invalidate resume: frame content is
    # scene-identical across batch sizes (bitwise only for identical
    # per-device shapes).
    frames_per_dispatch: int = 0

    # Deprecated (accepted, ignored — reference render.py:4540-4582)
    disk_generation_scale: int = 2
    disk_rotation_algorithm: str = "baseline"
    keyframes_count: int = 10
    force_regenerate_disk_texture: bool = False

    @property
    def image_size(self) -> Tuple[int, int]:
        """(width, height) in pixels."""
        if self.width is not None and self.height is not None:
            return (self.width, self.height)
        return RESOLUTIONS[self.resolution]

    def validated(self) -> "SceneConfig":
        """Validate and normalize; raises ValueError on bad input."""
        # Out-of-range FOV is an error, not a silent remap (reference
        # validate_args, render.py:4586-4616 raises on fov outside
        # (0, 180) — a typo like --fov 190 must not render at 10).
        if not (0.0 < self.fov < 180.0):
            raise ValueError(f"FOV must be in (0, 180), got {self.fov}")
        # The camera basis divides by |pov| and no light escapes from
        # inside the horizon — pov at/inside r=RS would render NaNs or
        # garbage instead of failing fast like the other typo guards.
        pov_dist = _cam_distance(self.pov)
        if not math.isfinite(pov_dist) or pov_dist <= RS:
            raise ValueError(
                f"camera |pov| must be finite and outside the event "
                f"horizon r={RS}, got |{tuple(self.pov)}| = {pov_dist:.3g}"
            )
        if (self.width is None) != (self.height is None):
            raise ValueError(
                "width and height must be overridden together "
                f"(got width={self.width}, height={self.height}); a lone "
                "override would silently fall back to the resolution preset"
            )
        if self.width is not None and (self.width <= 0 or self.height <= 0):
            raise ValueError(
                f"image size must be positive, got {self.width}x{self.height}"
            )
        if self.disk_inner_radius >= self.disk_outer_radius:
            raise ValueError(
                f"disk_inner_radius ({self.disk_inner_radius}) must be less "
                f"than disk_outer_radius ({self.disk_outer_radius})"
            )
        if self.step_size <= 0:
            raise ValueError(f"step_size must be positive, got {self.step_size}")
        if not (0.5 <= self.aa_strength <= 2.0):
            raise ValueError(f"aa_strength must be in [0.5, 2.0], got {self.aa_strength}")
        if self.n_frames <= 0:
            raise ValueError(f"n_frames must be positive, got {self.n_frames}")
        if self.fps <= 0:
            raise ValueError(f"fps must be positive, got {self.fps}")
        if not (0 <= self.video_crf <= 51):
            raise ValueError(
                f"video_crf must be in [0, 51], got {self.video_crf}")
        if not math.isfinite(self.orbit_degrees):
            raise ValueError(f"orbit_degrees must be finite, got {self.orbit_degrees}")
        if self.anti_alias not in ("disabled", "lod_radius"):
            raise ValueError(f"unknown anti_alias mode: {self.anti_alias}")
        if self.disk_model not in ("texture", "v2"):
            raise ValueError(f"unknown disk_model: {self.disk_model}")
        if self.v2_palette not in ("scientific", "cinematic"):
            raise ValueError(
                f"v2_palette must be 'scientific' or 'cinematic', "
                f"got {self.v2_palette!r}"
            )
        if self.v2_samples <= 0:
            raise ValueError(
                f"v2_samples must be positive, got {self.v2_samples}"
            )
        if self.disk_model == "v2":
            # Construct the param objects so their validators run at
            # config time (fail fast on e.g. mode strengths summing
            # past 1) instead of deep inside the jitted pipeline.
            self.v2_params()
            self.v2_structure_params()
        if self.disk_texture and (self.video or self.interactive):
            raise ValueError(
                "disk_texture only supports static single-frame rendering; "
                "video/interactive modes use the lifecycle system"
            )
        if self.disk_texture and self.disk_model == "v2":
            raise ValueError(
                "disk_texture is a V1 (texture-model) input; the v2 disk "
                "model shades by volume integration and takes no texture"
            )
        if self.tile_shards < 0:
            raise ValueError(
                f"tile_shards must be >= 0, got {self.tile_shards}")
        if self.frame_shards < 0:
            raise ValueError(
                f"frame_shards must be >= 0, got {self.frame_shards}")
        if self.frame_shards > 1 and not self.video:
            # Fail loud, never silently ignore an explicit shard
            # request (PARITY.md deviation 10): frame sharding is a
            # video-engine concept; a still frame shards pixel rows
            # instead.
            raise ValueError(
                "frame_shards applies to --video only; for single-frame "
                "spatial sharding use --tile_shards"
            )
        if self.frames_per_dispatch < 0:
            raise ValueError(
                f"frames_per_dispatch must be >= 0 (0 = adaptive), "
                f"got {self.frames_per_dispatch}")
        if self.tile_shards > 1:
            if self.video or self.interactive:
                raise ValueError(
                    "tile_shards applies to single-frame rendering only; "
                    "video shards whole frames (--frame_shards)"
                )
            height = self.image_size[1]
            if height % self.tile_shards != 0:
                raise ValueError(
                    f"image height {height} is not divisible by "
                    f"tile_shards {self.tile_shards}"
                )
        if self.disk_generation_scale not in DISK_GENERATION_SCALE_CHOICES:
            raise ValueError(
                f"disk_generation_scale must be one of "
                f"{DISK_GENERATION_SCALE_CHOICES}, got {self.disk_generation_scale}"
            )
        if self.resolution not in RESOLUTIONS:
            raise ValueError(f"unknown resolution preset: {self.resolution}")
        return self

    def v2_params(self):
        """Build the DiskV2Params for this scene (disk_model='v2')."""
        from .models.disk_v2.params import DiskV2Params

        return DiskV2Params(
            r_in=float(self.disk_inner_radius),
            r_out=float(self.disk_outer_radius),
            h0=float(self.v2_h0),
            beta_h=float(self.v2_beta_h),
            rho_power=float(self.v2_rho_power),
            temp_scale=float(self.v2_temp_scale),
            omega_scale=float(self.v2_omega_scale),
            edge_softness=float(self.v2_edge_softness),
        )

    def v2_structure_params(self):
        """DiskV2StructureParams when v2_structure is on, else None."""
        if not self.v2_structure:
            return None
        from .models.disk_v2.params import DiskV2StructureParams

        return DiskV2StructureParams(
            mode1_strength=float(self.v2_mode1_strength),
            mode2_strength=float(self.v2_mode2_strength),
            shear_strength=float(self.v2_shear_strength),
            shear_components=int(self.v2_shear_components),
            hotspot_strength=float(self.v2_hotspot_strength),
            hotspot_count=int(self.v2_hotspot_count),
            hotspot_phi_sigma=float(self.v2_hotspot_phi_sigma),
            hotspot_logr_sigma=float(self.v2_hotspot_logr_sigma),
            hotspot_inner_bias=float(self.v2_hotspot_inner_bias),
        )

    @property
    def use_ray_differentials(self) -> bool:
        """Whether frames trace the 4 extra ray-differential RK4 systems.

        AA differentials feed the texture-model mip/LOD sampler only;
        the v2 volume integrator has no LOD path, so tracing them there
        would be pure waste (~2-3x the hot-loop cost, reference
        docs/design.md:577) with zero image effect. ONE source for
        every engine."""
        return self.anti_alias != "disabled" and self.disk_model != "v2"


def _cam_distance(cam_pos) -> float:
    """Euclidean camera distance |cam_pos| (host float)."""
    return math.sqrt(sum(float(c) ** 2 for c in cam_pos))


def escape_radius(r_max: float, cam_pos) -> float:
    """Trace escape radius: ``max(r_max, 2 x camera distance)`` — the
    reference's formula (render.py:3829, 3884). ONE source for every
    engine (per-frame renderer, sharded video, bench, driver hooks).

    Note the reference semantics this preserves: with the default
    r_max=10 and disk_outer_radius=15, disk-plane crossings beyond the
    escape radius are shaded as sky in BOTH implementations — raising
    r_max is the supported way to render the far annulus.
    """
    return max(float(r_max), 2.0 * _cam_distance(cam_pos))


def scene_escape_radius(config: "SceneConfig") -> float:
    """Escape radius for a whole scene or video, identical across engines.

    Orbit videos place every frame's camera at distance
    ``sqrt(|pov|**2 + pov_z**2)``: the orbit keeps radius ``|pov|`` (3-D
    norm) in the xy-plane AND preserves z (camera.orbit_camera_position;
    reference render.py:4440-4447), so the sequential engine's per-frame
    ``escape_radius(r_max, cam_pos)`` is one constant. Computing that
    same constant here keeps the batched sharded engine tracing the
    identical scene — with pov z != 0, ``escape_radius(r_max, pov)``
    would be slightly smaller and far-annulus disk crossings would
    flicker between engines under cross-engine resume.
    """
    if config.orbit:
        d = math.sqrt(
            _cam_distance(config.pov) ** 2 + float(config.pov[2]) ** 2
        )
        return max(float(config.r_max), 2.0 * d)
    return escape_radius(config.r_max, config.pov)


def compute_disk_texture_resolution(
    width: int,
    height: int,
    cam_pos: Tuple[float, float, float],
    fov: float,
    r_inner: float,
    r_outer: float,
) -> Tuple[int, int]:
    """Camera-dependent polar texture size (n_phi, n_r).

    ~1 phi sample per screen pixel of disk coverage, 0.5 radial samples;
    floors of 256/128, rounded up to multiples of 16.
    Parity: reference render.py:1128-1149.
    """
    cam_dist = math.sqrt(sum(c * c for c in cam_pos))
    ang_radius = math.atan(r_outer / cam_dist)
    ang_extent = 2.0 * ang_radius
    screen_fraction = fov * math.pi / 180.0

    n_phi = int(width * (ang_extent / screen_fraction))
    n_r = int(height * (ang_radius / screen_fraction) * 0.5)
    n_phi = max(256, n_phi)
    n_r = max(128, n_r)
    n_phi += (16 - n_phi % 16) % 16
    n_r += (16 - n_r % 16) % 16
    return n_phi, n_r
