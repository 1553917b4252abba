"""Command-line interface, mirroring the reference CLI surface.

Parity target: reference `parse_args`/`validate_args`/`__main__`
(/root/reference/render.py:4518-4695) — same flags (including accepted
deprecated ones), same defaults, same resolution presets.

Usage:
    python -m bhr_tpu.cli --pov 6 0 0.5 --fov 90 -r fhd -o out/frame.png
    python -m bhr_tpu.cli --video --orbit --n_frames 3600 --resume
    python -m bhr_tpu.cli --interactive
"""

from __future__ import annotations

import argparse
import sys

from .config import RESOLUTIONS, SceneConfig
from .constants import (
    DISK_GENERATION_SCALE_CHOICES,
    R_DISK_INNER_DEFAULT,
    R_DISK_OUTER_DEFAULT,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native Schwarzschild black-hole ray-tracing renderer"
    )
    p.add_argument("--pov", type=float, nargs=3, default=[6.0, 0.0, 0.5],
                   metavar=("X", "Y", "Z"), help="camera position")
    p.add_argument("--fov", type=float, default=90.0,
                   help="field of view in degrees (0-180)")
    p.add_argument("--resolution", "-r", type=str, default="fhd",
                   choices=sorted(RESOLUTIONS), help="resolution preset")
    p.add_argument("--texture", "-t", type=str, default=None,
                   help="skybox texture path (default: procedural)")
    p.add_argument("--output", "-o", type=str, default="output/blackhole.png",
                   help="output path")
    p.add_argument("--step_size", "-s", type=float, default=0.1,
                   help="integration base step")
    p.add_argument("--r_max", type=float, default=10.0, help="escape radius")
    p.add_argument("--n_stars", type=int, default=6000,
                   help="procedural skybox star count")
    p.add_argument("--disk_texture", type=str, default=None,
                   help="external disk texture (static single-frame "
                        "only), or 'auto' to generate-and-cache the "
                        "static procedural texture "
                        "(output/.disk_texture_cache, reference "
                        "render.py:1152-1187)")
    p.add_argument("--disk_model", type=str, default="texture",
                   choices=["texture", "v2"],
                   help="disk shading model: procedural texture (V1) or "
                        "disk_v2 volume emission integration")
    p.add_argument("--disk_generation_scale", type=int, default=2,
                   choices=DISK_GENERATION_SCALE_CHOICES,
                   help="low-res generation factor for --disk_texture "
                        "auto; unused by the lifecycle system")
    p.add_argument("--force_regenerate_disk_texture", action="store_true",
                   help="with --disk_texture auto: regenerate the cached "
                        "static texture; otherwise inert (the lifecycle "
                        "system regenerates every frame)")
    v2 = p.add_argument_group(
        "disk_v2", "volume-model knobs (with --disk_model v2); "
        "mirrors DiskV2Params/DiskV2StructureParams"
    )
    v2.add_argument("--v2_palette", type=str, default="cinematic",
                    choices=["scientific", "cinematic"],
                    help="V2 intensity/temperature -> RGB mapping")
    v2.add_argument("--v2_samples", type=int, default=8,
                    help="V2 slab quadrature samples per disk crossing")
    v2.add_argument("--v2_h0", type=float, default=0.05,
                    help="V2 thickness fraction at r ~ r_in")
    v2.add_argument("--v2_beta_h", type=float, default=0.05,
                    help="V2 thickness growth power-law index")
    v2.add_argument("--v2_rho_power", type=float, default=1.0,
                    help="V2 midplane density radial decay exponent")
    v2.add_argument("--v2_temp_scale", type=float, default=1.0)
    v2.add_argument("--v2_omega_scale", type=float, default=1.0)
    v2.add_argument("--v2_edge_softness", type=float, default=0.1,
                    help="V2 smooth-edge width fraction, [0, 0.5)")
    v2.add_argument("--v2_structure", action="store_true",
                    help="enable the V2 structure modulation layer "
                         "(m=1/m=2 modes, shear texture, hotspots)")
    v2.add_argument("--v2_mode1_strength", type=float, default=0.03)
    v2.add_argument("--v2_mode2_strength", type=float, default=0.05)
    v2.add_argument("--v2_shear_strength", type=float, default=0.22)
    v2.add_argument("--v2_shear_components", type=int, default=8)
    v2.add_argument("--v2_hotspot_strength", type=float, default=0.16)
    v2.add_argument("--v2_hotspot_count", type=int, default=8)
    v2.add_argument("--v2_hotspot_phi_sigma", type=float, default=0.18)
    v2.add_argument("--v2_hotspot_logr_sigma", type=float, default=0.12)
    v2.add_argument("--v2_hotspot_inner_bias", type=float, default=2.0)
    p.add_argument("--disk_inner_radius", "--ar1", dest="disk_inner_radius",
                   type=float, default=R_DISK_INNER_DEFAULT)
    p.add_argument("--disk_outer_radius", "--ar2", dest="disk_outer_radius",
                   type=float, default=R_DISK_OUTER_DEFAULT)
    p.add_argument("--disk_tilt", type=float, default=0.0,
                   help="disk tilt in degrees")
    p.add_argument("--lens_flare", action="store_true")
    p.add_argument("--anti_alias", type=str, default="disabled",
                   choices=["disabled", "lod_radius"])
    p.add_argument("--aa_strength", type=float, default=1.0,
                   help="AA LOD multiplier in [0.5, 2.0]")
    p.add_argument("--device", "-d", type=str, default="auto",
                   choices=["auto", "tpu", "cpu"],
                   help="compute platform")
    p.add_argument("--frame_shards", type=int, default=0,
                   help="video frame shards across devices "
                        "(0 = all devices, 1 = sequential)")
    p.add_argument("--frames_per_dispatch", type=int, default=0,
                   help="video frames per device per dispatch "
                        "(0 = adaptive; bigger batches amortize the "
                        "per-dispatch round trip, smaller ones cut "
                        "memory and resume-loss granularity)")
    p.add_argument("--tile_shards", type=int, default=0,
                   help="single-frame mode: split pixel rows of the "
                        "frame across this many devices (0/1 = off); "
                        "for 4K/8K stills on multi-chip hosts")
    p.add_argument("--video", action="store_true")
    p.add_argument("--interactive", action="store_true")
    p.add_argument("--preview_port", type=int, default=0,
                   help="with --interactive on a headless host: serve "
                        "the live render as MJPEG over HTTP on this "
                        "port (keys injected via /key?k=...)")
    p.add_argument("--preview_host", type=str, default="127.0.0.1",
                   help="bind address for --preview_port (loopback by "
                        "default: /key is unauthenticated; pass "
                        "0.0.0.0 to expose beyond this host)")
    p.add_argument("--orbit", action="store_true")
    p.add_argument("--orbit_degrees", type=float, default=360.0,
                   help="total orbit sweep (negative = reverse)")
    p.add_argument("--n_frames", type=int, default=3600)
    p.add_argument("--fps", type=int, default=36)
    p.add_argument("--video_crf", type=int, default=18,
                   help="H.264 quality (x264 CRF, 0=lossless..51; "
                        "default 18 ~ visually lossless)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--disk_rotation_algorithm", type=str, default="baseline",
                   choices=["baseline", "parametric", "keyframes"],
                   help="[deprecated] lifecycle system is always used")
    p.add_argument("--disk_rotation_speed", type=float, default=0.1)
    p.add_argument("--keyframes_count", type=int, default=10,
                   help="[deprecated]")
    p.add_argument("--ignore_taichi_cache", action="store_true",
                   help="[deprecated] Taichi-specific; the XLA analogue "
                        "is --no_compile_cache (reference render.py:4560)")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="multi-host rendering: coordinator host:port for "
                        "jax.distributed (run one process per host of a "
                        "pod slice; frames shard over ALL hosts' chips "
                        "with zero cross-host traffic)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="multi-host: total process count "
                        "(with --coordinator_address)")
    p.add_argument("--process_id", type=int, default=None,
                   help="multi-host: this process's rank "
                        "(with --coordinator_address)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax debug_nans (traps NaN/Inf in any "
                        "compiled computation)")
    p.add_argument("--compile_cache", action="store_true",
                   help="[deprecated] the cache is on by default; "
                        "disable with --no_compile_cache")
    p.add_argument("--no_compile_cache", action="store_true",
                   help="disable the persistent XLA compilation cache "
                        "(on by default, mirroring the reference's "
                        "always-on Taichi offline cache, render.py:2222)")
    return p


def config_from_args(args: argparse.Namespace) -> SceneConfig:
    return SceneConfig(
        pov=tuple(args.pov),
        fov=args.fov,
        resolution=args.resolution,
        texture=args.texture,
        output=args.output,
        step_size=args.step_size,
        r_max=args.r_max,
        n_stars=args.n_stars,
        disk_texture=args.disk_texture,
        disk_model=args.disk_model,
        v2_palette=args.v2_palette,
        v2_samples=args.v2_samples,
        v2_h0=args.v2_h0,
        v2_beta_h=args.v2_beta_h,
        v2_rho_power=args.v2_rho_power,
        v2_temp_scale=args.v2_temp_scale,
        v2_omega_scale=args.v2_omega_scale,
        v2_edge_softness=args.v2_edge_softness,
        v2_structure=args.v2_structure,
        v2_mode1_strength=args.v2_mode1_strength,
        v2_mode2_strength=args.v2_mode2_strength,
        v2_shear_strength=args.v2_shear_strength,
        v2_shear_components=args.v2_shear_components,
        v2_hotspot_strength=args.v2_hotspot_strength,
        v2_hotspot_count=args.v2_hotspot_count,
        v2_hotspot_phi_sigma=args.v2_hotspot_phi_sigma,
        v2_hotspot_logr_sigma=args.v2_hotspot_logr_sigma,
        v2_hotspot_inner_bias=args.v2_hotspot_inner_bias,
        disk_inner_radius=args.disk_inner_radius,
        disk_outer_radius=args.disk_outer_radius,
        disk_tilt=args.disk_tilt,
        lens_flare=args.lens_flare,
        anti_alias=args.anti_alias,
        aa_strength=args.aa_strength,
        device=args.device,
        frame_shards=args.frame_shards,
        frames_per_dispatch=args.frames_per_dispatch,
        tile_shards=args.tile_shards,
        video=args.video,
        interactive=args.interactive,
        orbit=args.orbit,
        orbit_degrees=args.orbit_degrees,
        n_frames=args.n_frames,
        fps=args.fps,
        video_crf=args.video_crf,
        resume=args.resume,
        disk_rotation_speed=args.disk_rotation_speed,
        seed=args.seed,
        disk_generation_scale=args.disk_generation_scale,
        disk_rotation_algorithm=args.disk_rotation_algorithm,
        keyframes_count=args.keyframes_count,
        force_regenerate_disk_texture=args.force_regenerate_disk_texture,
    ).validated()


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    if (args.coordinator_address is None
            and (args.num_processes is not None
                 or args.process_id is not None)):
        # Without the coordinator this process would run a normal
        # single-process render racing the real fleet's temp dir and
        # progress file on the shared filesystem.
        parser.error("--num_processes/--process_id require "
                     "--coordinator_address")
    config = config_from_args(args)

    import jax

    if config.device != "auto":
        jax.config.update("jax_platforms", config.device)
    if args.coordinator_address is not None:
        # Must run before any other jax API initializes the backend;
        # afterwards jax.devices() spans every host in the slice.
        from .parallel.mesh import initialize_multihost

        n = initialize_multihost(args.coordinator_address,
                                 args.num_processes, args.process_id)
        if jax.process_index() == 0:
            print(f"multi-host: {n} processes, "
                  f"{len(jax.devices())} devices total")
        if n > 1:
            # Only the sharded video engine is multi-host aware; any
            # other mode would run N duplicated renders against the
            # same output files. Same predicate render_video dispatches
            # on (single-sourced), plus all-devices frame_shards (the
            # sharded engine itself enforces it, but failing here keeps
            # the message actionable) — fail loud on every process.
            from .modes import sharded_video_eligible

            if not (config.video
                    and not config.interactive
                    and sharded_video_eligible(config)
                    and config.frame_shards in (0, len(jax.devices()))):
                parser.error(
                    "multi-host runs support only sharded orbit video: "
                    "--video without --interactive/--disk_texture, "
                    "and --frame_shards 0 (all "
                    f"devices) or {len(jax.devices())}"
                )
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if not args.no_compile_cache:
        from .utils.cache import enable_compile_cache

        enable_compile_cache()

    if config.interactive:
        from .interactive import run_interactive

        run_interactive(config, preview_port=args.preview_port,
                        preview_host=args.preview_host)
    elif config.video:
        from .modes import render_video

        render_video(config)
    else:
        from .modes import render_image
        from .utils.io import save_image

        img = render_image(config)
        save_image(img, config.output)
        print(f"Saved: {config.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
