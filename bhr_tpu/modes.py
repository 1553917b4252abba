"""Run modes: single frame, orbit video with resume.

Parity targets: reference `render_image` (/root/reference/render.py:
4031-4076) and `render_video` (render.py:4356-4511) — same scene
semantics, resume protocol, and file layout (`.frames_<md5>/`,
`progress.json` with param-change invalidation).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Dict, Optional

import numpy as np

from .camera import orbit_camera_position
from .config import (
    SceneConfig,
    compute_disk_texture_resolution,
    scene_escape_radius,
)
from .models.dynamic_disk import DynamicDiskSystem
from .models.skybox import load_or_generate_skybox
from .pipeline import Renderer
from .utils.io import (
    AsyncPNGWriter,
    IncrementalH264Assembler,
    load_disk_texture,
    write_json_atomic,
)


def _scene_assets(config: SceneConfig) -> tuple:
    """(skybox, disk_tex_or_None, dynamic_or_None) for a config.

    ONE texture-source policy for every engine (per-frame Renderer and
    the sharded tile path): V2 -> no texture; disk_texture='auto' ->
    the .npy cache (reference render.py:1152-1187 key format, generated
    once per radii/seed/camera-size/scale, reloaded on later runs,
    --force_regenerate_disk_texture bypasses); an explicit path -> load
    or fail loudly; otherwise the lifecycle placeholder + dynamic
    system.
    """
    width, height = config.image_size
    skybox, _, _ = load_or_generate_skybox(
        config.texture, 2048, 1024, config.n_stars, seed=config.skybox_seed
    )
    if config.disk_model == "v2":
        # V2 shades by volume integration — no disk texture needed
        # (config.validated() rejects v2 + disk_texture).
        return skybox, None, None
    if config.disk_texture == "auto":
        from .utils.cache import load_cached_disk_texture

        disk_tex = load_cached_disk_texture(
            width, height, list(config.pov), config.fov,
            seed=config.seed,
            r_inner=config.disk_inner_radius,
            r_outer=config.disk_outer_radius,
            force=config.force_regenerate_disk_texture,
            generation_scale=config.disk_generation_scale,
        )
        return skybox, disk_tex, None
    disk_tex = load_disk_texture(config.disk_texture)
    if config.disk_texture is not None and disk_tex is None:
        # Fail loudly: silently falling back to the procedural lifecycle
        # texture would render a completely different scene after a
        # path typo.
        raise FileNotFoundError(
            f"--disk_texture not found or unreadable: {config.disk_texture}"
        )
    dynamic = None
    if disk_tex is None:
        n_phi, n_r = compute_disk_texture_resolution(
            width, height, config.pov, config.fov,
            config.disk_inner_radius, config.disk_outer_radius,
        )
        dynamic = DynamicDiskSystem(
            n_r, n_phi, config.disk_inner_radius, config.disk_outer_radius,
            seed=config.seed,
        )
        disk_tex = np.zeros((n_r, n_phi, 4), np.float32)
    return skybox, disk_tex, dynamic


def _make_renderer(config: SceneConfig,
                   r_escape_quantum: float = 0.0,
                   r_escape_override: Optional[float] = None) -> tuple:
    """Build renderer + (optional) dynamic disk system for a config.

    Single construction path for every mode (image/video/interactive);
    ``r_escape_quantum`` is forwarded to :class:`Renderer` (interactive
    zoom uses it to bound recompiles); ``r_escape_override`` pins the
    trace's escape radius (orbit video passes the scene constant so the
    per-frame value can't drift by ulps and recompile mid-video)."""
    skybox, disk_tex, dynamic = _scene_assets(config)
    renderer = Renderer(config, skybox, disk_tex,
                        r_escape_quantum=r_escape_quantum,
                        r_escape_override=r_escape_override)
    return renderer, dynamic


def video_temp_paths(output_path: str) -> tuple:
    """(temp_dir, progress_file) for a video output path — the
    reference's md5-derived frame directory (render.py:4380-4382)."""
    temp_dir = os.path.join(
        os.path.dirname(output_path) or ".",
        ".frames_" + hashlib.md5(output_path.encode()).hexdigest()[:16],
    )
    return temp_dir, os.path.join(temp_dir, "progress.json")


def video_resume_params(config: SceneConfig, *, sharded: bool = False) -> Dict:
    """progress.json invalidation params — everything that determines
    frame CONTENT, so a resumed run never silently mixes two scenes.

    Superset of the reference's {n_frames, fov, orbit,
    disk_rotation_speed, orbit_degrees} (render.py:4384-4390), which
    would keep stale frames when e.g. the seed or camera changed.
    'sharded' records which engine rendered the frames; it is excluded
    from invalidation (the scene is identical across engines).
    """
    width, height = config.image_size
    params = {
        "n_frames": config.n_frames,
        "fov": config.fov,
        "orbit": config.orbit,
        "disk_rotation_speed": config.disk_rotation_speed,
        "orbit_degrees": config.orbit_degrees,
        "width": width,
        "height": height,
        "pov": [float(x) for x in config.pov],
        "seed": config.seed,
        "skybox_seed": config.skybox_seed,
        "n_stars": config.n_stars,
        "texture": config.texture,
        "disk_texture": config.disk_texture,
        "disk_model": config.disk_model,
        "disk_inner_radius": float(config.disk_inner_radius),
        "disk_outer_radius": float(config.disk_outer_radius),
        "disk_tilt": float(config.disk_tilt),
        "step_size": float(config.step_size),
        "r_max": float(config.r_max),
        "anti_alias": config.anti_alias,
        "aa_strength": float(config.aa_strength),
        "lens_flare": bool(config.lens_flare),
        "sharded": bool(sharded),
    }
    if config.disk_texture is None and config.disk_model == "texture":
        # The resolved low-res generation factor changes texture frame
        # content (it is size-adaptive since the 4K scale-4 change); a
        # resumed video must not silently mix frames generated at two
        # scales.
        from .models.dynamic_disk import adaptive_generation_scale

        n_phi, n_r = compute_disk_texture_resolution(
            width, height, config.pov, config.fov,
            config.disk_inner_radius, config.disk_outer_radius,
        )
        params["generation_scale"] = adaptive_generation_scale(n_r, n_phi)
    if config.disk_model == "v2":
        # Every V2 knob changes frame content. Keyed only for V2 runs so
        # texture-model progress files stay byte-compatible across
        # versions that predate the V2 surface.
        params["v2"] = {
            "palette": config.v2_palette,
            "samples": int(config.v2_samples),
            "h0": float(config.v2_h0),
            "beta_h": float(config.v2_beta_h),
            "rho_power": float(config.v2_rho_power),
            "temp_scale": float(config.v2_temp_scale),
            "omega_scale": float(config.v2_omega_scale),
            "edge_softness": float(config.v2_edge_softness),
            "structure": bool(config.v2_structure),
            "mode1_strength": float(config.v2_mode1_strength),
            "mode2_strength": float(config.v2_mode2_strength),
            "shear_strength": float(config.v2_shear_strength),
            "shear_components": int(config.v2_shear_components),
            "hotspot_strength": float(config.v2_hotspot_strength),
            "hotspot_count": int(config.v2_hotspot_count),
            "hotspot_phi_sigma": float(config.v2_hotspot_phi_sigma),
            "hotspot_logr_sigma": float(config.v2_hotspot_logr_sigma),
            "hotspot_inner_bias": float(config.v2_hotspot_inner_bias),
        }
    return params


def load_video_progress(config: SceneConfig, temp_dir: str,
                        progress_file: str, params: Dict) -> tuple:
    """Shared resume protocol: returns (completed frames, cross_engine).

    Param mismatch wipes the frame dir and restarts (reference
    render.py:4393-4405); a clean (non-resume) run also starts fresh.
    The 'sharded' engine marker never invalidates — resuming the other
    engine's frames is supported (stats cadence differs by a documented
    hair, PARITY.md deviation 5).
    """
    completed: set = set()
    cross_engine = False
    if (config.resume and os.path.isdir(temp_dir)
            and os.path.isfile(progress_file)):
        try:
            with open(progress_file) as f:
                saved = json.load(f)
        except (json.JSONDecodeError, OSError) as exc:
            # Writes are atomic (write_json_atomic), so this only
            # happens for files from pre-atomic runs or external
            # corruption — same remedy as a param mismatch: start over.
            print(f"progress.json unreadable ({exc}); starting over")
            saved = {}
        saved_params = dict(saved.get("params", {}))
        cross_engine = bool(saved_params.pop("sharded", False)) != bool(
            params.get("sharded", False)
        )
        compare = {k: v for k, v in params.items() if k != "sharded"}
        if saved_params != compare:
            if saved:  # corrupt-file path already printed its own reason
                print("Parameters changed; starting over")
            shutil.rmtree(temp_dir)
            os.makedirs(temp_dir, exist_ok=True)
        else:
            completed = set(saved.get("completed", []))
            if cross_engine and completed:
                print("Resuming frames rendered by the other engine "
                      "(per-frame stats cadence differs slightly)")
            print(f"Resuming: {len(completed)}/{config.n_frames} frames done")
    else:
        if os.path.isdir(temp_dir) and not config.resume:
            shutil.rmtree(temp_dir)
        os.makedirs(temp_dir, exist_ok=True)
    return completed, cross_engine


def render_image(config: SceneConfig) -> np.ndarray:
    """Render one frame; dynamic texture generated by the lifecycle
    system at t=0 unless an external disk texture is given.

    With ``tile_shards > 1`` the frame's pixel rows shard across
    devices (parallel.frames.render_image_tiled) — same image, traced
    in parallel."""
    if config.tile_shards > 1:
        from .parallel.frames import render_image_tiled

        t0 = time.time()
        img = render_image_tiled(config)
        print(f"Rendered {config.image_size[0]}x{config.image_size[1]} "
              f"({config.tile_shards} tile shards) "
              f"in {time.time() - t0:.2f}s")
        return img
    renderer, dynamic = _make_renderer(config)
    if dynamic is not None:
        tex = dynamic.advance(t=0.0, dt=0.0, recompute_stats=True)
        renderer.update_disk_texture(tex)

    t0 = time.time()
    img = renderer.render(config.pov, config.fov, frame=0)
    print(f"Rendered {config.image_size[0]}x{config.image_size[1]} "
          f"in {time.time() - t0:.2f}s")
    return img


def sharded_video_eligible(config: SceneConfig) -> bool:
    """True when render_video dispatches to the sharded engine.

    Single source for the dispatch predicate — the CLI's multi-host
    mode guard must agree with render_video exactly, or an accepted
    fleet config could fall through to the sequential path and run N
    duplicated renders against the same output files.
    """
    import jax

    # Both disk models are first-class here: V1 inlines the dynamic
    # texture pipeline per frame, V2 is trace + shade_frame_v2 (a pure
    # function of camera and t). disk_texture is rejected with --video
    # by config validation, so in practice the predicate reduces to the
    # shard-count/device clause — frame_shards=1 is the explicit opt-out
    # into the sequential per-frame loop.
    return (
        config.disk_texture is None
        and config.disk_model in ("texture", "v2")
        and (config.frame_shards > 1
             or (config.frame_shards == 0
                 and (len(jax.devices()) > 1
                      or jax.default_backend() == "tpu")))
    )


def render_video(config: SceneConfig,
                 renderer: Optional[Renderer] = None,
                 dynamic: Optional[DynamicDiskSystem] = None) -> None:
    """Orbit/static video with resumable per-frame checkpoints.

    Frames land as PNGs in `.frames_<md5(output)[:16]>/` next to the
    output; `progress.json` records {params, completed} and is
    invalidated when parameters change. Interrupt + rerun with
    config.resume=True to continue; lifecycle state is re-created by
    fast-replaying factory ticks to the resume point.
    """
    # Batched/sharded path: shard frames across the mesh
    # (zero-communication data parallelism; see parallel/video.py). On a
    # single TPU chip it degrades to a batched sequential renderer that
    # still amortizes dispatch over whole frame batches — strictly
    # faster than the per-frame Renderer loop below, which remains as
    # the explicit opt-out (--frame_shards 1) and for single-device CPU
    # test hosts. Both disk models route here.
    if renderer is None and sharded_video_eligible(config):
        from .parallel.video import render_video_sharded

        render_video_sharded(config)
        return

    output_path = config.output
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    temp_dir, progress_file = video_temp_paths(output_path)
    params = video_resume_params(config, sharded=False)
    completed, _ = load_video_progress(config, temp_dir, progress_file, params)

    if renderer is None:
        # Pin the trace escape radius to the scene constant: recomputing
        # it per frame from the orbit camera varies by ulps across
        # frames, and r_escape is a static arg of the jitted trace —
        # each distinct value would recompile the whole program.
        renderer, dynamic = _make_renderer(
            config, r_escape_override=scene_escape_radius(config)
        )
    dt = config.disk_rotation_speed

    # Fast-replay the lifecycle to the resume point (host bookkeeping +
    # one texture advance per frame, no rendering). Normalization stats
    # are refreshed at the same frame an uninterrupted run last
    # recomputed them (frame % 60 == 0), so the first resumed frames
    # normalize identically instead of using the permissive init stats.
    if completed and dynamic is not None:
        max_done = max(completed)
        stats_frame = 60 * (max_done // 60)
        t0 = time.time()
        for f in range(max_done + 1):
            for fac in dynamic.factories.values():
                fac.tick(now=f * dt, dt=dt)
            if f == stats_frame:
                dynamic.refresh_stats(f * dt)
        print(f"Replayed lifecycle to frame {max_done} "
              f"in {time.time() - t0:.1f}s")

    writer = AsyncPNGWriter(max_workers=2, max_pending=4)
    # Inline H.264: encode each frame from RAM as it renders, so on an
    # uninterrupted run the post-pass (which would re-decode every PNG)
    # never runs. Any failure just falls back to _assemble_video.
    assembler = IncrementalH264Assembler(
        output_path, config.n_frames, config.fps, temp_dir,
        crf=config.video_crf,
    )
    total_t0 = time.time()

    # The with-block covers everything through finalize: an exception
    # ANYWHERE in it (frame loop, PNG drain in writer.close, progress
    # write) discards the partial video via __exit__.
    with assembler:
        _render_video_frames(config, temp_dir, renderer, dynamic, writer,
                             assembler, completed, progress_file, params,
                             total_t0)

        writer.close()
        write_json_atomic(
            progress_file, {"params": params, "completed": sorted(completed)}
        )

        if len(completed) < config.n_frames:
            assembler.discard()
            print(f"Only {len(completed)}/{config.n_frames} frames done. "
                  "Run again with resume to continue.")
            return

        print(f"All frames rendered in "
              f"{(time.time() - total_t0) / 60:.1f} min")
        if assembler.finalize():
            print(f"Video saved: {output_path}")
        else:
            _assemble_video(temp_dir, output_path, config.n_frames,
                            config.fps, crf=config.video_crf)


def _render_video_frames(config, temp_dir, renderer, dynamic, writer,
                         assembler, completed, progress_file, params,
                         total_t0) -> None:
    """The sequential per-frame loop of render_video (factored out so
    the caller can guarantee assembler cleanup on any interruption)."""
    dt = config.disk_rotation_speed
    rendered = 0
    for frame in range(config.n_frames):
        t = frame * dt
        if config.orbit:
            cam_pos = orbit_camera_position(
                frame, config.n_frames, config.orbit_degrees, config.pov
            )
        else:
            cam_pos = config.pov

        if frame in completed:
            continue

        if dynamic is not None:
            tex = dynamic.advance(t, dt, recompute_stats=(frame % 60 == 0))
            renderer.update_disk_texture(tex)
        # Lifecycle textures already carry their rotation (analytic
        # advection at time t), so they render at frame=0; external/V2
        # disks rotate through the sampler's t_offset = frame * dt.
        img = renderer.render(
            cam_pos, config.fov, frame=(0 if dynamic is not None else frame)
        )
        rendered += 1

        writer.submit(img, os.path.join(temp_dir, f"frame_{frame:04d}.png"))
        assembler.submit(frame, img)
        completed.add(frame)
        if rendered % 10 == 0 or frame == config.n_frames - 1:
            # Flush pending PNGs first: a frame must exist on disk
            # before progress.json records it as completed (a crash in
            # between would otherwise lose it permanently under resume).
            writer.drain()
            write_json_atomic(
                progress_file,
                {"params": params, "completed": sorted(completed)},
            )

        if rendered % 100 == 0:
            eta = (time.time() - total_t0) / rendered * (
                config.n_frames - len(completed)
            )
            print(f"frame {frame}/{config.n_frames} "
                  f"done {len(completed)} ETA {eta / 60:.0f}min")


def _assemble_video(temp_dir: str, output_path: str, n_frames: int,
                    fps: int, crf: int = 18) -> None:
    """H.264 assembly: native libavcodec writer, then imageio/pyav,
    then the ffmpeg CLI, then the dependency-free MJPEG AVI."""
    if _assemble_video_native(temp_dir, output_path, n_frames, fps, crf):
        return
    writer = None
    try:
        import imageio.v3 as iio

        writer = iio.imopen(output_path, "w", plugin="pyav")
        writer.init_video_stream("libx264", fps=fps)
        for frame in range(n_frames):
            img = iio.imread(os.path.join(temp_dir, f"frame_{frame:04d}.png"))
            writer.write_frame(img)
        writer.close()
        print(f"Video saved: {output_path}")
        return
    except Exception as exc:  # imageio/pyav not installed, or codec issue
        # Close the leaked writer and remove the truncated output — a
        # partial .mp4 at the advertised path would look finished.
        if writer is not None:
            try:
                writer.close()
            except Exception:
                pass
            try:
                os.remove(output_path)
            except OSError:
                pass
        print(f"pyav unavailable ({exc}); trying ffmpeg")
    import shutil as _shutil
    import subprocess

    if _shutil.which("ffmpeg"):
        cmd = [
            "ffmpeg", "-y", "-framerate", str(fps),
            "-i", os.path.join(temp_dir, "frame_%04d.png"),
            "-c:v", "libx264", "-crf", str(crf), "-pix_fmt", "yuv420p",
            output_path,
        ]
        if subprocess.run(cmd, capture_output=True).returncode == 0:
            print(f"Video saved: {output_path}")
            return
    # Final fallback: dependency-free MJPEG AVI. A failure here (e.g. a
    # missing/corrupt frame PNG) must never lose an hours-long render:
    # fall through to the keep-frames message instead of raising.
    from .utils.io import write_mjpeg_avi

    base, ext = os.path.splitext(output_path)
    avi_path = output_path if ext.lower() == ".avi" else base + ".avi"
    frames = [
        os.path.join(temp_dir, f"frame_{f:04d}.png") for f in range(n_frames)
    ]
    try:
        write_mjpeg_avi(frames, avi_path, fps)
    except Exception as exc:
        print(f"MJPEG AVI fallback failed ({exc}); "
              f"frames kept in {temp_dir}")
        print(f"Assemble manually: ffmpeg -framerate {fps} -i "
              f"{temp_dir}/frame_%04d.png -c:v libx264 -crf 18 "
              f"-pix_fmt yuv420p {output_path}")
        return
    print(f"Video saved (MJPEG AVI fallback): {avi_path}")
    if avi_path != output_path:
        print(f"Re-mux to {ext or '.mp4'} later: "
              f"ffmpeg -i {avi_path} -c:v libx264 -crf 18 "
              f"-pix_fmt yuv420p {output_path}")


def _assemble_video_native(temp_dir: str, output_path: str, n_frames: int,
                           fps: int, crf: int = 18) -> bool:
    """H.264/MP4 assembly via the native libavcodec writer
    (bhr_tpu/native/fastvideo.cpp). True on success; False means "try
    the next assembler" (unavailable codec, odd frame dimensions, a
    bad frame PNG, ...) with any partial output removed."""
    import numpy as np
    from PIL import Image

    from . import native
    from .utils.io import H264_CONTAINER_EXTS

    if os.path.splitext(output_path)[1].lower() not in H264_CONTAINER_EXTS:
        return False
    try:
        if not native.video_available():
            return False
        first = np.asarray(
            Image.open(os.path.join(temp_dir, "frame_0000.png")).convert("RGB")
        )
        height, width = first.shape[:2]
        os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
        with native.H264Writer(output_path, width, height, fps,
                               crf=crf) as writer:
            writer.write(first)
            for frame in range(1, n_frames):
                writer.write(np.asarray(
                    Image.open(
                        os.path.join(temp_dir, f"frame_{frame:04d}.png")
                    ).convert("RGB")
                ))
        print(f"Video saved: {output_path}")
        return True
    except BaseException as exc:
        # A truncated .mp4 at the advertised path would look finished.
        # (H264Writer.__exit__ already skipped the trailer; remove the
        # unfinalized bytes too.) Ctrl-C must still interrupt the run,
        # so only plain Exceptions fall through to the next assembler.
        try:
            os.remove(output_path)
        except OSError:
            pass
        if not isinstance(exc, Exception):
            raise
        print(f"native H.264 assembly unavailable ({exc}); "
              "trying imageio/pyav")
        return False
