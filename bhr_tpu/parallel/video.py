"""Mesh-sharded dynamic orbit video.

The reference renders orbit videos sequentially (render.py:4437-4476).
Frames are embarrassingly parallel *if* per-frame scene state can be
computed independently — and it can: the entity lifecycle control plane
is deterministic host bookkeeping, so we fast-replay it once for ALL
frames, pack per-frame entity parameters, and let every device render
its frame shard with zero cross-device communication:

  host:   factory replay -> per-frame entity params (F, MAX_E, 8)
  device: background noise + entity evaluation -> comp field
          -> per-frame stats -> compose -> mips -> quad pack
          -> geodesic trace -> deferred shade -> bloom -> final frame

One deliberate semantic upgrade vs the reference: normalization stats
recompute EVERY frame on-device (the reference recomputes every 60
frames only because its readback+percentile path is slow,
render.py:4456); continuous stats remove the 60-frame brightness jumps.

Works identically on the CPU test mesh (8 virtual devices) and a real
TPU pod slice; a 1-device mesh degrades to an efficient batched
sequential renderer.

Both disk models render through this engine: the pipeline above is the
V1 texture model's; for disk_model="v2" the per-frame program is just
trace + shade_frame_v2 (+ lens stack) — a pure function of (camera, t)
with no host-packed state at all.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import (
    SceneConfig,
    compute_disk_texture_resolution,
    scene_escape_radius,
)
from ..constants import MAX_DISK_CROSSINGS
from ..models.disk_texture import compose_from_components
from ..models.dynamic_disk import (
    DynamicDiskSystem,
    _recompute_stats,
    assemble_comp,
)
from ..models.lifecycle import (
    MAX_HOTSPOTS,
    MAX_RT_SPIKES,
    accumulate_entity_layer,
    pack_filaments,
    pack_timer_entities,
)
from ..ops import geodesic
from ..ops.background import generate_background_components
from ..ops.bloom import apply_bloom
from ..ops.lens_flare import apply_lens_flare
from ..ops.sampling import (
    build_mipmaps,
    pack_quad,
    pack_quad_mips,
    production_tex_dtype,
    quantize_packed,
)
from ..pipeline import shade_frame
from .frames import cameras_for_orbit, pack_cameras


def pack_frame_params(
    dynamic: DynamicDiskSystem, n_frames: int, dt: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Replay the lifecycle for all frames; pack per-frame entity params.

    Returns (fil (F, MF, 8), hs (F, MH, 8), rt (F, MR, 8)) float32.
    Mutates the dynamic system's factories (replay to frame n_frames-1).
    """
    fils, hss, rts = [], [], []
    for frame in range(n_frames):
        t = frame * dt
        for fac in dynamic.factories.values():
            fac.tick(now=t, dt=dt)
        fils.append(pack_filaments(dynamic.factories["filament"], t))
        hss.append(pack_timer_entities(dynamic.factories["hotspot"], t,
                                       MAX_HOTSPOTS))
        rts.append(pack_timer_entities(dynamic.factories["rt_spike"], t,
                                       MAX_RT_SPIKES))
    return (np.stack(fils), np.stack(hss), np.stack(rts))


# Built renderers, memoized on every static parameter that shapes the
# traced program. A fresh jax.jit wrapper re-traces the full pipeline
# (seconds) even when XLA's compilation cache supplies the binary —
# and video rendering rebuilds renderers across calls all the time
# (bench warm-up then timed pass, resume restarts in one process, the
# fused interactive session, verify tooling). Keyed explicitly so two
# configs that trace the same program share one wrapper; LRU-bounded
# (hits refresh recency) because keys are tiny and real processes
# build a handful of distinct renderers at most.
#
# INVARIANT: memo_key must enumerate EVERY cfg field (and builder
# argument) that render_block's trace reads — a field read inside the
# closure but missing from the key would silently return a renderer
# compiled for a different scene. Current closure reads: image_size,
# step_size, disk_tilt, disk_inner/outer_radius,
# use_ray_differentials, aa_strength, lens_flare, disk_model (+ the
# full V2 surface via v2_params()/v2_structure_params()/v2_palette/
# v2_samples/seed when disk_model == "v2"). Extend the key in the SAME
# change that adds any new cfg read.
_RENDERER_MEMO: dict = {}
_RENDERER_MEMO_MAX = 16

# Device-resident quantized skybox, memoized per scene asset: every
# render_video_sharded call formerly re-read the ~25 MB skybox .npy and
# re-dispatched the quantize program — 0.5-1 s of the per-call startup
# the 48-frame sd_video_fps metric amortizes over so few frames.
# Procedural skyboxes are deterministic in the key; file textures key
# on (path, mtime) so an edited asset is picked up. Two entries cover
# any realistic session (a scene + an A/B).
_SKYBOX_Q_MEMO: dict = {}
_SKYBOX_Q_MEMO_MAX = 2


def _skybox_q_memoized(config: SceneConfig, tex_dtype) -> jnp.ndarray:
    import os as _os

    from ..models.skybox import load_or_generate_skybox

    if config.texture and _os.path.isfile(config.texture):
        src_key = ("file", config.texture,
                   _os.path.getmtime(config.texture))
    else:
        src_key = ("procedural", int(config.n_stars),
                   int(config.skybox_seed))
    key = src_key + (jnp.dtype(tex_dtype).name,)
    hit = _SKYBOX_Q_MEMO.get(key)
    if hit is not None:
        _SKYBOX_Q_MEMO.pop(key)
        _SKYBOX_Q_MEMO[key] = hit  # LRU refresh
        return hit
    skybox, _, _ = load_or_generate_skybox(
        config.texture, 2048, 1024, config.n_stars,
        seed=config.skybox_seed,
    )
    skybox_q = jax.jit(lambda t: quantize_packed(pack_quad(t), tex_dtype))(
        jnp.asarray(skybox, jnp.float32)
    )
    if len(_SKYBOX_Q_MEMO) >= _SKYBOX_Q_MEMO_MAX:
        _SKYBOX_Q_MEMO.pop(next(iter(_SKYBOX_Q_MEMO)))
    _SKYBOX_Q_MEMO[key] = skybox_q
    return skybox_q


def build_sharded_video_renderer(
    mesh: Mesh,
    config: SceneConfig,
    n_r: int,
    n_phi: int,
    *,
    r_escape: float,
    az_freq: float,
    az_shear: float,
    use_pallas: Optional[bool] = None,
    mip_levels: int = 4,
    tex_dtype=None,
    generation_scale: Optional[int] = None,
    use_bloom: bool = True,
    solo_idx: int = -1,
):
    """Compile the sharded per-frame dynamic renderer.

    Returns fn(skybox_q, cam_pack (F,14), t_arr (F,), fil, hs, rt)
    -> (F, H, W, 3) final frames, frames sharded over the mesh's
    "frames" axis (the "tile" axis must be 1 for video — pixel-split
    makes sense for single huge frames, not throughput rendering).

    Serves BOTH disk models: V1 ("texture") inlines the full dynamic
    texture pipeline per frame; V2 ("v2") replaces it with the volume
    integrator (trace + shade_frame_v2 is already a pure function of
    (camera, t), reference video semantics render.py:4437-4476) — the
    entity-param inputs are accepted for signature uniformity and
    ignored (pass (F, 1, 8) zeros). ``use_bloom`` exists for the fused
    interactive session's 'b' toggle; video always renders with bloom.

    ``solo_idx`` (texture model only, >= 0) renders the solo-component
    debug view INSIDE the fused program — the comp field is masked to
    the soloed density/temp pair (models.dynamic_disk.solo_comp, the
    same mask the staged path uses) before stats+compose, so the
    interactive solo keys run at the fused one-dispatch rate instead
    of falling back to the ~5-dispatch staged path (reference solo
    behavior: render.py:3728-3753, 4242-4268). Stats are computed from
    the soloed field, matching the staged display-local semantics.
    """
    width, height = config.image_size
    cfg = config
    is_v2 = cfg.disk_model == "v2"
    if is_v2:
        generation_scale = 1  # no texture pipeline, nothing to scale
    elif generation_scale is None:
        from ..models.dynamic_disk import adaptive_generation_scale

        generation_scale = adaptive_generation_scale(n_r, n_phi)
    elif n_r % generation_scale or n_phi % generation_scale:
        generation_scale = 1
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if tex_dtype is None:
        tex_dtype = production_tex_dtype()
    # V2 statics: frozen param dataclasses are hashable, so they key
    # the memo directly (every field changes the traced constants).
    model_key = (
        ("v2", cfg.v2_params(), cfg.v2_structure_params(),
         cfg.v2_palette, int(cfg.v2_samples), int(cfg.seed))
        if is_v2 else ("texture",)
    )
    memo_key = (
        mesh, width, height, n_r, n_phi,
        float(r_escape), float(az_freq), float(az_shear),
        bool(use_pallas), int(mip_levels), jnp.dtype(tex_dtype).name,
        int(generation_scale),
        float(cfg.step_size), float(cfg.disk_tilt),
        float(cfg.disk_inner_radius), float(cfg.disk_outer_radius),
        bool(cfg.use_ray_differentials), float(cfg.aa_strength),
        bool(cfg.lens_flare), bool(use_bloom), model_key,
        int(solo_idx) if not is_v2 else -1,
    )
    hit = _RENDERER_MEMO.get(memo_key)
    if hit is not None:
        # LRU, not FIFO: refresh recency so a hot renderer can't be
        # evicted while stale ones survive.
        _RENDERER_MEMO.pop(memo_key)
        _RENDERER_MEMO[memo_key] = hit
        return hit
    # Ray-differential AA in video mode, matching the reference's
    # render() honoring anti_alias (render.py:3874). When disabled,
    # only mip level 0 is ever sampled, so skip the pyramid build +
    # quad-pack entirely (~20 ms/frame at FHD texture sizes).
    use_diff = cfg.use_ray_differentials

    if not is_v2:
        # The shared radial/omega helper guarantees entity phases are
        # bit-identical across the sequential and sharded engines.
        from ..models.lifecycle import radial_omega_rows

        _, omega_np = radial_omega_rows(
            n_r, float(cfg.disk_inner_radius), float(cfg.disk_outer_radius)
        )
        omega_rows = jnp.asarray(omega_np)
        from ..utils.io import compute_edge_alpha

        edge = jnp.asarray(compute_edge_alpha(n_r))
    else:
        from ..pipeline import shade_frame_v2

        v2_params = cfg.v2_params()
        v2_structure = cfg.v2_structure_params()

    from ..constants import DISK_COLOR_TEMPERATURE

    def trace_frame(cam):
        """One frame's geodesic trace — shared by both disk models."""
        pos = cam[0:3]
        trace_kwargs = dict(
            h_base=float(cfg.step_size),
            r_escape=float(r_escape),
            tilt_deg=float(cfg.disk_tilt),
            r_inner=float(cfg.disk_inner_radius),
            r_outer=float(cfg.disk_outer_radius),
            with_differentials=use_diff,
            max_crossings=MAX_DISK_CROSSINGS,
            record_hits=True,
        )
        if use_pallas:
            from ..ops.geodesic_pallas import trace_geodesics_pallas

            return trace_geodesics_pallas(
                cam, width=width, height=height, **trace_kwargs
            )
        dirs, ddx, ddy = geodesic.primary_rays_from_arrays(
            pos, cam[3:6], cam[6:9], cam[9:12], cam[12], cam[13],
            width, height,
        )
        return geodesic.trace_geodesics(
            pos, dirs, d_dir_dx0=ddx, d_dir_dy0=ddy, **trace_kwargs
        )

    def finish_frame(bg_rgb, disk_rgb):
        """Lens stack + uint8 quantize — shared by both disk models."""
        shape = (height, width, 3)
        bg_img = bg_rgb.reshape(shape)
        disk_img = disk_rgb.reshape(shape)
        if use_bloom:
            blur = apply_bloom(disk_img, width_ref=width)
            final = jnp.clip(bg_img + disk_img + blur, 0.0, 1.0)
        else:
            final = jnp.clip(bg_img + disk_img, 0.0, 1.0)
        if cfg.lens_flare:
            final = apply_lens_flare(final, disk_img)
        # uint8 on device: quarters the host-fetch bytes (PNG
        # encoding wants uint8 anyway).
        return jnp.round(final * 255.0).astype(jnp.uint8)

    def render_block(skybox_q, cam_pack, t_arr, fil, hs, rt):
        def one_frame_v2(args):
            cam, t, _fil_p, _hs_p, _rt_p = args
            trace = trace_frame(cam)
            bg_rgb, disk_rgb, _ = shade_frame_v2(
                trace, skybox_q, cam[0:3],
                v2_params=v2_params, v2_structure=v2_structure,
                tilt_deg=float(cfg.disk_tilt),
                t_offset=t,
                palette=cfg.v2_palette,
                n_samples=int(cfg.v2_samples),
                seed=int(cfg.seed),
                image_shape=(height, width),
            )
            return finish_frame(bg_rgb, disk_rgb)

        def one_frame(args):
            cam, t, fil_p, hs_p, rt_p = args
            # --- dynamic texture --------------------------------------
            bg = generate_background_components(
                n_r, n_phi, az_freq, az_shear,
                float(cfg.disk_inner_radius), float(cfg.disk_outer_radius), t,
                generation_scale=generation_scale,
            )
            staging = accumulate_entity_layer(
                fil_p, hs_p, rt_p, omega_rows, n_r, n_phi,
                phi_scale=generation_scale,
            )
            comp = assemble_comp(bg, staging)
            if solo_idx >= 0:
                from ..models.dynamic_disk import solo_comp

                comp = solo_comp(comp, solo_idx)
            p98, scale, row_stats = _recompute_stats(comp, edge)
            tex = compose_from_components(
                comp, omega_rows, edge, p98, scale, row_stats,
                0.0, True, jnp.float32(DISK_COLOR_TEMPERATURE),
            )
            if use_diff:
                if (n_r % (1 << mip_levels) == 0
                        and n_phi % (1 << mip_levels) == 0):
                    # Production LOD layout: quad mip atlas (half the
                    # build/quantize traffic of the padded pyramid, one
                    # compact gather table).
                    from ..ops.sampling import build_mip_atlas_quad

                    qmips, num_levels = build_mip_atlas_quad(
                        tex, mip_levels, tex_dtype
                    )
                else:
                    mips = build_mipmaps(tex, levels=mip_levels)
                    num_levels = int(mips.shape[0])
                    qmips = quantize_packed(
                        pack_quad_mips(mips), tex_dtype
                    )
            else:
                num_levels = 1
                qmips = quantize_packed(pack_quad(tex), tex_dtype)[None]

            # --- trace + shade + lens stack ---------------------------
            trace = trace_frame(cam)
            bg_rgb, disk_rgb, _ = shade_frame(
                trace, skybox_q, qmips, num_levels, cam[0:3],
                r_inner=float(cfg.disk_inner_radius),
                r_outer=float(cfg.disk_outer_radius),
                tilt_deg=float(cfg.disk_tilt),
                t_offset=jnp.float32(0.0),
                use_lod=use_diff,
                aa_strength=float(cfg.aa_strength),
                image_shape=(height, width),
            )
            return finish_frame(bg_rgb, disk_rgb)

        return jax.lax.map(one_frame_v2 if is_v2 else one_frame,
                           (cam_pack, t_arr, fil, hs, rt))

    sharded = shard_map(
        render_block,
        mesh=mesh,
        in_specs=(P(), P("frames"), P("frames"), P("frames"), P("frames"),
                  P("frames")),
        out_specs=P("frames"),
        check_vma=False,
    )
    fn = jax.jit(sharded)
    if len(_RENDERER_MEMO) >= _RENDERER_MEMO_MAX:
        _RENDERER_MEMO.pop(next(iter(_RENDERER_MEMO)))
    _RENDERER_MEMO[memo_key] = fn
    return fn


def globalize_host_array(mesh: Mesh, spec, host_array) -> jnp.ndarray:
    """Build a global jax.Array from host data every process holds.

    Multi-controller jit rejects process-local arrays for inputs whose
    sharding spans other hosts; since each process computes the full
    host copy anyway (the lifecycle replay is deterministic), each just
    donates the slices its local devices own.
    """
    from jax.sharding import NamedSharding

    arr = np.asarray(host_array)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda index: arr[index]
    )


def _fetch_addressable_frames(out) -> list:
    """[(position_in_batch, uint8 HWC frame)] for locally-held frames.

    Single-process: every frame. Multi-host: each process can only
    fetch the shards its own devices hold, and those are exactly the
    frames it is responsible for writing.
    """
    if jax.process_count() == 1:
        arr = np.asarray(jax.device_get(out))
        return list(enumerate(arr))
    by_pos = {}
    for shard in out.addressable_shards:
        start = shard.index[0].start or 0
        data = np.asarray(shard.data)
        for k in range(data.shape[0]):
            by_pos.setdefault(start + k, data[k])
    return sorted(by_pos.items())


def render_video_frames_sharded(
    config: SceneConfig,
    mesh: Mesh,
    frame_indices,
    skybox_q: jnp.ndarray,
    dynamic: DynamicDiskSystem,
    all_fil: np.ndarray,
    all_hs: np.ndarray,
    all_rt: np.ndarray,
    renderer_fn=None,
    defer_fetch: bool = False,
) -> Tuple[object, object]:
    """Render one batch of frames (len divisible by the frames axis).

    Returns ([(position_in_batch, uint8 frame)] for the frames this
    process's devices hold — all of them on a single host — and the
    compiled renderer for reuse). With defer_fetch=True the first
    element is instead the still-on-device output array (dispatch is
    async, so the call returns as soon as the program is enqueued):
    the caller fetches via _fetch_addressable_frames when it needs the
    pixels, which lets it dispatch the NEXT batch first and overlap
    this batch's device->host transfer with that batch's compute.
    """
    width, height = config.image_size
    # One camera-placement implementation for every engine: a drift
    # between this and the sequential path would break the cross-engine
    # frame identity the resume protocol depends on.
    cams = cameras_for_orbit(config, frame_indices, width, height)
    cam_np = np.asarray(pack_cameras(cams))
    t_np = np.asarray(
        [f * config.disk_rotation_speed for f in frame_indices], np.float32
    )
    idx = np.asarray(frame_indices)
    if renderer_fn is None:
        r_escape = scene_escape_radius(config)
        if config.disk_model == "v2":
            # V2 has no texture pipeline: dynamic may be None and the
            # entity-param arrays are (F, 1, 8) zeros placeholders.
            renderer_fn = build_sharded_video_renderer(
                mesh, config, 0, 0, r_escape=r_escape,
                az_freq=0.0, az_shear=0.0,
                tex_dtype=production_tex_dtype(),
            )
        else:
            renderer_fn = build_sharded_video_renderer(
                mesh, config, dynamic.n_r, dynamic.n_phi,
                r_escape=r_escape, az_freq=dynamic.az_freq,
                az_shear=dynamic.az_shear,
                tex_dtype=production_tex_dtype(),
            )
    batch_args = (cam_np, t_np, all_fil[idx], all_hs[idx], all_rt[idx])
    if jax.process_count() > 1:
        batch_args = tuple(
            globalize_host_array(mesh, P("frames"), a) for a in batch_args
        )
    else:
        batch_args = tuple(jnp.asarray(a) for a in batch_args)
    out = renderer_fn(skybox_q, *batch_args)
    if defer_fetch:
        return out, renderer_fn
    return _fetch_addressable_frames(out), renderer_fn


def render_video_sharded(config: SceneConfig) -> dict:
    """Full sharded video driver: batches of frames across the mesh with
    the same resume protocol as the sequential path (modes.render_video).
    Returns run stats {frames, wall_s, steady_fps} (steady_fps = the
    sustained post-warmup batch rate, None when fewer than two
    post-warmup batches ran); most callers ignore it, bench.py emits it.

    Batch size = frames_axis * frames_per_device; progress.json is
    updated after each completed batch, so interrupting loses at most
    the two batches in flight (lookahead pipelining keeps one batch
    rendering while the previous one is fetched and written).

    Multi-host (jax.process_count() > 1, via --coordinator_address):
    frames shard over every host's chips with zero cross-host traffic
    during rendering. Each process writes the PNGs its own devices
    rendered; process 0 owns progress.json (written after a per-batch
    barrier, so recorded frames are always on disk) and assembles the
    final video from the shared frame directory — hosts must share the
    output filesystem, the standard pod-slice arrangement.
    """
    import os
    import time

    from ..modes import (
        load_video_progress,
        video_resume_params,
        video_temp_paths,
    )
    from ..utils.io import AsyncPNGWriter, write_json_atomic
    from .mesh import make_frame_mesh

    n_proc = jax.process_count()
    pid = jax.process_index()

    def barrier(name: str) -> None:
        if n_proc > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(name)

    def say(msg: str) -> None:
        if pid == 0:
            print(msg)

    width, height = config.image_size
    devices = jax.devices()
    n_shards = config.frame_shards or len(devices)
    if n_shards > len(devices):
        # Clamp, but never silently: an explicit shard count above the
        # visible device count usually means a mis-set fleet.
        print(f"warning: --frame_shards {n_shards} exceeds the "
              f"{len(devices)} visible devices; using {len(devices)}")
    n_shards = min(n_shards, len(devices))
    if n_proc > 1 and n_shards != len(devices):
        # Every process must participate in the jitted program; a mesh
        # that excludes some host's chips would strand that process.
        raise ValueError(
            f"multi-host video requires frame_shards == all devices "
            f"({len(devices)}), got {n_shards}"
        )
    mesh = make_frame_mesh(n_shards, 1, devices=devices[:n_shards])
    # Frames per device per dispatch: each dispatch pays a fixed
    # host-side latency (enqueue + fetch round trip — relayed-TPU
    # tunnels make it frame-sized at SD), so batch small frames until
    # a dispatch carries ~4 FHD frames' worth of pixels. Capped at 16,
    # floored at the round-2 defaults (FHD/4K behave exactly as
    # before), and bounded by the video length so short videos and
    # tiny test scenes don't compile mostly-padding programs. Derived
    # from config only — multi-host processes must agree on the batch.
    # --frames_per_dispatch pins it (batch-count-sensitive tests, memory
    # tuning); 0 = adaptive.
    if config.frames_per_dispatch:
        frames_per_device = int(config.frames_per_dispatch)
    else:
        frames_per_device = min(
            16, max(2 if n_shards > 1 else 4,
                    (4 * 1920 * 1080) // (width * height)))
        frames_per_device = max(
            1, min(frames_per_device, -(-config.n_frames // n_shards)))
    batch = n_shards * frames_per_device

    output_path = config.output
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    temp_dir, progress_file = video_temp_paths(output_path)
    params = video_resume_params(config, sharded=True)
    if pid == 0:
        completed, _ = load_video_progress(
            config, temp_dir, progress_file, params
        )
    else:
        completed = set()
    if n_proc > 1:
        # Process 0 arbitrates resume-vs-wipe and BROADCASTS the
        # surviving frame set (as a fixed-shape mask) — re-reading the
        # progress file on each host could diverge (NFS staleness,
        # transient EIO), and divergent `pending` sets would
        # desynchronize the per-batch barrier sequence. The broadcast
        # is itself a collective, so it doubles as the arbitration
        # barrier.
        from jax.experimental import multihost_utils

        mask = np.zeros(config.n_frames, bool)
        # Tolerate junk entries (negative, float, out-of-range) the way
        # the single-process pending computation does — by ignoring
        # them; raw indexing would wrap negatives or raise on floats.
        mask[[int(f) for f in completed
              if isinstance(f, (int, float)) and not isinstance(f, bool)
              and float(f).is_integer() and 0 <= f < config.n_frames]] = True
        mask = np.asarray(multihost_utils.broadcast_one_to_all(mask))
        completed = {int(f) for f in np.nonzero(mask)[0]}
        os.makedirs(temp_dir, exist_ok=True)

    tex_dtype = production_tex_dtype()
    skybox_q = _skybox_q_memoized(config, tex_dtype)
    if n_proc > 1:
        skybox_q = globalize_host_array(
            mesh, P(), np.asarray(jax.device_get(skybox_q))
        )

    r_escape = scene_escape_radius(config)
    if config.disk_model == "v2":
        # V2 renders by volume integration — no lifecycle system, no
        # per-frame texture pipeline; every frame is a pure function of
        # (camera, t). Zero-size entity placeholders keep the engine
        # single-path.
        dynamic = None
        all_fil = np.zeros((config.n_frames, 1, 8), np.float32)
        all_hs = np.zeros((config.n_frames, 1, 8), np.float32)
        all_rt = np.zeros((config.n_frames, 1, 8), np.float32)
        renderer_fn = build_sharded_video_renderer(
            mesh, config, 0, 0,
            r_escape=r_escape, az_freq=0.0, az_shear=0.0,
            tex_dtype=tex_dtype,
        )
    else:
        n_phi, n_r = compute_disk_texture_resolution(
            width, height, config.pov, config.fov,
            config.disk_inner_radius, config.disk_outer_radius,
        )
        dynamic = DynamicDiskSystem(
            n_r, n_phi, config.disk_inner_radius, config.disk_outer_radius,
            seed=config.seed,
        )
        say(f"Packing lifecycle params for {config.n_frames} frames...")
        t0 = time.time()
        all_fil, all_hs, all_rt = pack_frame_params(
            dynamic, config.n_frames, config.disk_rotation_speed
        )
        say(f"  packed in {time.time() - t0:.1f}s")

        renderer_fn = build_sharded_video_renderer(
            mesh, config, n_r, n_phi,
            r_escape=r_escape, az_freq=dynamic.az_freq,
            az_shear=dynamic.az_shear,
            tex_dtype=tex_dtype,
        )

    import contextlib

    from ..utils.io import IncrementalH264Assembler

    writer = AsyncPNGWriter(max_workers=4, max_pending=8)
    # Inline H.264: frames leave the device in index order, so each is
    # fed to the native encoder as it lands; on an uninterrupted run
    # the post-pass (a full-video PNG re-decode) never executes.
    # Multi-host: no single process holds every frame in RAM, so the
    # inline encoder is skipped and process 0 runs the post-pass from
    # the shared frame directory instead.
    assembler = (
        IncrementalH264Assembler(
            output_path, config.n_frames, config.fps, temp_dir,
            crf=config.video_crf,
        )
        if n_proc == 1
        else contextlib.nullcontext()
    )
    total_t0 = time.time()
    pending = [f for f in range(config.n_frames) if f not in completed]
    # Pad the final batch by repeating the last frame (discarded on write).
    n_batches = (len(pending) + batch - 1) // batch

    @contextlib.contextmanager
    def _abort_fleet_on_error():
        """Die loudly instead of stranding the fleet.

        A process that raises between barriers (disk full in drain, a
        device error) would leave every other host blocked in
        sync_global_devices forever — the collectives have no deadline.
        Exiting hard lets the coordination service's missed-heartbeat
        detection fail the remaining processes' barriers within its
        timeout, so the whole run dies visibly and is resumable.
        """
        import sys
        import traceback

        try:
            yield
        except BaseException:
            print(f"[process {pid}] fatal error, aborting the fleet:",
                  file=sys.stderr)
            traceback.print_exc()
            sys.stderr.flush()
            os._exit(1)

    # The with-block covers everything through finalize: an exception
    # ANYWHERE in it (batch loop, PNG drain, progress write) discards
    # the partial video via __exit__ — and, multi-host, aborts this
    # process hard (entered first, so it also covers assembler exit).
    with contextlib.ExitStack() as _stack:
        if n_proc > 1:
            _stack.enter_context(_abort_fleet_on_error())
        _stack.enter_context(assembler)

        batch_done_t = [time.time()]  # loop start, then one per batch

        def process(b, chunk, out):
            """Fetch + durably record one dispatched batch."""
            for pos, frame in _fetch_addressable_frames(out):
                if pos >= len(chunk):
                    continue  # padding repeat of the last frame
                f = chunk[pos]
                writer.submit(
                    frame, os.path.join(temp_dir, f"frame_{f:04d}.png")
                )
                if n_proc == 1:
                    assembler.submit(f, frame)
            # A batch completes globally in lockstep (one jitted
            # program), so every chunk frame is recorded regardless of
            # which process rendered it.
            completed.update(chunk)
            # Flush pending PNGs before recording them as completed — a
            # crash between the two would otherwise lose frames
            # permanently under resume (progress says done, no PNG on
            # disk). Multi-host: the barrier extends the guarantee to
            # every process's PNGs (each reaches it only after its own
            # drain).
            writer.drain()
            barrier(f"bhr-video-batch-{b}")
            if pid == 0:
                write_json_atomic(
                    progress_file,
                    {"params": params, "completed": sorted(completed)},
                )
            batch_done_t.append(time.time())
            if (b + 1) % 10 == 0 or b == n_batches - 1:
                done = len(completed)
                # Rate over THIS session's frames only — `completed`
                # also counts frames from previous (resumed) sessions.
                session_done = min((b + 1) * batch, len(pending))
                rate = session_done / max(time.time() - total_t0, 1e-9)
                say(f"batch {b + 1}/{n_batches} "
                    f"done {done}/{config.n_frames} "
                    f"({rate:.2f} frames/s)")

        # One-batch lookahead: dispatch batch b+1 (async — returns as
        # soon as the program is enqueued) BEFORE fetching batch b, so
        # b's device->host transfer + PNG/H.264 encode overlap b+1's
        # compute instead of serializing with it. Progress still
        # records a batch only after its PNGs are on disk, so resume
        # semantics are unchanged; an interrupt now loses at most the
        # in-flight batch plus the one being recorded.
        inflight = None
        for b in range(n_batches):
            chunk = pending[b * batch : (b + 1) * batch]
            idx = chunk + [chunk[-1]] * (batch - len(chunk))
            out, renderer_fn = render_video_frames_sharded(
                config, mesh, idx, skybox_q, dynamic,
                all_fil, all_hs, all_rt, renderer_fn,
                defer_fetch=True,
            )
            if inflight is not None:
                process(*inflight)
            inflight = (b, chunk, out)
        if inflight is not None:
            process(*inflight)
        writer.close()

        say(f"All frames rendered in "
            f"{(time.time() - total_t0) / 60:.1f} min")
        # Steady-state loop rate: frames/s over the post-first batches
        # (the first batch absorbs dispatch warmup). End-to-end
        # throughput divides out startup (skybox load, packing, jit
        # re-trace, H.264 finalize) over however few frames the video
        # has; the steady rate is the engine's sustained speed and is
        # what a long production video converges to. Returned so
        # bench.py can emit BOTH without parsing stdout.
        steady_fps = None
        if len(batch_done_t) > 2:
            span = batch_done_t[-1] - batch_done_t[1]
            steady_fps = ((len(batch_done_t) - 2) * batch) / max(span, 1e-9)
        stats = {
            "frames": len(pending),
            "wall_s": time.time() - total_t0,
            "steady_fps": steady_fps,
        }
        if n_proc == 1:
            if assembler.finalize():
                print(f"Video saved: {output_path}")
                return stats
        if pid == 0:
            from ..modes import _assemble_video

            _assemble_video(temp_dir, output_path, config.n_frames,
                            config.fps, crf=config.video_crf)
    # Hold every process until the video exists, so no one tears down
    # the coordination service while process 0 is still assembling.
    barrier("bhr-video-assembled")
    return stats
