"""Per-frame render pipeline: trace -> deferred shade -> lens stack.

This is the TPU-native replacement for the reference's `TaichiRenderer`
(/root/reference/render.py:2189-4028). Differences by design:

  * The ray-march records hit lists (ops/geodesic.py) and ALL texture
    sampling + relativistic shading + alpha compositing happen in one
    vectorized pass over the K hit slots — no gathers in the hot loop.
  * The whole frame (ray generation, integration, shading, bloom, flare,
    compose) is ONE jitted XLA program per static configuration; the
    `Renderer` class only holds device-resident assets (skybox, disk mip
    pyramid) and swaps dynamic inputs (camera, time offset) per call.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera, build_camera
from .config import SceneConfig, escape_radius
from .constants import DISK_ALPHA_GAIN, DISK_COLOR_TEMPERATURE, MAX_DISK_CROSSINGS
from .ops import geodesic
from .ops.bloom import apply_bloom
from .ops.lens_flare import apply_lens_flare
from .ops.sampling import (
    build_mipmaps,
    pack_mip_atlas_from_pyramid,
    pack_quad,
    pack_quad_mips,
    production_tex_dtype,
    quantize_packed,
    sample_disk_mip_atlas,
    sample_disk_mip_quad,
    sample_disk_quad,
    sample_skybox_quad,
)
from .ops.shading import apply_g_factor, pow_const


def _ghost_window(hit_count: jnp.ndarray, ih: int, iw: int):
    """Position an (ih//2, iw//2) crop window covering every multi-
    crossing (hit_count >= 2) ray, if possible.

    Multi-crossing rays cluster around the photon ring (measured: ~15%
    of the FHD bench frame), and TPU gathers are per-index bound, so
    shading ghost slots over a quarter-size window cuts their texture
    gathers 4x. Returns (r0, c0, covered, wh, ww); when ``covered`` is
    False the caller must use the full-frame pass (exactness is never
    traded for the optimization).
    """
    wh, ww = ih // 2, iw // 2
    ghost = (hit_count >= 2).reshape(ih, iw)
    rows_any = jnp.any(ghost, axis=1)
    cols_any = jnp.any(ghost, axis=0)
    first_row = jnp.argmax(rows_any)
    last_row = ih - 1 - jnp.argmax(rows_any[::-1])
    first_col = jnp.argmax(cols_any)
    last_col = iw - 1 - jnp.argmax(cols_any[::-1])
    r0 = jnp.clip(first_row, 0, ih - wh).astype(jnp.int32)
    c0 = jnp.clip(first_col, 0, iw - ww).astype(jnp.int32)
    covered = (last_row < r0 + wh) & (last_col < c0 + ww)
    return r0, c0, covered, wh, ww


def _shade_slot_in_window(
    shade_core, hits_k, hit_count, k, accum, alpha_total,
    ih, iw, r0, c0, wh, ww,
):
    """Run one hit-slot shading pass on the crop window only.

    Crops the slot features + carried accum/alpha with dynamic_slice,
    applies ``shade_core`` (which must leave pixels with no valid hit
    untouched), and pastes the results back. Outside the window the
    slot has no valid hits by construction, so this is exact.
    """
    n = hits_k.shape[1]
    n_feat = hits_k.shape[0]
    feat_w = jax.lax.dynamic_slice(
        hits_k.reshape(n_feat, ih, iw), (jnp.int32(0), r0, c0),
        (n_feat, wh, ww),
    ).reshape(n_feat, wh * ww)
    hc_w = jax.lax.dynamic_slice(
        hit_count.reshape(ih, iw), (r0, c0), (wh, ww)
    ).reshape(wh * ww)
    accum_hw = accum.reshape(ih, iw, 3)
    alpha_hw = alpha_total.reshape(ih, iw)
    acc_w = jax.lax.dynamic_slice(
        accum_hw, (r0, c0, jnp.int32(0)), (wh, ww, 3)
    ).reshape(wh * ww, 3)
    al_w = jax.lax.dynamic_slice(
        alpha_hw, (r0, c0), (wh, ww)
    ).reshape(wh * ww)
    acc_w, al_w = shade_core(feat_w, hc_w, k, acc_w, al_w)
    accum_hw = jax.lax.dynamic_update_slice(
        accum_hw, acc_w.reshape(wh, ww, 3), (r0, c0, jnp.int32(0))
    )
    alpha_hw = jax.lax.dynamic_update_slice(
        alpha_hw, al_w.reshape(wh, ww), (r0, c0)
    )
    return accum_hw.reshape(n, 3), alpha_hw.reshape(n)


def _valid_window_shape(image_shape, k_slots: int, n: int) -> bool:
    return (
        image_shape is not None
        and k_slots > 1
        and int(image_shape[0]) * int(image_shape[1]) == n
        and int(image_shape[0]) >= 2
        and int(image_shape[1]) >= 2
    )


def _shade_ghost_slots(
    shade_core, trace, k_slots, max_hits, accum, alpha_total, image_shape
):
    """Shade hit slots 1..K-1 (the ghost-image crossings).

    Shared by the V1 texture and V2 volume shaders. Slots no ray
    reached are skipped via lax.cond; when ``image_shape`` is valid and
    the h/2 x w/2 crop window covers every multi-crossing ray, each
    populated slot shades over the window only (4x fewer gather/
    integration lanes) — falling back to the exact full-frame pass via
    the ``covered`` cond otherwise. ``shade_core(feat, hit_count, k,
    accum, alpha) -> (accum, alpha)`` must leave lanes with no valid
    hit untouched.
    """
    n = trace.hits.shape[2]
    use_window = _valid_window_shape(image_shape, k_slots, n)
    if use_window:
        ih, iw = int(image_shape[0]), int(image_shape[1])
        r0, c0, covered, wh, ww = _ghost_window(trace.hit_count, ih, iw)

    def shade_full(k, acc, al):
        return shade_core(trace.hits[k], trace.hit_count, k, acc, al)

    for k in range(1, k_slots):
        if use_window:
            def populated(acc, al, k=k):
                return jax.lax.cond(
                    covered,
                    lambda a, b, k=k: _shade_slot_in_window(
                        shade_core, trace.hits[k], trace.hit_count, k,
                        a, b, ih, iw, r0, c0, wh, ww,
                    ),
                    lambda a, b, k=k: shade_full(k, a, b),
                    acc, al,
                )
        else:
            def populated(acc, al, k=k):
                return shade_full(k, acc, al)
        accum, alpha_total = jax.lax.cond(
            k < max_hits,
            populated,
            lambda acc, al: (acc, al),
            accum, alpha_total,
        )
    return accum, alpha_total


def shade_frame(
    trace: geodesic.TraceResult,
    skybox_q: jnp.ndarray,
    disk_qmips: Optional[jnp.ndarray],
    num_mip_levels: int,
    cam_pos: jnp.ndarray,
    *,
    r_inner: float,
    r_outer: float,
    tilt_deg: float,
    t_offset,
    use_lod: bool,
    aa_strength: float,
    color_temp: float = DISK_COLOR_TEMPERATURE,
    image_shape: Optional[Tuple[int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deferred shading over recorded hits.

    Textures arrive quad-packed (ops.sampling.pack_quad / pack_quad_mips)
    so each bilinear sample costs ONE gather. Slot 0 shades
    unconditionally (populated in essentially every disk frame, and
    straight-line code lets XLA fuse the pass); slots >= 1 — the
    ghost-image crossings — are skipped via lax.cond when no ray
    reached them, and when ``image_shape`` (h, w) is given they shade
    over a dynamically positioned h/2 x w/2 crop window instead of the
    full frame: multi-crossing rays cluster around the photon ring
    (measured: hc>=2 rays occupy ~15% of the FHD bench frame), and TPU
    gathers are per-index bound, so cropping cuts the ghost-slot
    texture gather 4x. Falls back to the full-frame pass whenever the
    window cannot cover every hc>=2 ray, so results are exact always.

    Returns (bg_rgb, disk_rgb, alpha_total), each (N, ...) flattened over
    pixels. Front-to-back alpha compositing over the K hit slots
    reproduces the reference's in-loop accumulation
    (render.py:2992-3018). ``t_offset`` may be a traced scalar.
    """
    k_slots = trace.hits.shape[0]
    n = trace.hits.shape[2]
    tilt_rad = float(np.deg2rad(tilt_deg))
    tan_t = float(np.tan(tilt_rad))

    accum = jnp.zeros((n, 3), trace.hits.dtype)
    alpha_total = jnp.zeros((n,), trace.hits.dtype)

    if disk_qmips is not None:
        # Texture layout: 3-D (H + H//2, W, C') = quad-packed
        # bottom-packed mip ATLAS (ops.sampling.build_mip_atlas_quad,
        # the production LOD layout — level 0 dense in the first H
        # rows); 4-D (L, H, W, C') = padded quad pyramid (legacy /
        # arbitrary-size fallback). Level 0 geometry for the LOD
        # gradient scale is identical either way.
        is_atlas = disk_qmips.ndim == 3
        if is_atlas:
            dtex_h = disk_qmips.shape[0] * 2 // 3
            dtex_w = disk_qmips.shape[1]
        else:
            dtex_h, dtex_w = disk_qmips.shape[1], disk_qmips.shape[2]
        max_hits = jnp.max(trace.hit_count)

        def shade_slot_core(feat, hit_count, k, accum, alpha_total):
            valid = k < hit_count
            hit_x, hit_y = feat[0], feat[1]
            ray_dir = feat[2:5].T
            if use_lod:
                # Texture-space gradients from the transported ray
                # differentials -> mip LOD (reference render.py:2961-2990).
                dpx = feat[5:8]
                dpy = feat[8:11]
                r_cyl = jnp.sqrt(hit_x**2 + hit_y**2 + 1e-6)
                dr_dx = (hit_x * dpx[0] + hit_y * dpx[1]) / r_cyl
                dphi_dx = (-hit_y * dpx[0] + hit_x * dpx[1]) / (r_cyl**2 + 1e-6)
                dr_dy = (hit_x * dpy[0] + hit_y * dpy[1]) / r_cyl
                dphi_dy = (-hit_y * dpy[0] + hit_x * dpy[1]) / (r_cyl**2 + 1e-6)
                dudx = dphi_dx * dtex_w / (2.0 * jnp.pi)
                dvdx = dr_dx * dtex_h / (r_outer - r_inner)
                dudy = dphi_dy * dtex_w / (2.0 * jnp.pi)
                dvdy = dr_dy * dtex_h / (r_outer - r_inner)
                grad_sq = jnp.maximum(dudx**2 + dvdx**2, dudy**2 + dvdy**2)
                lod = jnp.clip(
                    jnp.log2(jnp.maximum(grad_sq, 1.0)) * aa_strength, 0.0, 3.0
                )
                sampler = (sample_disk_mip_atlas if is_atlas
                           else sample_disk_mip_quad)
                rgba = sampler(
                    disk_qmips, num_mip_levels, hit_x, hit_y,
                    r_inner, r_outer, t_offset, lod,
                )
            else:
                level0 = (disk_qmips[:dtex_h] if is_atlas
                          else disk_qmips[0])
                rgba = sample_disk_quad(
                    level0, hit_x, hit_y, r_inner, r_outer, t_offset
                )
            rgba = rgba.astype(jnp.float32)

            hit_r = jnp.sqrt(hit_x**2 + hit_y**2)
            hit_z = hit_y * tan_t
            hit_pos = jnp.stack([hit_x, hit_y, hit_z], axis=-1)
            shaded = apply_g_factor(
                rgba[:, :3], hit_pos, hit_r, -ray_dir, cam_pos,
                r_inner, r_outer, tilt_rad, color_temp,
            )
            base_alpha = jnp.minimum(rgba[:, 3], 0.999)
            disk_alpha = 1.0 - pow_const(1.0 - base_alpha, DISK_ALPHA_GAIN)
            disk_alpha = jnp.where(valid, disk_alpha, 0.0)

            front = 1.0 - alpha_total
            accum = accum + shaded * (disk_alpha * front)[:, None]
            alpha_total = 1.0 - front * (1.0 - disk_alpha)
            return accum, alpha_total

        def shade_slot(k, accum, alpha_total):
            return shade_slot_core(
                trace.hits[k], trace.hit_count, k, accum, alpha_total
            )

        # Slot 0 is populated in essentially every disk frame; shading
        # it unconditionally lets XLA fuse the pass (a lax.cond
        # materializes its carried accum/alpha operands either way).
        accum, alpha_total = shade_slot(0, accum, alpha_total)
        accum, alpha_total = _shade_ghost_slots(
            shade_slot_core, trace, k_slots, max_hits, accum, alpha_total,
            image_shape,
        )

    bg = jnp.where(
        trace.escaped[:, None],
        sample_skybox_quad(skybox_q, trace.escape_dir).astype(jnp.float32),
        0.0,
    )
    bg = bg * (1.0 - alpha_total)[:, None]
    disk_rgb = jnp.clip(accum, 0.0, 1.0)
    return bg, disk_rgb, alpha_total


def shade_frame_v2(
    trace: geodesic.TraceResult,
    skybox_q: jnp.ndarray,
    cam_pos: jnp.ndarray,
    *,
    v2_params,
    v2_structure,
    tilt_deg: float,
    t_offset,
    palette: str = "cinematic",
    n_samples: int = 8,
    seed: int = 42,
    color_temp: float = DISK_COLOR_TEMPERATURE,
    image_shape: Optional[Tuple[int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Disk V2 deferred shading: emission-absorption slab integration.

    Replaces the texture lookup of shade_frame with the disk_v2 volume
    model (models/disk_v2/integrator.py): at each recorded midplane
    crossing, integrate j * exp(-tau) through the finite-thickness slab
    along the ray, map (intensity, temperature) through the palette, and
    apply the same relativistic g-factor shading and front-to-back
    compositing as the V1 path. Ghost slots (>= 1) use the same crop
    window as shade_frame when ``image_shape`` is given — the win is
    larger here because each slot runs an n_samples-point volume
    integration per ray, not just a texture gather.
    """
    from .models.disk_v2.integrator import integrate_emission
    from .models.disk_v2.palette import apply_palette

    k_slots = trace.hits.shape[0]
    n = trace.hits.shape[2]
    tilt_rad = float(np.deg2rad(tilt_deg))
    tan_t = float(np.tan(tilt_rad))
    cos_t, sin_t = float(np.cos(tilt_rad)), float(np.sin(tilt_rad))

    accum = jnp.zeros((n, 3), trace.hits.dtype)
    alpha_total = jnp.zeros((n,), trace.hits.dtype)
    max_hits = jnp.max(trace.hit_count)

    def to_disk_frame(v):
        """Rotate world -> disk frame (tilt about x-axis undone)."""
        x, y, z = v[:, 0], v[:, 1], v[:, 2]
        return jnp.stack(
            [x, y * cos_t + z * sin_t, -y * sin_t + z * cos_t], axis=-1
        )

    def shade_slot_core(feat, hit_count, k, accum, alpha_total):
        valid = k < hit_count
        hit_x, hit_y = feat[0], feat[1]
        hit_z = hit_y * tan_t
        hit_pos_w = jnp.stack([hit_x, hit_y, hit_z], axis=-1)
        ray_dir_w = feat[2:5].T

        hit_pos_d = to_disk_frame(hit_pos_w)
        ray_dir_d = to_disk_frame(ray_dir_w)

        intensity, temp_mean, alpha = integrate_emission(
            hit_pos_d, ray_dir_d, v2_params, v2_structure,
            n_samples=n_samples, seed=seed, t=t_offset,
        )
        t_peak = float(v2_params.temp_scale)
        color = apply_palette(
            intensity * 4.0, temp_mean / max(t_peak * 0.45, 1e-6), palette
        )

        hit_r = jnp.sqrt(hit_x**2 + hit_y**2)
        shaded = apply_g_factor(
            color, hit_pos_w, hit_r, -ray_dir_w, cam_pos,
            float(v2_params.r_in), float(v2_params.r_out), tilt_rad,
            color_temp,
        )
        alpha = jnp.where(valid, jnp.clip(alpha, 0.0, 0.999), 0.0)
        front = 1.0 - alpha_total
        accum = accum + shaded * (alpha * front)[:, None]
        alpha_total = 1.0 - front * (1.0 - alpha)
        return accum, alpha_total

    def shade_slot(k, accum, alpha_total):
        return shade_slot_core(
            trace.hits[k], trace.hit_count, k, accum, alpha_total
        )

    accum, alpha_total = jax.lax.cond(
        0 < max_hits,
        lambda acc, al: shade_slot(0, acc, al),
        lambda acc, al: (acc, al),
        accum, alpha_total,
    )
    accum, alpha_total = _shade_ghost_slots(
        shade_slot_core, trace, k_slots, max_hits, accum, alpha_total,
        image_shape,
    )

    bg = jnp.where(
        trace.escaped[:, None],
        sample_skybox_quad(skybox_q, trace.escape_dir).astype(jnp.float32),
        0.0,
    )
    bg = bg * (1.0 - alpha_total)[:, None]
    return bg, jnp.clip(accum, 0.0, 1.0), alpha_total


class Renderer:
    """Holds device assets + static config; renders frames via one jitted
    whole-frame XLA program per static mode.

    Usage:
        renderer = Renderer(config, skybox, disk_tex)
        img = renderer.render(cam_pos, fov)          # (H, W, 3) numpy
        renderer.update_disk_texture(new_tex)        # dynamic textures
    """

    def __init__(
        self,
        config: SceneConfig,
        skybox: np.ndarray,
        disk_tex: Optional[np.ndarray],
        mip_levels: int = 4,
        use_pallas: Optional[bool] = None,
        r_escape_quantum: float = 0.0,
        r_escape_override: Optional[float] = None,
    ):
        self.config = config
        # r_escape is a static arg of the trace program, so every new
        # value compiles a new kernel. Interactive zoom changes the
        # camera distance every keypress; a nonzero quantum rounds
        # r_escape UP to that grid, bounding recompiles (rays merely
        # escape a little later — exactness is per-config, unchanged
        # within a quantum bucket). 0.0 keeps the exact value
        # (production/golden paths). r_escape_override pins the value
        # outright: orbit video passes scene_escape_radius(config) so
        # per-frame float rounding can't produce several ulp-distinct
        # values (= several full recompiles) over one video.
        self.r_escape_quantum = float(r_escape_quantum)
        self.r_escape_override = (
            None if r_escape_override is None else float(r_escape_override)
        )
        self.width, self.height = config.image_size
        self.skybox = jnp.asarray(skybox, dtype=jnp.float32)
        # Textures are stored quad-packed in the production storage
        # dtype (ops.sampling.production_tex_dtype): gamma-2 uint8
        # bitcast to uint32 words on TPU (fastest row gathers, error
        # below the 8-bit PNG output quantization), f32 elsewhere —
        # the same policy as the sharded video engine, so cross-engine
        # frames agree to within texture quantization.
        self.tex_dtype = production_tex_dtype()
        self.skybox_q = jax.jit(
            lambda t: quantize_packed(pack_quad(t), self.tex_dtype)
        )(self.skybox)
        self.mip_levels = mip_levels
        self.num_mip_levels = 1
        self.disk_mips: Optional[jnp.ndarray] = None
        self.disk_qmips: Optional[jnp.ndarray] = None
        # Production tracer: Pallas per-tile-early-exit kernel on TPU;
        # the pure-JAX lock-step loop elsewhere (CPU tests, debugging).
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        self._frame_fns: Dict[tuple, callable] = {}

        def _mip_and_pack(tex):
            # f32 padded pyramid kept for the disk_texture property /
            # oracle paths; the quad mip ATLAS is packed FROM it (no
            # second downsample chain) when sizes divide 2^levels —
            # generated textures always do (multiples of 16). The atlas
            # serves BOTH render modes (the non-LOD sampler slices its
            # level-0 columns), so no third single-level quantize runs
            # per texture update. Arbitrary external-texture sizes fall
            # back to the padded quad pyramid + its level-0 slice.
            mips = build_mipmaps(tex, levels=mip_levels)
            h, w = int(tex.shape[0]), int(tex.shape[1])
            if (mip_levels > 0 and h % (1 << mip_levels) == 0
                    and w % (1 << mip_levels) == 0):
                qmips = pack_mip_atlas_from_pyramid(mips, self.tex_dtype)
                q_l0 = None  # atlas serves non-LOD renders too
            else:
                qmips = quantize_packed(
                    pack_quad_mips(mips), self.tex_dtype
                )
                q_l0 = qmips[0:1]
            return mips, qmips, q_l0

        self._mip_fn = jax.jit(_mip_and_pack)
        self.disk_q_l0: Optional[jnp.ndarray] = None
        if disk_tex is not None:
            self.update_disk_texture(disk_tex)

    # -- disk texture management ------------------------------------------

    def update_disk_texture(self, tex) -> None:
        """Upload a new (n_r, n_phi, 4) texture and rebuild the mip pyramid."""
        tex = jnp.asarray(tex, dtype=jnp.float32)
        self.disk_mips, self.disk_qmips, self.disk_q_l0 = self._mip_fn(tex)
        self.num_mip_levels = int(self.disk_mips.shape[0])

    @property
    def disk_texture(self) -> Optional[jnp.ndarray]:
        return None if self.disk_mips is None else self.disk_mips[0]

    # -- rendering ---------------------------------------------------------

    # The frame runs as THREE separately jitted stages (trace / shade /
    # post) rather than one fused program: a single whole-frame jit both
    # compiled pathologically slowly (>5 min at FHD) and ran ~4x slower
    # than the staged pipeline (XLA scheduling around the pallas_call),
    # while the staged stages compile in seconds and pipeline cleanly.

    def _shade_fn(self, use_diff: bool):
        key = ("shade", use_diff, self.num_mip_levels,
               self.config.disk_model, self.disk_qmips is not None)
        fn = self._frame_fns.get(key)
        if fn is None:
            cfg = self.config
            if cfg.disk_model == "v2":
                # Full V2 surface from the config: body params, optional
                # structure modulation, palette, quadrature samples.
                v2_params = cfg.v2_params()
                v2_structure = cfg.v2_structure_params()

                def shade_v2(trace, skybox_q, disk_qmips, cam_pos, t_offset):
                    return shade_frame_v2(
                        trace, skybox_q, cam_pos,
                        v2_params=v2_params, v2_structure=v2_structure,
                        tilt_deg=float(cfg.disk_tilt),
                        t_offset=t_offset,
                        palette=cfg.v2_palette,
                        n_samples=int(cfg.v2_samples),
                        seed=int(cfg.seed),
                        image_shape=(self.height, self.width),
                    )

                fn = jax.jit(shade_v2)
                self._frame_fns[key] = fn
                return fn

            def shade(trace, skybox_q, disk_qmips, cam_pos, t_offset):
                return shade_frame(
                    trace, skybox_q, disk_qmips, self.num_mip_levels, cam_pos,
                    r_inner=float(cfg.disk_inner_radius),
                    r_outer=float(cfg.disk_outer_radius),
                    tilt_deg=float(cfg.disk_tilt),
                    t_offset=t_offset,
                    use_lod=use_diff,
                    aa_strength=float(cfg.aa_strength),
                    image_shape=(self.height, self.width),
                )

            def shade_nodisk(trace, skybox_q, disk_qmips, cam_pos, t_offset):
                return shade_frame(
                    trace, skybox_q, None, 1, cam_pos,
                    r_inner=float(cfg.disk_inner_radius),
                    r_outer=float(cfg.disk_outer_radius),
                    tilt_deg=float(cfg.disk_tilt),
                    t_offset=t_offset,
                    use_lod=use_diff,
                    aa_strength=float(cfg.aa_strength),
                )

            fn = jax.jit(shade if self.disk_qmips is not None else shade_nodisk)
            self._frame_fns[key] = fn
        return fn

    def _post_fn(self, use_bloom: bool, use_flare: bool):
        key = ("post", use_bloom, use_flare)
        fn = self._frame_fns.get(key)
        if fn is None:
            width, height = self.width, self.height

            def post(bg, disk_rgb):
                shape = (height, width, 3)
                bg_img = bg.reshape(shape)
                disk_img = disk_rgb.reshape(shape)
                if use_bloom:
                    # The reference's PNG path composites the raw blur
                    # field (render.py:3916-3918); see ops/bloom.py.
                    blur = apply_bloom(disk_img, width_ref=width)
                    final = jnp.clip(bg_img + disk_img + blur, 0.0, 1.0)
                else:
                    final = jnp.clip(bg_img + disk_img, 0.0, 1.0)
                if use_flare:
                    final = apply_lens_flare(final, disk_img)
                return final, bg_img, disk_img

            fn = jax.jit(post)
            self._frame_fns[key] = fn
        return fn

    def _trace(self, camera: Camera, r_escape: float, use_diff: bool):
        has_disk = (
            self.disk_qmips is not None or self.config.disk_model == "v2"
        )
        trace_kwargs = dict(
            h_base=float(self.config.step_size),
            r_escape=float(r_escape),
            tilt_deg=float(self.config.disk_tilt),
            r_inner=float(self.config.disk_inner_radius),
            r_outer=float(self.config.disk_outer_radius),
            with_differentials=use_diff,
            max_crossings=MAX_DISK_CROSSINGS,
            record_hits=has_disk,
        )
        if self.use_pallas:
            from .ops.geodesic_pallas import camera_params, trace_geodesics_pallas

            return trace_geodesics_pallas(
                jnp.asarray(camera_params(camera)),
                width=self.width, height=self.height, **trace_kwargs,
            )
        dirs, ddx, ddy = geodesic.primary_rays(camera)
        return geodesic.trace_geodesics(
            jnp.asarray(camera.pos), dirs, d_dir_dx0=ddx, d_dir_dy0=ddy,
            **trace_kwargs,
        )

    def _run_frame(self, cam_pos, fov, frame, skip_differentials, skip_bloom,
                   use_flare, force_differentials=False):
        camera = build_camera(cam_pos, fov, self.width, self.height)
        if self.r_escape_override is not None:
            r_escape = self.r_escape_override
        else:
            r_escape = escape_radius(self.config.r_max, cam_pos)
            if self.r_escape_quantum > 0.0:
                q = self.r_escape_quantum
                r_escape = float(np.ceil(r_escape / q) * q)
        # force_differentials: the interactive 'd' toggle enables the
        # differential+mip-LOD path even when the session launched with
        # anti_alias=disabled (the reference toggles a runtime kernel
        # flag, render.py:4242); inert for V2, which has no LOD path.
        use_diff = (
            self.config.use_ray_differentials
            or (force_differentials and self.config.disk_model != "v2")
        ) and not skip_differentials
        trace = self._trace(camera, r_escape, use_diff)
        t_offset = jnp.float32(frame * self.config.disk_rotation_speed)
        # LOD renders sample the mip atlas; non-LOD renders its level-0
        # columns (or the separate level-0 pack on the pyramid
        # fallback).
        mips = (self.disk_qmips if (use_diff or self.disk_q_l0 is None)
                else self.disk_q_l0)
        if mips is None:  # placeholder so the arg structure is stable
            mips = jnp.zeros((1, 1, 1, 16), jnp.float32)
        bg, disk_rgb, _ = self._shade_fn(use_diff)(
            trace, self.skybox_q, mips, jnp.asarray(camera.pos), t_offset
        )
        return self._post_fn(not skip_bloom, use_flare)(bg, disk_rgb)

    def render_layers(
        self,
        cam_pos,
        fov: float,
        frame: int = 0,
        skip_differentials: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Render background + disk layers, each (H, W, 3) on device."""
        _, bg, disk = self._run_frame(
            cam_pos, fov, frame, skip_differentials, True, False
        )
        return bg, disk

    def render_device(
        self,
        cam_pos,
        fov: float,
        frame: int = 0,
        skip_differentials: bool = False,
        skip_bloom: bool = False,
        lens_flare: Optional[bool] = None,
        force_differentials: bool = False,
    ) -> jnp.ndarray:
        """Render a full frame, returned on device (H, W, 3)."""
        use_flare = (
            self.config.lens_flare if lens_flare is None else lens_flare
        )
        final, _, _ = self._run_frame(
            cam_pos, fov, frame, skip_differentials, skip_bloom, use_flare,
            force_differentials,
        )
        return final

    def render(
        self,
        cam_pos,
        fov: float,
        frame: int = 0,
        skip_differentials: bool = False,
        skip_bloom: bool = False,
        lens_flare: Optional[bool] = None,
        force_differentials: bool = False,
    ) -> np.ndarray:
        """Render a full frame -> (H, W, 3) float32 numpy in [0, 1]."""
        return np.asarray(
            jax.device_get(
                self.render_device(
                    cam_pos, fov, frame, skip_differentials, skip_bloom,
                    lens_flare, force_differentials,
                )
            )
        )
