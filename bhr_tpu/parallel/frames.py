"""Mesh-sharded multi-frame rendering via shard_map.

Frames shard over the "frames" mesh axis (data parallel over ICI); pixel
rows of each frame shard over the "tile" axis (spatial parallelism for
single large frames). Scene state per frame is deterministic given the
frame index, so the render path needs no collectives — results land
already sharded as (F, H, W, 3).

This is the TPU-native replacement for the reference's sequential orbit
loop (/root/reference/render.py:4437-4476).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..camera import build_camera
from ..config import SceneConfig
from ..constants import MAX_DISK_CROSSINGS
from ..ops import geodesic
from ..pipeline import shade_frame

CAM_PACK_DIM = 14  # pos(3) right(3) up(3) fwd(3) pw ph


def pack_cameras(cameras) -> np.ndarray:
    """Pack a list of Camera objects into an (F, 14) float32 array."""
    rows = []
    for cam in cameras:
        rows.append(
            np.concatenate(
                [
                    cam.pos,
                    cam.right,
                    cam.up,
                    cam.forward,
                    [cam.pixel_width, cam.pixel_height],
                ]
            ).astype(np.float32)
        )
    return np.stack(rows, axis=0)


def cameras_for_orbit(
    config: SceneConfig, frame_indices, width: int, height: int
):
    """Build per-frame orbit cameras for the given frame indices."""
    from ..camera import orbit_camera_position

    cams = []
    for f in frame_indices:
        if config.orbit:
            pos = orbit_camera_position(
                int(f), config.n_frames, config.orbit_degrees, config.pov
            )
        else:
            pos = config.pov
        cams.append(build_camera(pos, config.fov, width, height))
    return cams


def build_sharded_frame_renderer(
    mesh: Mesh,
    config: SceneConfig,
    width: int,
    height: int,
    frames_per_device: int,
    *,
    r_escape: float,
    has_disk: bool = True,
    use_diff: bool = False,
    use_pallas: bool = False,
    return_layers: bool = False,
    atlas_num_levels: Optional[int] = None,
):
    """Compile a sharded renderer: (skybox_q, disk_qmips, cam_pack,
    t_offsets) -> (F, H, W, 3) background+disk composite, sharded over
    the mesh. Textures must be quad-packed (ops.sampling.pack_quad /
    pack_quad_mips).

    F = frames_per_device * mesh.shape["frames"]; H splits over "tile".
    ``use_pallas`` traces each shard's row band with the production
    Pallas kernel (row_start plumbed through its SMEM scalar) instead
    of the pure-JAX lock-step loop. ``return_layers`` returns
    (F, 2, H, W, 3) stacked (bg, disk) layers instead of the clipped
    composite — for callers that still need the global lens stack
    (bloom is a frame-wide convolution, so it runs AFTER the shard_map,
    where XLA inserts the resharding collective automatically).
    """
    n_tile = mesh.shape["tile"]
    if height % n_tile != 0:
        raise ValueError(f"height {height} not divisible by tile axis {n_tile}")
    rows_local = height // n_tile
    cfg = config
    is_v2 = cfg.disk_model == "v2"
    if is_v2:
        # V2 shades by volume integration (pipeline.shade_frame_v2):
        # the disk_mips input is an ignored placeholder, and the hit
        # records drive the slab integrator instead of texture gathers.
        from ..pipeline import shade_frame_v2

        v2_params = cfg.v2_params()
        v2_structure = cfg.v2_structure_params()

    def render_block(skybox, disk_mips, cam_pack, t_offsets):
        # Shapes inside shard_map: cam_pack (frames_per_device, 14),
        # t_offsets (frames_per_device,); skybox/mips replicated.
        tile_idx = jax.lax.axis_index("tile")
        row_start = tile_idx * rows_local

        def one_frame(args):
            cam, t_off = args
            pos, right, up, fwd = cam[0:3], cam[3:6], cam[6:9], cam[9:12]
            pw, ph = cam[12], cam[13]
            trace_kwargs = dict(
                h_base=float(cfg.step_size),
                r_escape=float(r_escape),
                tilt_deg=float(cfg.disk_tilt),
                r_inner=float(cfg.disk_inner_radius),
                r_outer=float(cfg.disk_outer_radius),
                with_differentials=use_diff,
                max_crossings=MAX_DISK_CROSSINGS,
                record_hits=has_disk,
            )
            if use_pallas:
                from ..ops.geodesic_pallas import trace_geodesics_pallas

                trace = trace_geodesics_pallas(
                    cam, row_start, width=width, height=height,
                    row_count=rows_local, **trace_kwargs,
                )
            else:
                dirs, ddx, ddy = geodesic.primary_rays_from_arrays(
                    pos, right, up, fwd, pw, ph, width, height,
                    row_start=row_start, row_count=rows_local,
                )
                trace = geodesic.trace_geodesics(
                    pos, dirs, d_dir_dx0=ddx, d_dir_dy0=ddy, **trace_kwargs,
                )
            if is_v2:
                bg, disk_rgb, _ = shade_frame_v2(
                    trace, skybox, pos,
                    v2_params=v2_params, v2_structure=v2_structure,
                    tilt_deg=float(cfg.disk_tilt),
                    t_offset=t_off,
                    palette=cfg.v2_palette,
                    n_samples=int(cfg.v2_samples),
                    seed=int(cfg.seed),
                    image_shape=(rows_local, width),
                )
                if return_layers:
                    return jnp.stack(
                        [bg.reshape(rows_local, width, 3),
                         disk_rgb.reshape(rows_local, width, 3)], axis=0
                    )
                img = jnp.clip(bg + disk_rgb, 0.0, 1.0)
                return img.reshape(rows_local, width, 3)
            if has_disk and disk_mips.ndim == 3:
                # Bottom-packed quad mip atlas (H + H//2, W, C): the
                # level count travels with the atlas (the builder
                # returned it) — a re-derivation here could silently
                # disagree with the builder's `levels` and mis-address
                # the atlas level regions.
                if atlas_num_levels is None:
                    raise ValueError(
                        "disk_mips is a mip atlas; pass atlas_num_levels"
                        " (returned by build_mip_atlas_quad)"
                    )
                num_levels = int(atlas_num_levels)
            else:
                num_levels = int(disk_mips.shape[0]) if has_disk else 1
            bg, disk_rgb, _ = shade_frame(
                trace,
                skybox,
                disk_mips if has_disk else None,
                num_levels,
                pos,
                r_inner=float(cfg.disk_inner_radius),
                r_outer=float(cfg.disk_outer_radius),
                tilt_deg=float(cfg.disk_tilt),
                t_offset=t_off,
                use_lod=use_diff,
                aa_strength=float(cfg.aa_strength),
                image_shape=(rows_local, width),
            )
            if return_layers:
                return jnp.stack(
                    [bg.reshape(rows_local, width, 3),
                     disk_rgb.reshape(rows_local, width, 3)], axis=0
                )
            img = jnp.clip(bg + disk_rgb, 0.0, 1.0)
            return img.reshape(rows_local, width, 3)

        return jax.lax.map(one_frame, (cam_pack, t_offsets))

    sharded = shard_map(
        render_block,
        mesh=mesh,
        in_specs=(P(), P(), P("frames"), P("frames")),
        # Layer output is (F, layer, H, W, 3): rows move to dim 2.
        out_specs=(P("frames", None, "tile") if return_layers
                   else P("frames", "tile")),
        check_vma=False,
    )
    jitted = jax.jit(sharded)
    expect_f = frames_per_device * int(mesh.shape["frames"])

    def render(skybox, disk_mips, cam_pack, t_offsets):
        if disk_mips is None:
            if has_disk:
                raise ValueError(
                    "disk_mips is required when the renderer was built "
                    "with has_disk=True"
                )
            # Background-only render: substitute an (unused, DCEd) dummy
            # so the shard_map arg structure stays array-shaped.
            disk_mips = jnp.zeros((1, 1, 1, 4), jnp.float32)
        # The declared frames_per_device fixes the total frame count;
        # a mismatched cam_pack would otherwise silently reshard to a
        # different per-device batch than the caller planned for.
        if cam_pack.shape[0] != expect_f:
            raise ValueError(
                f"cam_pack has {cam_pack.shape[0]} frames, expected "
                f"{expect_f} (= frames_per_device {frames_per_device} x "
                f"mesh frames axis {int(mesh.shape['frames'])})"
            )
        return jitted(skybox, disk_mips, cam_pack, t_offsets)

    return render


def render_image_tiled(config: SceneConfig) -> np.ndarray:
    """Single-frame render with pixel rows sharded over ``tile_shards``
    devices — the production user of the "tile" mesh axis.

    4K/8K stills on a multi-chip host trace in parallel (the geodesic
    integration dominates frame cost and is embarrassingly parallel
    over rows); the frame-global lens stack (bloom convolution, flare)
    runs after the shard_map on the gathered layers, where XLA inserts
    the resharding collective automatically. Matches modes.render_image
    output for the same scene (tests/unit/test_sharded_frames.py).
    """
    import jax

    from ..camera import build_camera
    from ..config import escape_radius
    from ..modes import _scene_assets
    from ..ops.bloom import apply_bloom
    from ..ops.lens_flare import apply_lens_flare
    from ..ops.sampling import (
        build_mipmaps,
        pack_quad,
        pack_quad_mips,
        production_tex_dtype,
        quantize_packed,
    )
    from .mesh import make_frame_mesh

    n_tile = int(config.tile_shards)
    devices = jax.devices()
    if len(devices) < n_tile:
        raise ValueError(
            f"tile_shards={n_tile} but only {len(devices)} devices visible"
        )
    width, height = config.image_size
    skybox, disk_tex, dynamic = _scene_assets(config)
    if dynamic is not None:
        disk_tex = dynamic.advance(t=0.0, dt=0.0, recompute_stats=True)

    tex_dtype = production_tex_dtype()
    skybox_q = jax.jit(
        lambda t: quantize_packed(pack_quad(t), tex_dtype)
    )(jnp.asarray(skybox, jnp.float32))
    use_diff = config.use_ray_differentials
    atlas_num_levels = None
    if disk_tex is None:
        # V2 volume model: no texture pipeline; the renderer ignores
        # the placeholder mips (is_v2 branch in render_block).
        qmips = jnp.zeros((1, 1, 2, 4), jnp.float32)
    else:
        tex = jnp.asarray(disk_tex, jnp.float32)
        if use_diff:
            h, w = int(tex.shape[0]), int(tex.shape[1])
            if h % 16 == 0 and w % 16 == 0:
                from ..ops.sampling import build_mip_atlas_quad

                qmips, atlas_num_levels = build_mip_atlas_quad(
                    tex, 4, tex_dtype
                )
            else:
                qmips = quantize_packed(
                    pack_quad_mips(build_mipmaps(tex, levels=4)), tex_dtype
                )
        else:
            qmips = quantize_packed(pack_quad(tex), tex_dtype)[None]

    mesh = make_frame_mesh(1, n_tile, devices=devices[:n_tile])
    use_pallas = jax.default_backend() == "tpu"
    render = build_sharded_frame_renderer(
        mesh, config, width, height, frames_per_device=1,
        r_escape=escape_radius(config.r_max, config.pov),
        has_disk=True, use_diff=use_diff, use_pallas=use_pallas,
        return_layers=True, atlas_num_levels=atlas_num_levels,
    )
    cam = build_camera(config.pov, config.fov, width, height)
    cam_pack = jnp.asarray(pack_cameras([cam]))
    layers = render(skybox_q, qmips, cam_pack, jnp.zeros((1,), jnp.float32))

    @jax.jit
    def post(layers):
        bg_img, disk_img = layers[0, 0], layers[0, 1]
        blur = apply_bloom(disk_img, width_ref=width)
        final = jnp.clip(bg_img + disk_img + blur, 0.0, 1.0)
        if config.lens_flare:
            final = apply_lens_flare(final, disk_img)
        return final

    return np.asarray(jax.device_get(post(layers)))
