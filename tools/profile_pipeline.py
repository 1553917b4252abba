#!/usr/bin/env python3
"""Per-stage TPU profiler for the FHD dynamic-frame pipeline.

Run from the repo root: `python tools/profile_pipeline.py`.

Methodology note for relayed TPU environments: `block_until_ready` does
not reliably fence execution through the tunnel, so every measurement
forces a scalar device->host fetch and the dispatch round-trip floor is
measured separately and reported alongside (subtract it mentally; the
printed `-rtt` column does it for you). For end-to-end numbers use
bench.py, which amortizes dispatch over a 32-frame batched program.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", default="fhd",
                    choices=["sd", "hd", "fhd", "4k"])
    ap.add_argument("--aa", action="store_true",
                    help="profile the ray-differential AA pipeline "
                         "(diff trace + mip build + LOD shade)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bhr_tpu.config import SceneConfig, compute_disk_texture_resolution
    from bhr_tpu.models.dynamic_disk import DynamicDiskSystem, _recompute_stats
    from bhr_tpu.models.skybox import generate_skybox
    from bhr_tpu.models.disk_texture import compose_from_components
    from bhr_tpu.models.lifecycle import (
        MAX_HOTSPOTS, MAX_RT_SPIKES, accumulate_entity_layer,
        pack_filaments, pack_timer_entities,
    )
    from bhr_tpu.ops.background import generate_background_components
    from bhr_tpu.ops.bloom import apply_bloom
    from bhr_tpu.ops.geodesic_pallas import trace_geodesics_pallas
    from bhr_tpu.ops.sampling import pack_quad, quantize_packed
    from bhr_tpu.pipeline import shade_frame
    from bhr_tpu.camera import build_camera
    from bhr_tpu.parallel.frames import pack_cameras
    from bhr_tpu.constants import MAX_DISK_CROSSINGS, DISK_COLOR_TEMPERATURE
    from bhr_tpu.utils.io import compute_edge_alpha
    from bhr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    cfg = SceneConfig(
        resolution=args.resolution, pov=(6.0, 0.0, 0.5), fov=90.0,
        step_size=0.1, disk_inner_radius=2.0, disk_outer_radius=15.0,
        disk_tilt=15.0,
        anti_alias="lod_radius" if args.aa else "disabled",
    ).validated()
    use_diff = cfg.use_ray_differentials
    width, height = cfg.image_size
    n_phi, n_r = compute_disk_texture_resolution(
        width, height, cfg.pov, cfg.fov, 2.0, 15.0
    )
    print(f"scene: {width}x{height}, texture {n_r}x{n_phi}")

    dyn = DynamicDiskSystem(n_r, n_phi, 2.0, 15.0, seed=42)
    fil = jnp.asarray(pack_filaments(dyn.factories["filament"], 0.0))
    hs = jnp.asarray(
        pack_timer_entities(dyn.factories["hotspot"], 0.0, MAX_HOTSPOTS)
    )
    rt = jnp.asarray(
        pack_timer_entities(dyn.factories["rt_spike"], 0.0, MAX_RT_SPIKES)
    )
    from bhr_tpu.models.disk_texture import keplerian_omega
    from bhr_tpu.models.dynamic_disk import assemble_comp
    from bhr_tpu.ops.sampling import production_tex_dtype

    r_vals = 2.0 + 13.0 * np.linspace(0, 1, n_r)
    omega = jnp.asarray(keplerian_omega(jnp.asarray(r_vals)))
    edge = jnp.asarray(compute_edge_alpha(n_r))
    tex_dtype = production_tex_dtype()

    skybox = generate_skybox(2048, 1024, seed=42, n_stars=6000)
    skybox_q = jax.jit(lambda t: quantize_packed(pack_quad(t), tex_dtype))(
        jnp.asarray(skybox, jnp.float32)
    )
    cam = build_camera([6.0, 0.0, 0.5], 90.0, width, height)
    cam_pack = jnp.asarray(pack_cameras([cam])[0])

    rtt = [0.0]

    def bench(name, f, *args, n=8):
        float(jnp.sum(jax.tree.leaves(f(*args))[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            float(jnp.sum(jax.tree.leaves(f(*args))[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / n * 1000
        print(f"{name:36s} {dt:8.2f} ms   (-rtt: {dt - rtt[0]:7.2f})")
        return dt

    rtt[0] = bench("rtt floor", jax.jit(lambda a: a + 1), jnp.zeros(()), n=12)

    @jax.jit
    def stage_tex(t, fil, hs, rt):
        bg = generate_background_components(
            n_r, n_phi, dyn.az_freq, dyn.az_shear, 2.0, 15.0, t,
            generation_scale=2,
        )
        staging = accumulate_entity_layer(
            fil, hs, rt, omega, n_r, n_phi, phi_scale=2
        )
        comp = assemble_comp(bg, staging)
        p98, scale, row = _recompute_stats(comp, edge)
        tex = compose_from_components(
            comp, omega, edge, p98, scale, row, 0.0, True,
            jnp.float32(DISK_COLOR_TEMPERATURE),
        )
        if use_diff:
            from bhr_tpu.ops.sampling import build_mipmaps, pack_quad_mips

            return quantize_packed(
                pack_quad_mips(build_mipmaps(tex, levels=4)), tex_dtype
            )
        return quantize_packed(pack_quad(tex), tex_dtype)[None]

    qmips = jax.block_until_ready(stage_tex(jnp.float32(0.0), fil, hs, rt))
    bench("dynamic texture (all)", stage_tex, jnp.float32(0.0), fil, hs, rt)

    trace_kwargs = dict(
        h_base=0.1, r_escape=15.0, tilt_deg=15.0, r_inner=2.0, r_outer=15.0,
        with_differentials=use_diff, max_crossings=MAX_DISK_CROSSINGS,
        record_hits=True,
    )

    @jax.jit
    def stage_trace(cam):
        return trace_geodesics_pallas(
            cam, width=width, height=height, **trace_kwargs
        )

    trace = stage_trace(cam_pack)
    bench("pallas trace", stage_trace, cam_pack)

    @jax.jit
    def stage_shade(trace, qmips):
        # image_shape enables the ghost-slot crop window — the path
        # production renders actually take.
        bg_rgb, disk_rgb, _ = shade_frame(
            trace, skybox_q, qmips, int(qmips.shape[0]), cam_pack[0:3],
            r_inner=2.0, r_outer=15.0, tilt_deg=15.0,
            t_offset=jnp.float32(0.0), use_lod=use_diff, aa_strength=1.0,
            image_shape=(height, width),
        )
        return bg_rgb + disk_rgb

    bench("shade (sky + 2 slots + g)", stage_shade, trace, qmips)

    @jax.jit
    def stage_post(rgb):
        img = rgb.reshape(height, width, 3)
        blur = apply_bloom(img, width_ref=width)
        return jnp.round(jnp.clip(img + blur, 0, 1) * 255).astype(jnp.uint8)

    bench("bloom + final + u8", stage_post, stage_shade(trace, qmips))
    return 0


if __name__ == "__main__":
    sys.exit(main())
