#!/usr/bin/env python3
"""Frame-time sweep over the resolution presets (sd/hd/fhd/4k).

Same methodology as bench.py (batched sharded renderer, single scalar
sync per batch); prints one line per preset. Source of the README
resolution-scaling table.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from bhr_tpu.config import SceneConfig, compute_disk_texture_resolution
    from bhr_tpu.models.dynamic_disk import DynamicDiskSystem
    from bhr_tpu.models.skybox import generate_skybox
    from bhr_tpu.ops.sampling import (
        pack_quad, production_tex_dtype, quantize_packed,
    )
    from bhr_tpu.parallel.mesh import make_frame_mesh
    from bhr_tpu.parallel.video import (
        build_sharded_video_renderer, pack_frame_params,
    )
    from bhr_tpu.parallel.frames import cameras_for_orbit, pack_cameras
    from bhr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    tex_dtype = production_tex_dtype()
    skybox = generate_skybox(2048, 1024, seed=42, n_stars=6000)
    skybox_q = jax.jit(lambda t: quantize_packed(pack_quad(t), tex_dtype))(
        jnp.asarray(skybox, jnp.float32)
    )

    for res, batch in [("sd", 32), ("hd", 32), ("fhd", 16), ("4k", 8)]:
        cfg = SceneConfig(
            resolution=res, pov=(6.0, 0.0, 0.5), fov=90.0, step_size=0.1,
            disk_inner_radius=2.0, disk_outer_radius=15.0, disk_tilt=15.0,
            orbit=True, n_frames=3600,
        ).validated()
        width, height = cfg.image_size
        n_phi, n_r = compute_disk_texture_resolution(
            width, height, cfg.pov, cfg.fov, 2.0, 15.0
        )
        dynamic = DynamicDiskSystem(n_r, n_phi, 2.0, 15.0, seed=42)
        fil, hs, rt = pack_frame_params(
            dynamic, 2 * batch, cfg.disk_rotation_speed
        )
        mesh = make_frame_mesh(1, 1, devices=jax.devices()[:1])
        r_escape = max(
            cfg.r_max, 2.0 * float(np.linalg.norm(np.asarray(cfg.pov)))
        )
        render = build_sharded_video_renderer(
            mesh, cfg, n_r, n_phi, r_escape=r_escape,
            az_freq=dynamic.az_freq, az_shear=dynamic.az_shear,
            tex_dtype=tex_dtype,
        )

        def run_batch(lo):
            idx = list(range(lo, lo + batch))
            cams = cameras_for_orbit(cfg, idx, width, height)
            out = render(
                skybox_q, jnp.asarray(pack_cameras(cams)),
                jnp.asarray(
                    [f * cfg.disk_rotation_speed for f in idx], jnp.float32
                ),
                jnp.asarray(fil[idx]), jnp.asarray(hs[idx]),
                jnp.asarray(rt[idx]),
            )
            return float(jnp.sum(out.astype(jnp.float32)))

        run_batch(0)  # compile + warm
        t0 = time.perf_counter()
        run_batch(batch)
        ms = (time.perf_counter() - t0) / batch * 1000.0
        print(f"{res:4s} {width}x{height}: {ms:8.2f} ms/frame", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
