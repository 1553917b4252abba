#!/usr/bin/env python3
"""One-command TPU smoke verification of the production paths.

The CPU test suite exercises interpret-mode Pallas and f32 textures; the
production TPU configuration (compiled Pallas kernel, unrolled exit
checks, uint8 gamma textures, sharded video renderer) only runs on the
chip. This script drives all of it and checks invariants:

  1. e2e golden scene: same-backend golden + cross-backend bounds
     (tests/e2e_render.py --verify).
  2. Sharded dynamic video renderer, 2 frames: bright, non-trivial
     output; frame-to-frame change (lifecycle advancing). (NaN
     detection is section 1's job — these frames are uint8.)
  3. AA (ray-differential) variant compiles and softens edges.
  4. V2 volume model through the SAME sharded engine (trace +
     shade_frame_v2 per frame): bright, rotating output.
  5. Fused interactive session (one dispatch per frame): uint8 frames,
     toggle variants compile.

Run from the repo root: `python tools/verify_tpu.py`; exit 0 = pass.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from bhr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()  # repeat verifies reuse every compiled program

    if jax.default_backend() not in ("tpu", "axon"):
        print(f"note: backend is {jax.default_backend()}, not TPU — "
              "still running (paths identical, speeds differ)")

    failures = []

    # -- 1. golden scene ----------------------------------------------------
    import e2e_render

    for scene in sorted(e2e_render.SCENES):
        rc = e2e_render.verify(scene)
        if rc != 0:
            failures.append(f"e2e golden verify [{scene}] rc={rc}")

    # -- 2. sharded dynamic video renderer ----------------------------------
    from bhr_tpu.config import (
        SceneConfig,
        compute_disk_texture_resolution,
        scene_escape_radius,
    )
    from bhr_tpu.models.dynamic_disk import DynamicDiskSystem
    from bhr_tpu.models.skybox import generate_skybox
    from bhr_tpu.ops.sampling import pack_quad, quantize_packed
    from bhr_tpu.parallel.mesh import make_frame_mesh
    from bhr_tpu.parallel.video import (
        build_sharded_video_renderer, pack_frame_params,
    )
    from bhr_tpu.parallel.frames import cameras_for_orbit, pack_cameras

    def render_two(anti_alias: str) -> np.ndarray:
        cfg = SceneConfig(
            resolution="sd", pov=(6.0, 0.0, 0.5), fov=90.0, step_size=0.1,
            disk_inner_radius=2.0, disk_outer_radius=15.0, disk_tilt=15.0,
            orbit=True, n_frames=64, anti_alias=anti_alias,
        ).validated()
        width, height = cfg.image_size
        sky = generate_skybox(512, 256, seed=42, n_stars=1000)
        from bhr_tpu.ops.sampling import production_tex_dtype

        tex_dtype = production_tex_dtype()
        skyq = jax.jit(lambda t: quantize_packed(pack_quad(t), tex_dtype))(
            jnp.asarray(sky, jnp.float32)
        )
        n_phi, n_r = compute_disk_texture_resolution(
            width, height, cfg.pov, cfg.fov, 2.0, 15.0
        )
        dyn = DynamicDiskSystem(n_r, n_phi, 2.0, 15.0, seed=42)
        fil, hs, rt = pack_frame_params(dyn, 2, cfg.disk_rotation_speed)
        mesh = make_frame_mesh(1, 1, devices=jax.devices()[:1])
        rend = build_sharded_video_renderer(
            mesh, cfg, n_r, n_phi,
            r_escape=scene_escape_radius(cfg),
            az_freq=dyn.az_freq, az_shear=dyn.az_shear, tex_dtype=tex_dtype,
        )
        cams = cameras_for_orbit(cfg, [0, 1], width, height)
        out = rend(
            skyq, jnp.asarray(pack_cameras(cams)),
            jnp.asarray([0.0, cfg.disk_rotation_speed], jnp.float32),
            jnp.asarray(fil), jnp.asarray(hs), jnp.asarray(rt),
        )
        return np.asarray(out)

    # NaN/Inf detection lives in section 1: the float-path golden
    # comparisons fail on any non-finite pixel (NaN compares false
    # against every tolerance). These frames are uint8 — the on-device
    # cast destroys NaN bits, so an isfinite() check here would be
    # vacuous; check structural invariants instead.
    frames = render_two("disabled")
    if frames.max() < 64:
        failures.append(f"video frames dim (max {frames.max()}) — "
                        "photon ring/disk missing")
    occupancy = (frames > 0).mean()
    if not 0.2 < occupancy < 1.0:
        failures.append(f"video frame occupancy {occupancy:.3f} out of range")
    delta = np.abs(
        frames[0].astype(np.int16) - frames[1].astype(np.int16)
    ).mean()
    if delta <= 0.01:
        failures.append(f"frames 0/1 nearly identical (mean delta {delta})")
    print(f"sharded video OK: occupancy={occupancy:.3f} "
          f"frame delta={delta:.2f}")

    # -- 3. AA variant -------------------------------------------------------
    aa = render_two("lod_radius")
    if aa.max() < 64:
        failures.append(f"AA frames dim (max {aa.max()})")
    aa_delta = np.abs(
        aa[0].astype(np.int16) - frames[0].astype(np.int16)
    ).mean()
    if aa_delta == 0:
        failures.append("AA output identical to non-AA output")
    else:
        print(f"AA variant OK: mean |AA - no-AA| = {aa_delta:.2f}")

    # -- 4. V2 through the sharded engine ------------------------------------
    v2_cfg = SceneConfig(
        resolution="sd", pov=(6.0, 0.0, 0.5), fov=90.0, step_size=0.1,
        disk_inner_radius=2.0, disk_outer_radius=15.0, disk_tilt=15.0,
        disk_model="v2", orbit=True, n_frames=64,
    ).validated()
    width, height = v2_cfg.image_size
    sky = generate_skybox(512, 256, seed=42, n_stars=1000)
    from bhr_tpu.ops.sampling import production_tex_dtype

    tex_dtype = production_tex_dtype()
    skyq = jax.jit(lambda t: quantize_packed(pack_quad(t), tex_dtype))(
        jnp.asarray(sky, jnp.float32)
    )
    mesh = make_frame_mesh(1, 1, devices=jax.devices()[:1])
    v2_rend = build_sharded_video_renderer(
        mesh, v2_cfg, 0, 0, r_escape=scene_escape_radius(v2_cfg),
        az_freq=0.0, az_shear=0.0, tex_dtype=tex_dtype,
    )
    cams = cameras_for_orbit(v2_cfg, [0, 1], width, height)
    zeros = jnp.zeros((2, 1, 8), jnp.float32)
    v2_frames = np.asarray(v2_rend(
        skyq, jnp.asarray(pack_cameras(cams)),
        jnp.asarray([0.0, 5.0], jnp.float32), zeros, zeros, zeros,
    ))
    if v2_frames.max() < 64:
        failures.append(f"V2 sharded frames dim (max {v2_frames.max()})")
    v2_delta = np.abs(
        v2_frames[0].astype(np.int16) - v2_frames[1].astype(np.int16)
    ).mean()
    if v2_delta <= 0.01:
        failures.append(
            f"V2 frames 0/1 nearly identical (mean delta {v2_delta}) — "
            "orbit/t rotation not reaching the integrator"
        )
    else:
        print(f"V2 sharded engine OK: max={v2_frames.max()} "
              f"frame delta={v2_delta:.2f}")

    # -- 5. fused interactive session ----------------------------------------
    from bhr_tpu.interactive import InteractiveSession

    sess = InteractiveSession(SceneConfig(
        resolution="sd", pov=(6.0, 0.0, 0.5), fov=90.0, step_size=0.1,
        disk_inner_radius=2.0, disk_outer_radius=15.0, disk_tilt=15.0,
        interactive=True,
    ).validated())
    if sess._fused is None:
        failures.append("fused interactive engine did not build")
    else:
        f0 = np.asarray(sess.step(1 / 30))
        sess.handle_key("b")  # bloom-off variant must compile too
        f1 = np.asarray(sess.step(1 / 30))
        sess.step(1 / 30)  # warm step: report steady-state ms, not compile
        if f0.dtype != np.uint8 or f0.max() < 64:
            failures.append(
                f"fused interactive frame bad (dtype {f0.dtype}, "
                f"max {f0.max()})"
            )
        elif f1.shape != f0.shape:
            failures.append("fused toggle variant shape mismatch")
        else:
            print(f"fused interactive OK: max={f0.max()} "
                  f"render {sess.last_render_ms:.0f} ms/frame (warm)")

    if failures:
        print("FAIL:")
        for f in failures:
            print(f"  - {f}")
        return 1
    print("verify_tpu: ALL PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
