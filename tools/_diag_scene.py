"""Shared FHD diagnostic scene for the shade cost tools.

One source for the scene constants (camera, texture resolution, seeds)
used by cost_shade.py and ablate_shade.py, so the two diagnostics and
bench.py always measure the same configuration.
"""

import sys

sys.path.insert(0, ".")

FHD = (1920, 1080)
TEX_N_R, TEX_N_PHI = 416, 2912
DISK_R_INNER, DISK_R_OUTER = 2.0, 15.0
TILT_DEG = 15.0


def build_fhd_shade_inputs():
    """Build (W, H, cp, skybox_q, qmips, trace) for the FHD scene.

    Quantized/packed in the production storage dtype; the trace is a
    completed Pallas trace of the same scene, fully materialized.
    """
    import jax
    import jax.numpy as jnp

    from bhr_tpu.camera import build_camera
    from bhr_tpu.models.disk_texture import generate_disk_texture
    from bhr_tpu.models.skybox import generate_skybox
    from bhr_tpu.ops.geodesic_pallas import (
        camera_params,
        trace_geodesics_pallas,
    )
    from bhr_tpu.ops.sampling import (
        build_mipmaps,
        pack_quad,
        pack_quad_mips,
        production_tex_dtype,
        quantize_packed,
    )

    from bhr_tpu.config import escape_radius

    W, H = FHD
    tex_dtype = production_tex_dtype()
    pov = [6.0, 0.0, 0.5]
    cam = build_camera(pov, 90.0, W, H)
    cp = jnp.asarray(camera_params(cam))
    # Production escape radius (max(r_max=10, 2x cam distance) = 12.04,
    # config.escape_radius) — NOT disk_outer_radius: the diagnostics
    # must trace the same program bench.py and the renderer trace.
    r_esc = escape_radius(10.0, pov)

    skybox = generate_skybox(2048, 1024, seed=42, n_stars=2000)
    skybox_q = jax.jit(lambda t: quantize_packed(pack_quad(t), tex_dtype))(
        jnp.asarray(skybox, jnp.float32)
    )
    tex = jnp.asarray(
        generate_disk_texture(
            n_phi=TEX_N_PHI, n_r=TEX_N_R, seed=42,
            r_inner=DISK_R_INNER, r_outer=DISK_R_OUTER,
        )
    )
    qmips = jax.jit(
        lambda t: quantize_packed(pack_quad_mips(build_mipmaps(t)),
                                  tex_dtype)
    )(tex)

    trace = trace_geodesics_pallas(
        cp, width=W, height=H, h_base=0.1, r_escape=r_esc,
        tilt_deg=TILT_DEG, r_inner=DISK_R_INNER, r_outer=DISK_R_OUTER,
    )
    trace = jax.tree.map(jax.block_until_ready, trace)
    return W, H, cp, skybox_q, qmips, trace


def fhd_shade_avals():
    """Abstract (ShapeDtypeStruct) twins of build_fhd_shade_inputs'
    outputs: enough for ``jax.jit(...).lower()`` / cost analysis without
    generating assets or running the trace on device (minutes -> ms).
    Only ``cp`` is concrete (it is closed over as a constant)."""
    import jax
    import jax.numpy as jnp

    from bhr_tpu.camera import build_camera
    from bhr_tpu.config import escape_radius
    from bhr_tpu.ops.geodesic_pallas import (
        camera_params,
        trace_geodesics_pallas,
    )
    from bhr_tpu.ops.sampling import (
        build_mipmaps,
        pack_quad,
        pack_quad_mips,
        production_tex_dtype,
        quantize_packed,
    )

    W, H = FHD
    tex_dtype = production_tex_dtype()
    pov = [6.0, 0.0, 0.5]
    cam = build_camera(pov, 90.0, W, H)
    cp = jnp.asarray(camera_params(cam))

    skybox_q = jax.eval_shape(
        lambda t: quantize_packed(pack_quad(t), tex_dtype),
        jax.ShapeDtypeStruct((1024, 2048, 3), jnp.float32),
    )
    qmips = jax.eval_shape(
        lambda t: quantize_packed(
            pack_quad_mips(build_mipmaps(t)), tex_dtype
        ),
        jax.ShapeDtypeStruct((TEX_N_R, TEX_N_PHI, 4), jnp.float32),
    )
    trace = jax.eval_shape(
        lambda c: trace_geodesics_pallas(
            c, width=W, height=H, h_base=0.1,
            r_escape=escape_radius(10.0, pov),
            tilt_deg=TILT_DEG, r_inner=DISK_R_INNER, r_outer=DISK_R_OUTER,
        ),
        cp,
    )
    return W, H, cp, skybox_q, qmips, trace
