#!/usr/bin/env python3
"""XLA cost analysis of the FHD deferred-shade program.

Prints flops / bytes-accessed estimates from the compiled module, plus
the roofline times they imply on v5e (~819 GB/s HBM, ~3.9 T f32 op/s
VPU) — tells whether shade is gather-, bandwidth-, or compute-bound.
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from bhr_tpu.camera import build_camera
    from bhr_tpu.models.disk_texture import generate_disk_texture
    from bhr_tpu.models.skybox import generate_skybox
    from bhr_tpu.ops.geodesic_pallas import camera_params, trace_geodesics_pallas
    from bhr_tpu.ops.sampling import (
        build_mipmaps,
        pack_quad,
        pack_quad_mips,
        production_tex_dtype,
        quantize_packed,
    )
    from bhr_tpu.pipeline import shade_frame

    W, H = 1920, 1080
    n_r, n_phi = 416, 2912
    tex_dtype = production_tex_dtype()
    cam = build_camera([6.0, 0.0, 0.5], 90.0, W, H)
    cp = jnp.asarray(camera_params(cam))

    skybox = generate_skybox(2048, 1024, seed=42, n_stars=2000)
    skybox_q = jax.jit(lambda t: quantize_packed(pack_quad(t), tex_dtype))(
        jnp.asarray(skybox, jnp.float32)
    )
    tex = jnp.asarray(
        generate_disk_texture(
            n_phi=n_phi, n_r=n_r, seed=42, r_inner=2.0, r_outer=15.0
        )
    )
    qmips = jax.jit(
        lambda t: quantize_packed(pack_quad_mips(build_mipmaps(t), 4), tex_dtype)
    )(tex)

    trace = trace_geodesics_pallas(
        cp, width=W, height=H, h_base=0.1, r_escape=15.0,
        tilt_deg=15.0, r_inner=2.0, r_outer=15.0,
    )
    trace = jax.tree.map(jax.block_until_ready, trace)

    def shade(trace, skybox_q, qmips):
        bg, disk, _ = shade_frame(
            trace, skybox_q, qmips, 4, cp[0:3],
            r_inner=2.0, r_outer=15.0, tilt_deg=15.0,
            t_offset=jnp.float32(0.0), use_lod=False, aa_strength=1.0,
            image_shape=(H, W),
        )
        return bg + disk

    lowered = jax.jit(shade).lower(trace, skybox_q, qmips)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))
    print(f"flops: {flops/1e9:.2f} G")
    print(f"bytes accessed: {bytes_acc/1e9:.3f} GB")
    print(f"roofline: compute {flops/3.9e12*1e3:.2f} ms | "
          f"HBM {bytes_acc/819e9*1e3:.2f} ms")
    for k, v in sorted(ca.items()):
        if isinstance(v, float) and v > 1e6 and "bytes accessed" in k:
            print(f"  {k}: {v/1e6:.1f} MB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
