#!/usr/bin/env python3
"""Attribute the FHD shade stage's non-gather cost, relay-noise-free.

Each variant runs ITERS times inside ONE jitted lax.fori_loop program
(bench.py methodology): the relay round-trip is paid once per variant,
and a per-iteration input perturbation defeats XLA loop-invariant
hoisting. Differences between variants are therefore pure device time.

Variants rebuild slot-0-only shading from the same building blocks the
production shade_frame uses, progressively stubbing stages:
gather+decode, +g-factor, +alpha compose, sky path, and the full
production shade_frame (all slots + ghost windows) as the anchor.
"""

import json
import sys

sys.path.insert(0, ".")


ITERS = 20


def main() -> int:
    import time

    import jax
    import jax.numpy as jnp

    from bhr_tpu.constants import DISK_ALPHA_GAIN, DISK_COLOR_TEMPERATURE
    from bhr_tpu.ops.sampling import sample_disk_quad, sample_skybox_quad
    from bhr_tpu.ops.shading import apply_g_factor, pow_const
    from bhr_tpu.pipeline import shade_frame
    from bhr_tpu.utils.cache import enable_compile_cache
    from tools._diag_scene import build_fhd_shade_inputs

    enable_compile_cache()
    W, H, cp, skybox_q, qmips, trace = build_fhd_shade_inputs()
    cam_pos = cp[0:3]
    tilt_rad = float(jnp.deg2rad(15.0))

    kw = dict(r_inner=2.0, r_outer=15.0, tilt_deg=15.0,
              t_offset=jnp.float32(0.0), use_lod=False, aa_strength=1.0,
              image_shape=(H, W))

    def slot0(body):
        """Build a fn(eps) that shades slot 0 with a custom body."""
        feat = trace.hits[0]
        hit_count = trace.hit_count

        def fn(eps):
            hit_x = feat[0] + eps
            hit_y = feat[1]
            rgba = sample_disk_quad(
                qmips[0], hit_x, hit_y, 2.0, 15.0, 0.0
            ).astype(jnp.float32)
            return body(rgba, hit_x, hit_y, feat, hit_count)

        return fn

    def body_gather(rgba, hit_x, hit_y, feat, hit_count):
        return jnp.sum(rgba)

    def body_gfactor(rgba, hit_x, hit_y, feat, hit_count):
        hit_z = hit_y * jnp.float32(jnp.tan(tilt_rad))
        hit_pos = jnp.stack([hit_x, hit_y, hit_z], axis=-1)
        hit_r = jnp.sqrt(hit_x**2 + hit_y**2)
        shaded = apply_g_factor(
            rgba[:, :3], hit_pos, hit_r, -feat[2:5].T, cam_pos,
            2.0, 15.0, tilt_rad, DISK_COLOR_TEMPERATURE,
        )
        return jnp.sum(shaded)

    def body_full_slot(rgba, hit_x, hit_y, feat, hit_count):
        hit_z = hit_y * jnp.float32(jnp.tan(tilt_rad))
        hit_pos = jnp.stack([hit_x, hit_y, hit_z], axis=-1)
        hit_r = jnp.sqrt(hit_x**2 + hit_y**2)
        shaded = apply_g_factor(
            rgba[:, :3], hit_pos, hit_r, -feat[2:5].T, cam_pos,
            2.0, 15.0, tilt_rad, DISK_COLOR_TEMPERATURE,
        )
        valid = 0 < hit_count
        base_alpha = jnp.minimum(rgba[:, 3], 0.999)
        disk_alpha = 1.0 - pow_const(1.0 - base_alpha, DISK_ALPHA_GAIN)
        disk_alpha = jnp.where(valid, disk_alpha, 0.0)
        return jnp.sum(shaded * disk_alpha[:, None])

    def sky_only(eps):
        s = sample_skybox_quad(skybox_q, trace.escape_dir + eps)
        return jnp.sum(s.astype(jnp.float32))

    def sky_masked(eps):
        s = jnp.where(
            trace.escaped[:, None],
            sample_skybox_quad(skybox_q, trace.escape_dir + eps).astype(
                jnp.float32
            ),
            0.0,
        )
        return jnp.sum(s)

    def full_shade(eps):
        bg, disk, _ = shade_frame(
            trace, skybox_q, qmips, 4, cam_pos + eps, **kw
        )
        return jnp.sum(bg + disk)

    variants = [
        ("slot0 gather+decode", slot0(body_gather)),
        ("slot0 gather+g-factor", slot0(body_gfactor)),
        ("slot0 gather+g+alpha", slot0(body_full_slot)),
        ("sky gather+decode", sky_only),
        ("sky masked+decode", sky_masked),
    ]
    if "--anchor" in sys.argv:
        # The whole shade_frame inside a fori_loop compiles for minutes
        # (ghost-window lax.conds unrolled against the loop); opt-in.
        variants.append(("full shade_frame (anchor)", full_shade))

    results = {}
    for name, fn in variants:

        @jax.jit
        def looped(e0, fn=fn):
            def it(i, acc):
                return acc + fn(e0 + jnp.float32(i) * 1e-12)

            return jax.lax.fori_loop(0, ITERS, it, jnp.float32(0.0))

        looped(jnp.float32(0.0)).block_until_ready()  # compile
        t0 = time.perf_counter()
        float(looped(jnp.float32(1e-12)))  # one dispatch, one fetch
        dt = time.perf_counter() - t0
        ms = dt / ITERS * 1e3
        results[name] = ms
        print(f"{name:28s} {ms:7.2f} ms/iter", flush=True)

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
