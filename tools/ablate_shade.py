#!/usr/bin/env python3
"""Empirical ablation of the FHD deferred-shade stage.

Times shade variants on one recorded trace to attribute the stage cost:
full pipeline, texture-gathers only, sky-gather only, and g-factor
stubbed. Uses the batched single-fetch timing protocol (the relay RTT
is paid once per measurement, not per dispatch).
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main() -> int:
    import jax
    import jax.numpy as jnp

    from bhr_tpu.ops.sampling import sample_disk_quad, sample_skybox_quad
    from bhr_tpu.pipeline import shade_frame
    from bhr_tpu.utils.cache import enable_compile_cache
    from bhr_tpu.utils.profiling import device_time
    from tools._diag_scene import build_fhd_shade_inputs

    enable_compile_cache()
    W, H, cp, skybox_q, qmips, trace = build_fhd_shade_inputs()
    hc = np.asarray(trace.hit_count)
    print(f"hit_count: 0:{(hc == 0).mean():.2%} 1:{(hc == 1).mean():.2%} "
          f"2+:{(hc >= 2).mean():.2%}  escaped:{np.asarray(trace.escaped).mean():.2%}")

    kw = dict(r_inner=2.0, r_outer=15.0, tilt_deg=15.0,
              t_offset=jnp.float32(0.0), use_lod=False, aa_strength=1.0,
              image_shape=(H, W))

    # trace/textures are jit ARGUMENTS (closing over them would embed
    # frame-sized constants in the program payload — the relay rejects
    # the oversized compile request).
    @jax.jit
    def full(tr, eps):
        bg, disk, _ = shade_frame(
            tr, skybox_q, qmips, 4, cp[0:3] + eps, **kw
        )
        return jnp.sum(bg + disk)

    @jax.jit
    def gathers_only(tr, eps):
        d = sample_disk_quad(
            qmips[0], tr.hits[0, 0] + eps, tr.hits[0, 1],
            2.0, 15.0, 0.0,
        )
        s = sample_skybox_quad(skybox_q, tr.escape_dir + eps)
        return jnp.sum(d) + jnp.sum(s)

    @jax.jit
    def disk_gather_only(tr, eps):
        d = sample_disk_quad(
            qmips[0], tr.hits[0, 0] + eps, tr.hits[0, 1],
            2.0, 15.0, 0.0,
        )
        return jnp.sum(d)

    @jax.jit
    def sky_gather_only(tr, eps):
        s = sample_skybox_quad(skybox_q, tr.escape_dir + eps)
        return jnp.sum(s)

    @jax.jit
    def no_sky(tr, eps):
        # Returning only the disk layer makes the sky gather dead code
        # (XLA DCEs it): measures full-shade minus the skybox sample.
        bg, disk, _ = shade_frame(
            tr, skybox_q, qmips, 4, cp[0:3] + eps, **kw
        )
        return jnp.sum(disk)

    variants = [
        ("full shade", full),
        ("disk+sky gathers only", gathers_only),
        ("disk slot0 gather only", disk_gather_only),
        ("sky gather only", sky_gather_only),
        ("full, disk layer only", no_sky),
    ]
    import itertools

    eps_iter = itertools.count()
    for name, fn in variants:
        fn(trace, jnp.float32(0.0))  # compile
        ms = device_time(
            lambda fn=fn: fn(trace, jnp.float32(next(eps_iter)) * 1e-12),
            iters=20,
        ) * 1e3  # device_time returns amortized per-call seconds
        print(f"{name:28s} {ms:7.2f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
