#!/usr/bin/env python3
"""Benchmark: 1080p full-pipeline frame rate on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference renders a 1080p frame in < 2 s on its CPU backend
(BASELINE.md); vs_baseline is the speedup factor 2000 ms / measured ms.

Measurement method: the TPU here sits behind a tunnel with a large
per-sync round trip, so we dispatch N frames with varying cameras and
sync ONCE at the end — per-frame time approaches true device time, which
is also the throughput number that matters for video rendering.
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from bhr_tpu.config import SceneConfig, compute_disk_texture_resolution
    from bhr_tpu.models.disk_texture import generate_disk_texture
    from bhr_tpu.models.skybox import generate_skybox
    from bhr_tpu.pipeline import Renderer
    from bhr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    width, height = 1920, 1080
    cfg = SceneConfig(
        resolution="fhd",
        pov=(6.0, 0.0, 0.5),
        fov=90.0,
        step_size=0.1,
        disk_inner_radius=2.0,
        disk_outer_radius=15.0,
        disk_tilt=15.0,
    ).validated()

    skybox = generate_skybox(2048, 1024, seed=42, n_stars=6000)
    n_phi, n_r = compute_disk_texture_resolution(
        width, height, cfg.pov, cfg.fov, cfg.disk_inner_radius,
        cfg.disk_outer_radius,
    )
    tex = np.asarray(
        generate_disk_texture(
            n_phi=n_phi, n_r=n_r, seed=42,
            r_inner=cfg.disk_inner_radius, r_outer=cfg.disk_outer_radius,
        )
    )

    renderer = Renderer(cfg, skybox, tex)

    # Compile + warm.
    out = renderer.render_device(cfg.pov, cfg.fov, frame=0)
    float(jnp.sum(out))

    # N dispatches, one sync: amortizes the tunnel RTT out.
    n_frames = 10
    cams = [
        (6.0 * np.cos(a), 6.0 * np.sin(a), 0.5)
        for a in np.linspace(0, 0.05, n_frames)
    ]
    t0 = time.perf_counter()
    acc = None
    for i, cam in enumerate(cams):
        out = renderer.render_device(cam, cfg.fov, frame=i)
        red = jnp.sum(out)
        acc = red if acc is None else acc + red
    float(acc)
    ms = (time.perf_counter() - t0) / n_frames * 1000.0

    result = {
        "metric": "fhd_frame_ms",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(2000.0 / ms, 2),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
