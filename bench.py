#!/usr/bin/env python3
"""Benchmark: 1080p full-pipeline frame time on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference renders a 1080p frame in < 2 s on its CPU backend
(BASELINE.md); vs_baseline is the speedup factor 2000 ms / measured ms.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    from bhr_tpu.config import SceneConfig, compute_disk_texture_resolution
    from bhr_tpu.models.skybox import generate_skybox
    from bhr_tpu.pipeline import Renderer
    from bhr_tpu.utils.io import compute_edge_alpha

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
        width, height, cfg.pov, cfg.fov, cfg.disk_inner_radius, cfg.disk_outer_radius
    )
    rng = np.random.default_rng(42)
    tex = rng.random((n_r, n_phi, 4)).astype(np.float32)
    tex[..., 3] *= compute_edge_alpha(n_r)[:, None]

    renderer = Renderer(cfg, skybox, tex)

    # Warmup / compile.
    renderer.render_device(cfg.pov, cfg.fov, frame=0).block_until_ready()

    times = []
    for i in range(5):
        t0 = time.perf_counter()
        out = renderer.render_device(cfg.pov, cfg.fov, frame=i)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)

    ms = float(np.median(times) * 1000.0)
    result = {
        "metric": "fhd_frame_ms",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(2000.0 / ms, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
