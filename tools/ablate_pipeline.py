#!/usr/bin/env python3
"""Whole-pipeline stage ablation: end-to-end ms/frame with one stage
monkeypatched out of the REAL batched program.

Per-stage timers mislead here (dispatch overhead + lost fusion distort
isolated stages; see tools/profile_pipeline.py's caveats), so this
measures the only number that matters — bench.time_resolution's
end-to-end frame time — with a stage knocked out, and attributes the
difference to that stage. This is how the round-2 optimization targets
were found (disk gather 81 ms / sky gather 47 ms of the 4K frame).

Usage:
    python tools/ablate_pipeline.py [--resolution 4k] [--aa] \
        [--stages base,nosky,nodisk,nobloom]
"""

import argparse
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", default="4k",
                    choices=["sd", "hd", "fhd", "4k"])
    ap.add_argument("--aa", action="store_true")
    ap.add_argument("--stages", default="base,nosky,nodisk,nobloom")
    ap.add_argument("--batch", type=int, default=0,
                    help="frames per timed batch (0 = preset default)")
    args = ap.parse_args()

    import jax.numpy as jnp

    import bench
    from bhr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    skybox_q, tex_dtype = bench.build_skybox_q()
    batch = args.batch or {"sd": 32, "hd": 32, "fhd": 16, "4k": 8}[
        args.resolution]
    aa = "lod_radius" if args.aa else "disabled"

    import bhr_tpu.parallel.video as video
    import bhr_tpu.pipeline as pipeline

    def restorer():
        saved = {
            "bloom": video.apply_bloom,
            "sky": pipeline.sample_skybox_quad,
            "disk": pipeline.sample_disk_quad,
            "mip": pipeline.sample_disk_mip_quad,
            "atlas": pipeline.sample_disk_mip_atlas,
        }

        def restore():
            video.apply_bloom = saved["bloom"]
            pipeline.sample_skybox_quad = saved["sky"]
            pipeline.sample_disk_quad = saved["disk"]
            pipeline.sample_disk_mip_quad = saved["mip"]
            pipeline.sample_disk_mip_atlas = saved["atlas"]

        return restore

    def patch(stage: str) -> None:
        if stage == "base":
            return
        if stage == "nobloom":
            video.apply_bloom = (
                lambda img, width_ref: jnp.zeros_like(img))
        elif stage == "nosky":
            pipeline.sample_skybox_quad = (
                lambda q, d, **kw:
                jnp.ones((d.shape[0], 3), jnp.float32) * 0.1)
        elif stage == "nodisk":
            pipeline.sample_disk_quad = (
                lambda q, x, y, ri, ro, t, **kw:
                jnp.stack([x, y, x, y], -1) * 0.1)
            fake_mip = (lambda q, n, x, y, ri, ro, t, lod, channels=4, **kw:
                        jnp.stack([x, y, x, lod], -1) * 0.1)
            pipeline.sample_disk_mip_quad = fake_mip
            pipeline.sample_disk_mip_atlas = fake_mip
        else:
            raise SystemExit(f"unknown stage {stage!r}")

    base_ms = None
    for stage in args.stages.split(","):
        restore = restorer()
        try:
            patch(stage)
            # The engine memoizes built renderers on every *config*
            # static (parallel/video._RENDERER_MEMO) — a monkeypatched
            # stage is invisible to that key, so a memo hit would hand
            # back the UNPATCHED program and the ablation would read
            # ~0. Clear it so each stage traces fresh.
            video._RENDERER_MEMO.clear()
            ms = bench.time_resolution(
                args.resolution, batch, skybox_q, tex_dtype, anti_alias=aa
            )
        finally:
            restore()
            video._RENDERER_MEMO.clear()
        delta = "" if base_ms is None else f"   (stage ~{base_ms - ms:+.1f})"
        if stage == "base":
            base_ms = ms
        print(f"{args.resolution}{' aa' if args.aa else ''} "
              f"{stage:8s} {ms:8.2f} ms/frame{delta}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
