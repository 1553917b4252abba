#!/usr/bin/env python3
"""Frame-time sweep over the resolution presets (sd/hd/fhd/4k).

Thin loop over bench.time_resolution — literally the bench.py
methodology (batched sharded renderer, single scalar sync per batch),
so the README resolution-scaling table and the headline BASELINE metric
cannot drift onto different measurement protocols. Prints one line per
preset.
"""

import sys

sys.path.insert(0, ".")


def main() -> int:
    import bench
    from bhr_tpu.config import RESOLUTIONS
    from bhr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    skybox_q, tex_dtype = bench.build_skybox_q()

    for res, batch in [("sd", 32), ("hd", 32), ("fhd", 16), ("4k", 8)]:
        ms = bench.time_resolution(res, batch, skybox_q, tex_dtype)
        width, height = RESOLUTIONS[res]
        print(f"{res:4s} {width}x{height}: {ms:8.2f} ms/frame", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
