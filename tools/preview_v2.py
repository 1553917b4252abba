#!/usr/bin/env python3
"""Disk V2 field preview tool (reference: docs/design_ad_v2.md:454-470 —
preview is a planned module with a defined diagnostic purpose).

Dumps the V2 model's no-ray-trace diagnostic views as PNGs:
  * top view:       face-on midplane emissivity through the palette;
  * cross-section:  (r, z) slice of density and temperature.

Usage:
    python tools/preview_v2.py [--size 512] [--palette cinematic]
        [--r_in 2.0] [--r_out 15.0] [--seed 42] [--t 0.0]
        [--structure] [--out output/v2_preview]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--palette", default="cinematic",
                    choices=["cinematic", "scientific"])
    ap.add_argument("--r_in", type=float, default=2.0)
    ap.add_argument("--r_out", type=float, default=15.0)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--t", type=float, default=0.0)
    ap.add_argument("--structure", action="store_true",
                    help="apply the default structure modulations")
    ap.add_argument("--out", default="output/v2_preview")
    args = ap.parse_args()

    from bhr_tpu.models.disk_v2 import (
        DiskV2Params,
        DiskV2StructureParams,
        render_cross_section,
        render_top_view,
    )
    from bhr_tpu.utils.io import save_image

    params = DiskV2Params(r_in=args.r_in, r_out=args.r_out)
    structure = DiskV2StructureParams() if args.structure else None

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)

    top = np.asarray(render_top_view(
        params, structure, size=args.size, seed=args.seed,
        t=args.t, palette=args.palette,
    ))
    save_image(top, f"{args.out}_top.png")
    print(f"wrote {args.out}_top.png  "
          f"(mean {top.mean():.4f}, max {top.max():.4f})")

    for field in ("density", "temperature"):
        cs = np.asarray(render_cross_section(
            params, size_r=args.size, size_z=max(args.size // 4, 32),
            field=field,
        ))
        rgb = np.repeat(cs[:, :, None], 3, axis=2)
        save_image(rgb, f"{args.out}_{field}.png")
        print(f"wrote {args.out}_{field}.png  "
              f"(mean {cs.mean():.4f}, max {cs.max():.4f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
