#!/usr/bin/env python3
"""Analytic rotation-speed report.

For a set of disk_rotation_speed presets, reports how far each radius
rotates per frame / per full video, the inner-vs-outer differential
shear, and whether the per-frame texture shift stays below perceptual
thresholds — the reference's analyze_rotation_speed.py report
(/root/reference/analyze_rotation_speed.py) for the Keplerian law
omega(r) = sqrt(0.5 / r^3).

Usage:
    python tools/analyze_rotation_speed.py [--r_inner 2.0] [--r_outer 15.0]
        [--n_frames 3600] [--n_phi 2912]
"""

import argparse
import sys

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--r_inner", type=float, default=2.0)
    ap.add_argument("--r_outer", type=float, default=15.0)
    ap.add_argument("--n_frames", type=int, default=3600)
    ap.add_argument("--n_phi", type=int, default=2912)
    ap.add_argument("--speeds", type=float, nargs="*",
                    default=[0.02, 0.05, 0.1, 0.2, 0.5])
    args = ap.parse_args()

    radii = {
        "inner edge": args.r_inner,
        "mid disk": 0.5 * (args.r_inner + args.r_outer),
        "outer edge": args.r_outer,
    }
    omega = {k: np.sqrt(0.5 / r**3) for k, r in radii.items()}

    print(f"Keplerian omega(r) = sqrt(0.5 / r^3), "
          f"disk [{args.r_inner}, {args.r_outer}], "
          f"{args.n_frames} frames, n_phi={args.n_phi}\n")
    print(f"{'speed':>7} | {'location':>10} | {'deg/frame':>9} | "
          f"{'px/frame':>8} | {'turns/video':>11}")
    print("-" * 60)
    for dt in args.speeds:
        for name, w in omega.items():
            deg_frame = np.degrees(w * dt)
            px_frame = w * dt / (2 * np.pi) * args.n_phi
            turns = w * dt * args.n_frames / (2 * np.pi)
            print(f"{dt:7.3f} | {name:>10} | {deg_frame:9.4f} | "
                  f"{px_frame:8.3f} | {turns:11.2f}")
        shear = omega["inner edge"] / omega["outer edge"]
        smooth = "OK" if omega["inner edge"] * dt / (2 * np.pi) * args.n_phi < 2.0 else "JUMPY"
        print(f"        | differential shear inner/outer = {shear:.1f}x, "
              f"per-frame motion {smooth}")
        print("-" * 60)
    return 0


if __name__ == "__main__":
    sys.exit(main())
