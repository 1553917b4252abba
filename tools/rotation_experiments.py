#!/usr/bin/env python3
"""Disk-rotation algorithm experiments.

A/B/C comparison of the rotation strategies the reference evaluated in
disk_rotation_experiments/ (experiment_{1,2,3}: baseline per-row roll vs
parametric regeneration vs keyframe interpolation), re-run against this
framework's implementations, plus per-component visualizations
(the reference's visualize_all_components.py).

Usage:
    python tools/rotation_experiments.py [--n_phi 512] [--n_r 128] [--t 5.0]
        [--out output/rotation_experiments]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

COMPONENT_NAMES = [
    "temp_base", "spiral", "spiral_temp", "turbulence", "turb_temp",
    "arcs", "arcs_temp", "rt_spikes", "rt_temp", "hotspot",
    "hotspot_temp", "az_hotspot", "disturb_mod",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_phi", type=int, default=512)
    ap.add_argument("--n_r", type=int, default=128)
    ap.add_argument("--seed", type=int, default=42)
    # Non-integer default: at integer t the keyframe experiment
    # degenerates to frac=0 (bitwise-equal to the roll result) and
    # the interpolation error metric reads 0 without measuring.
    ap.add_argument("--t", type=float, default=5.5)
    ap.add_argument("--out", type=str, default="output/rotation_experiments")
    args = ap.parse_args()

    from bhr_tpu.models.disk_texture import (
        build_parametric_state,
        compose_from_state,
    )
    from bhr_tpu.models.dynamic_disk import DynamicDiskSystem
    from bhr_tpu.utils.io import save_image

    os.makedirs(args.out, exist_ok=True)
    kw = dict(n_phi=args.n_phi, n_r=args.n_r, seed=args.seed,
              r_inner=2.0, r_outer=3.5)

    # --- Experiment 1: parametric state roll (the winning strategy) ----
    t0 = time.time()
    state = build_parametric_state(**kw)
    build_s = time.time() - t0
    # Warm BOTH jitted compose variants first (t != 0 rolls; an
    # integer-floored keyframe t of 0.0 selects the static skip_roll
    # program — a different compile): experiments 1/3 must run warm, so
    # any cold compile inside a timing window would bias the A/B.
    np.asarray(compose_from_state(state, args.t))
    np.asarray(compose_from_state(state, float(np.floor(args.t))))
    np.asarray(compose_from_state(state, float(np.floor(args.t)) + 1.0))
    t0 = time.time()
    tex_roll = np.asarray(compose_from_state(state, args.t))
    np.asarray(compose_from_state(state, args.t + 0.1))
    roll_s = (time.time() - t0) / 2

    # --- Experiment 2: full regeneration at shifted phases -------------
    # (the reference's "parametric regen": regenerate everything with the
    # rotation baked into the sampling grid — here equivalent to
    # rebuilding the state; measures the cost the roll path avoids)
    t0 = time.time()
    state2 = build_parametric_state(**kw)
    regen_s = time.time() - t0

    # --- Experiment 3: keyframe interpolation ---------------------------
    t0 = time.time()
    k0 = np.asarray(compose_from_state(state, np.floor(args.t)))
    k1 = np.asarray(compose_from_state(state, np.floor(args.t) + 1.0))
    frac = args.t - np.floor(args.t)
    tex_keyframe = (1 - frac) * k0 + frac * k1
    key_s = time.time() - t0

    # --- Experiment 4: lifecycle dynamic system -------------------------
    dyn = DynamicDiskSystem(args.n_r, args.n_phi, 2.0, 3.5, seed=args.seed)
    dyn.advance(0.0, 0.0, recompute_stats=True)
    t0 = time.time()
    tex_dyn = np.asarray(dyn.advance(args.t, 0.1))
    dyn_s = time.time() - t0

    print(f"state build:            {build_s * 1000:8.1f} ms (once)")
    print(f"1) parametric roll:     {roll_s * 1000:8.1f} ms/frame")
    print(f"2) full regeneration:   {regen_s * 1000:8.1f} ms/frame")
    print(f"3) keyframe interp:     {key_s * 1000:8.1f} ms (2 keys + lerp)")
    print(f"4) lifecycle dynamic:   {dyn_s * 1000:8.1f} ms/frame")
    diff = np.abs(tex_keyframe - tex_roll)
    print(f"keyframe-vs-roll error: mean {diff.mean():.4f} max {diff.max():.3f}")

    for name, tex in (("roll", tex_roll), ("keyframe", tex_keyframe),
                      ("dynamic", tex_dyn)):
        save_image(tex[..., :3] * tex[..., 3:4],
                   os.path.join(args.out, f"tex_{name}.png"))

    # --- per-component visualization ------------------------------------
    comp = np.asarray(state.comp)
    for idx, name in enumerate(COMPONENT_NAMES):
        plane = comp[idx]
        peak = plane.max() + 1e-9
        save_image(np.repeat((plane / peak)[..., None], 3, -1),
                   os.path.join(args.out, f"comp_{idx:02d}_{name}.png"))
    print(f"Wrote textures + 13 component maps to {args.out}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
