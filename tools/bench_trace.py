#!/usr/bin/env python3
"""Geodesic-integrator throughput benchmark: Mray-steps/s on one chip.

BASELINE.json tracks two metrics: 1080p frames/sec/chip (bench.py) and
geodesic RK4 Mray-steps/s (this tool). A "ray-step" is one useful RK4
step of one ray — frozen lanes inside the kernel's lock-step tiles are
NOT counted, so the number reflects delivered physics throughput, not
lane occupancy. Step counts come from the kernel itself
(record_step_counts=True); timing comes from the production kernel
(counting off) so the metric matches what renders actually run.

Reference anchor: the reference's historical measurement is ~150
steps/ray at 640x360 in ~18 s on CPU (docs/design.md:210-216), i.e.
~2 Mray-steps/s.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--aa", action="store_true",
                    help="trace with ray-differential transport (the AA "
                         "path: +2 Jacobian RK4 systems per step)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bhr_tpu.config import escape_radius

    from bhr_tpu.camera import build_camera
    from bhr_tpu.ops.geodesic_pallas import (
        camera_params,
        trace_geodesics_pallas,
    )
    from bhr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    W, H = 1920, 1080
    cam = build_camera([6.0, 0.0, 0.5], 90.0, W, H)
    cp = jnp.asarray(camera_params(cam))
    kw = dict(
        width=W, height=H, h_base=0.1,
        r_escape=escape_radius(10.0, [6.0, 0.0, 0.5]),  # production formula
        tilt_deg=15.0,
        r_inner=2.0, r_outer=15.0, with_differentials=args.aa,
    )

    # Total useful RK4 steps for this frame (counted once, by the kernel).
    counted = trace_geodesics_pallas(cp, record_step_counts=True, **kw)
    total_steps = int(np.asarray(counted.steps, dtype=np.int64).sum())

    # Time the production kernel (no counter) over a batch to amortize
    # the dispatch round-trip.
    batch = 8

    @jax.jit
    def run(c):
        def one(i, acc):
            # Perturb the camera by a sub-micro-radian per iteration so
            # XLA cannot hoist the (otherwise loop-invariant) trace out
            # of the loop; the physics workload is unchanged.
            ci = c.at[12].add(i.astype(jnp.float32) * 1e-12)
            t = trace_geodesics_pallas(ci, **kw)
            return acc + jnp.sum(t.hit_count)
        return jax.lax.fori_loop(0, batch, one, jnp.int32(0))

    float(run(cp))  # compile + warm
    t0 = time.perf_counter()
    float(run(cp))
    dt = (time.perf_counter() - t0) / batch

    mray_steps = total_steps / dt / 1e6
    print(json.dumps({
        "metric": "geodesic_rk4_mray_steps_per_s"
                  + ("_aa" if args.aa else ""),
        "value": round(mray_steps, 1),
        "unit": "Mray-steps/s",
        "steps_per_frame": total_steps,
        "trace_ms": round(dt * 1e3, 2),
        "mean_steps_per_ray": round(total_steps / (W * H), 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
