#!/usr/bin/env python3
"""Geodesic-integrator throughput benchmark: Mray-steps/s on one chip.

Thin shell over bench.time_trace — literally the bench.py methodology,
so this tool and BENCH_r{N}.json can never measure different things.

BASELINE.json tracks two metrics: 1080p frames/sec/chip (bench.py) and
geodesic RK4 Mray-steps/s (this tool). A "ray-step" is one useful RK4
step of one ray — frozen lanes inside the kernel's lock-step tiles are
NOT counted, so the number reflects delivered physics throughput, not
lane occupancy. The report includes two roofline rows from bench.py's
static per-step op model: vpu_issue_util (all issued vector ops incl.
cmp/select — lane occupancy) and vpu_mfu (arithmetic FLOPs only — the
classic MFU definition) against the v5e VPU f32 issue peak.

Reference anchor: the reference's historical measurement is ~150
steps/ray at 640x360 in ~18 s on CPU (docs/design.md:210-216), i.e.
~2 Mray-steps/s.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--aa", action="store_true",
                    help="trace with ray-differential transport (the AA "
                         "path: +2 Jacobian RK4 systems per step)")
    args = ap.parse_args()

    import bench
    from bhr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    tr = bench.time_trace(args.aa)
    tr["metric"] = ("geodesic_rk4_mray_steps_per_s"
                    + ("_aa" if args.aa else ""))
    tr["value"] = tr["mray_steps_per_s"]
    tr["unit"] = "Mray-steps/s"
    tr["ops_per_step_model"] = (
        bench.OPS_PER_STEP_AA if args.aa else bench.OPS_PER_STEP_SLIM
    )
    tr["arith_flops_per_step_model"] = (
        bench.ARITH_FLOPS_PER_STEP_AA if args.aa
        else bench.ARITH_FLOPS_PER_STEP_SLIM
    )
    tr["vpu_f32_peak_tflops"] = bench.V5E_VPU_F32_PEAK / 1e12
    print(json.dumps(tr))
    return 0


if __name__ == "__main__":
    sys.exit(main())
