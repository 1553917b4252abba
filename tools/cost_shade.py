#!/usr/bin/env python3
"""XLA cost analysis of the FHD deferred-shade program.

Prints flops / bytes-accessed estimates from the compiled module, plus
the roofline times they imply on v5e (~819 GB/s HBM, ~3.9 T f32 op/s
VPU) — tells whether shade is gather-, bandwidth-, or compute-bound.
"""

import sys

sys.path.insert(0, ".")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from bhr_tpu.pipeline import shade_frame
    from bhr_tpu.utils.cache import enable_compile_cache
    from tools._diag_scene import fhd_shade_avals

    enable_compile_cache()
    # Abstract inputs: lower()/cost_analysis only need avals — skip the
    # minutes of asset generation + device trace the timing tools need.
    W, H, cp, skybox_q, qmips, trace = fhd_shade_avals()

    def shade(trace, skybox_q, qmips):
        bg, disk, _ = shade_frame(
            trace, skybox_q, qmips, 4, cp[0:3],
            r_inner=2.0, r_outer=15.0, tilt_deg=15.0,
            t_offset=jnp.float32(0.0), use_lod=False, aa_strength=1.0,
            image_shape=(H, W),
        )
        return bg + disk

    lowered = jax.jit(shade).lower(trace, skybox_q, qmips)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))
    print(f"flops: {flops/1e9:.2f} G")
    print(f"bytes accessed: {bytes_acc/1e9:.3f} GB")
    print(f"roofline: compute {flops/3.9e12*1e3:.2f} ms | "
          f"HBM {bytes_acc/819e9*1e3:.2f} ms")
    for k, v in sorted(ca.items()):
        if isinstance(v, float) and v > 1e6 and "bytes accessed" in k:
            print(f"  {k}: {v/1e6:.1f} MB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
