"""Pallas ray-march kernel vs pure-JAX integrator parity (interpret mode).

On CPU the kernel runs through the Pallas interpreter; on real TPU the
same assertions hold for the compiled kernel (checked manually / by
bench). Categorical outputs (captured/escaped/hit counts) must match
exactly; float outputs to fp-reassociation tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bhr_tpu.camera import build_camera
from bhr_tpu.ops import geodesic
from bhr_tpu.ops.geodesic_pallas import camera_params, trace_geodesics_pallas


@pytest.mark.parametrize(
    "with_diff,exit_check_every",
    # exit_check_every=8 is the PRODUCTION unroll (interpret defaults to
    # 1): termination gating inside the unrolled block must be a no-op
    # for results — overrun steps freeze state and step counts exactly.
    [(False, 1), (True, 1), (False, 8), (True, 8)],
)
def test_pallas_matches_pure_jax(with_diff, exit_check_every):
    W, H = 128, 32
    cam = build_camera([6.0, 0.0, 0.5], 60.0, W, H)
    kw = dict(
        h_base=0.2, r_escape=12.04, tilt_deg=15.0, r_inner=2.0, r_outer=3.5,
        with_differentials=with_diff,
    )
    res = trace_geodesics_pallas(
        jnp.asarray(camera_params(cam)), width=W, height=H,
        interpret=True, exit_check_every=exit_check_every, **kw,
    )
    dirs, ddx, ddy = geodesic.primary_rays(cam)
    ref = geodesic.trace_geodesics(
        jnp.asarray(cam.pos), dirs, d_dir_dx0=ddx, d_dir_dy0=ddy, **kw
    )

    np.testing.assert_array_equal(np.asarray(res.captured), np.asarray(ref.captured))
    np.testing.assert_array_equal(np.asarray(res.escaped), np.asarray(ref.escaped))
    np.testing.assert_array_equal(
        np.asarray(res.hit_count), np.asarray(ref.hit_count)
    )
    np.testing.assert_allclose(
        np.asarray(res.escape_dir), np.asarray(ref.escape_dir), atol=2e-3
    )
    # Hit positions agree to fp tolerance on recorded slots.
    mask = np.asarray(ref.hit_count)  # (N,)
    hits_p = np.asarray(res.hits)  # (K, F, N)
    hits_r = np.asarray(ref.hits)
    for k in range(hits_r.shape[0]):
        sel = mask > k
        if sel.any():
            np.testing.assert_allclose(
                hits_p[k, :2, sel], hits_r[k, :2, sel], atol=2e-3
            )
            if with_diff:
                np.testing.assert_allclose(
                    hits_p[k, 5:11, sel], hits_r[k, 5:11, sel], atol=5e-3
                )


def test_pallas_padding_cropped():
    """Non-multiple-of-block sizes pad internally and crop correctly."""
    W, H = 100, 20  # not multiples of (16, 128)
    cam = build_camera([6.0, 0.0, 0.5], 60.0, W, H)
    res = trace_geodesics_pallas(
        jnp.asarray(camera_params(cam)), width=W, height=H,
        h_base=0.2, r_escape=12.04, interpret=True,
        r_inner=2.0, r_outer=3.5,
    )
    assert res.captured.shape == (W * H,)
    assert res.hits.shape[2] == W * H
    # Every ray resolved (tiny scene, generous budget).
    assert bool((res.captured | res.escaped).all())


@pytest.mark.parametrize("tilt_deg", [25.0, 40.0, 60.0])
def test_pallas_matches_pure_jax_high_tilt(tilt_deg):
    """High-tilt parity: the slim-phase outgoing gate must clear the
    TILTED disk rim (3-D radius up to r_outer/cos(tilt)), not the
    equatorial r_outer — regression test for the round-2 bug where
    tilt > ~18 deg made the slim phase skip recordable crossings
    (observed: 263 Pallas hits vs 270 oracle hits at tilt=40)."""
    W, H = 128, 48
    cam = build_camera([6.0, 0.0, 0.5], 60.0, W, H)
    kw = dict(
        h_base=0.2, r_escape=12.04, tilt_deg=tilt_deg, r_inner=2.0,
        r_outer=3.5, with_differentials=False,
    )
    res = trace_geodesics_pallas(
        jnp.asarray(camera_params(cam)), width=W, height=H,
        interpret=True, exit_check_every=8, **kw,
    )
    dirs, _, _ = geodesic.primary_rays(cam)
    ref = geodesic.trace_geodesics(jnp.asarray(cam.pos), dirs, **kw)

    np.testing.assert_array_equal(np.asarray(res.captured), np.asarray(ref.captured))
    np.testing.assert_array_equal(np.asarray(res.escaped), np.asarray(ref.escaped))
    np.testing.assert_array_equal(
        np.asarray(res.hit_count), np.asarray(ref.hit_count)
    )
    assert int(np.asarray(ref.hit_count).sum()) > 0  # scene actually hits


@pytest.mark.parametrize("exit_check_every", [1, 8])
def test_step_counts_match_pure_jax(exit_check_every):
    """Per-ray RK4 step counts agree between the kernel and pure JAX.

    Counting semantics: a ray's count is the number of steps it was
    active for; frozen (terminated) rays stop counting even though the
    unrolled exit-check blocks keep executing their lanes (covered
    here by the exit_check_every=8 production-unroll case, including
    the max_iter gate on block overrun).
    """
    W, H = 128, 32
    cam = build_camera([6.0, 0.0, 0.5], 60.0, W, H)
    kw = dict(h_base=0.2, r_escape=12.04, tilt_deg=15.0, r_inner=2.0,
              r_outer=3.5, record_step_counts=True)
    res = trace_geodesics_pallas(
        jnp.asarray(camera_params(cam)), width=W, height=H,
        interpret=True, exit_check_every=exit_check_every, **kw,
    )
    dirs, _, _ = geodesic.primary_rays(cam)
    ref = geodesic.trace_geodesics(jnp.asarray(cam.pos), dirs, **kw)

    steps_p = np.asarray(res.steps)
    steps_r = np.asarray(ref.steps)
    assert steps_p.shape == (W * H,)
    np.testing.assert_array_equal(steps_p, steps_r)
    assert steps_p.min() >= 1
    # Near-hole rays integrate longer than typical rays (the ratio
    # grows with resolution; modest at this 128x32 test scene).
    assert steps_p.max() > 1.5 * np.median(steps_p)
