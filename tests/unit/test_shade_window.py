"""Windowed ghost-slot shading must be exact vs the full-frame pass.

shade_frame(image_shape=...) shades hit slots >= 1 over a dynamically
positioned h/2 x w/2 crop when that window covers every multi-crossing
ray, and falls back to the full pass otherwise. Both regimes must
reproduce shade_frame(image_shape=None) bit-for-bit — the window is a
pure gather-count optimization (multi-crossing rays cluster around the
photon ring; reference behavior at render.py:2992-3018 accumulates all
crossings identically for every pixel).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bhr_tpu.ops.geodesic import HIT_FEATURES, TraceResult
from bhr_tpu.ops.sampling import build_mipmaps, pack_quad, pack_quad_mips
from bhr_tpu.pipeline import shade_frame

H, W = 16, 24
R_INNER, R_OUTER, TILT = 2.0, 3.5, 15.0


def _assets(rng):
    sky = rng.random((8, 16, 3)).astype(np.float32)
    tex = rng.random((8, 32, 4)).astype(np.float32)
    skybox_q = pack_quad(jnp.asarray(sky))
    qmips = pack_quad_mips(build_mipmaps(jnp.asarray(tex), levels=2))
    return skybox_q, qmips


def _synthetic_trace(rng, ghost_pixels):
    """A trace where `ghost_pixels` (list of (row, col)) have 2 disk
    crossings, a central blob has 1, and the rest escape cleanly."""
    n = H * W
    hit_count = np.zeros((H, W), np.int32)
    hit_count[H // 2 - 2 : H // 2 + 2, W // 2 - 3 : W // 2 + 3] = 1
    for (r, c) in ghost_pixels:
        hit_count[r, c] = 2
    hit_count = hit_count.reshape(n)

    hits = np.zeros((4, HIT_FEATURES, n), np.float32)
    # Plausible in-disk hit coordinates + unit-ish ray directions.
    rr = R_INNER + (R_OUTER - R_INNER) * rng.random((2, n))
    phi = 2 * np.pi * rng.random((2, n))
    for k in range(2):
        hits[k, 0] = (rr[k] * np.cos(phi[k])).astype(np.float32)
        hits[k, 1] = (rr[k] * np.sin(phi[k])).astype(np.float32)
        d = rng.normal(size=(3, n)).astype(np.float32)
        d /= np.linalg.norm(d, axis=0, keepdims=True) + 1e-6
        hits[k, 2:5] = d
        hits[k, 11] = rng.random(n).astype(np.float32)

    escaped = rng.random(n) > 0.2
    esc_dir = rng.normal(size=(n, 3)).astype(np.float32)
    esc_dir /= np.linalg.norm(esc_dir, axis=1, keepdims=True) + 1e-6
    esc_dir *= escaped[:, None]

    return TraceResult(
        captured=jnp.asarray(~escaped),
        escaped=jnp.asarray(escaped),
        escape_dir=jnp.asarray(esc_dir),
        hit_count=jnp.asarray(hit_count),
        hits=jnp.asarray(hits),
        steps=jnp.zeros((), jnp.int32),
    )


def _shade(trace, skybox_q, qmips, image_shape, use_lod=False):
    return shade_frame(
        trace, skybox_q, qmips, 3, jnp.asarray([6.0, 0.0, 0.5]),
        r_inner=R_INNER, r_outer=R_OUTER, tilt_deg=TILT,
        t_offset=jnp.float32(0.3), use_lod=use_lod, aa_strength=1.0,
        image_shape=image_shape,
    )


@pytest.mark.parametrize("use_lod", [False, True])
def test_window_covered_matches_full(use_lod):
    """Ghosts clustered centrally -> the crop window covers them."""
    rng = np.random.default_rng(7)
    skybox_q, qmips = _assets(rng)
    ghosts = [(H // 2, W // 2), (H // 2 + 1, W // 2 - 2), (H // 2 - 1, W // 2 + 1)]
    trace = _synthetic_trace(rng, ghosts)
    ref = _shade(trace, skybox_q, qmips, None, use_lod)
    win = _shade(trace, skybox_q, qmips, (H, W), use_lod)
    for a, b in zip(ref, win):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_window_fallback_matches_full():
    """Ghosts in opposite corners -> no h/2 x w/2 window covers them;
    the fallback full pass must fire and stay exact."""
    rng = np.random.default_rng(8)
    skybox_q, qmips = _assets(rng)
    ghosts = [(0, 0), (H - 1, W - 1)]
    trace = _synthetic_trace(rng, ghosts)
    ref = _shade(trace, skybox_q, qmips, None)
    win = _shade(trace, skybox_q, qmips, (H, W))
    for a, b in zip(ref, win):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_window_no_ghosts_matches_full():
    """No multi-crossing rays at all: ghost slots are skipped outright."""
    rng = np.random.default_rng(9)
    skybox_q, qmips = _assets(rng)
    trace = _synthetic_trace(rng, [])
    ref = _shade(trace, skybox_q, qmips, None)
    win = _shade(trace, skybox_q, qmips, (H, W))
    for a, b in zip(ref, win):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_window_v2_matches_full():
    """shade_frame_v2 ghost-slot windowing is exact too."""
    from bhr_tpu.models.disk_v2.params import DiskV2Params
    from bhr_tpu.pipeline import shade_frame_v2

    rng = np.random.default_rng(11)
    skybox_q, _ = _assets(rng)
    ghosts = [(H // 2, W // 2), (H // 2 + 1, W // 2 + 2)]
    trace = _synthetic_trace(rng, ghosts)
    params = DiskV2Params(r_in=R_INNER, r_out=R_OUTER)

    def shade(image_shape):
        return shade_frame_v2(
            trace, skybox_q, jnp.asarray([6.0, 0.0, 0.5]),
            v2_params=params, v2_structure=None, tilt_deg=TILT,
            t_offset=jnp.float32(0.1), image_shape=image_shape,
        )

    ref = shade(None)
    win = shade((H, W))
    # Structure normalization is a fixed lattice constant (see
    # structure_modulations.py), so windowed and full passes evaluate
    # identical per-lane math; the remaining tolerance covers fp
    # reassociation from XLA fusing the cropped shapes differently.
    # The V1 texture path IS bit-exact.
    for a, b in zip(ref, win):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=0
        )


def test_window_real_trace_matches_full():
    """End-to-end on a real traced scene (ghost arcs near the ring)."""
    from bhr_tpu.camera import build_camera
    from bhr_tpu.ops import geodesic

    rng = np.random.default_rng(10)
    skybox_q, qmips = _assets(rng)
    w, h = 64, 36
    cam = build_camera([6.0, 0.0, 0.5], 60.0, w, h)
    dirs, ddx, ddy = geodesic.primary_rays(cam)
    trace = geodesic.trace_geodesics(
        jnp.asarray(cam.pos), dirs,
        h_base=0.1, r_escape=12.04, tilt_deg=TILT,
        r_inner=R_INNER, r_outer=R_OUTER,
        with_differentials=False, d_dir_dx0=ddx, d_dir_dy0=ddy,
    )
    assert int(jnp.sum(trace.hit_count >= 2)) > 0, "scene should have ghosts"
    ref = _shade(trace, skybox_q, qmips, None)
    win = _shade(trace, skybox_q, qmips, (h, w))
    for a, b in zip(ref, win):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
