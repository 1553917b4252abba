"""Procedural skybox tests (statistical, seeded)."""

import numpy as np

from bhr_tpu.models.skybox import _galactic_latitude, generate_skybox


def test_shape_range_dtype():
    sky = generate_skybox(256, 128, seed=42, n_stars=300)
    assert sky.shape == (128, 256, 3)
    assert sky.dtype == np.float32
    assert sky.min() >= 0.0 and sky.max() <= 1.0


def test_deterministic_by_seed():
    a = generate_skybox(128, 64, seed=7, n_stars=100)
    b = generate_skybox(128, 64, seed=7, n_stars=100)
    np.testing.assert_array_equal(a, b)
    c = generate_skybox(128, 64, seed=8, n_stars=100)
    assert not np.array_equal(a, c)


def test_galactic_plane_brighter():
    """Pixels near the galactic plane should be brighter on average
    (star density enhancement + Milky-Way glow)."""
    tex_w, tex_h = 512, 256
    sky = generate_skybox(tex_w, tex_h, seed=42, n_stars=2000)
    v = np.linspace(0, np.pi, tex_h)
    u = np.linspace(0, 2 * np.pi, tex_w)
    uu, vv = np.meshgrid(u, v)
    b = _galactic_latitude(np.pi / 2 - vv, uu)
    lum = sky.mean(axis=-1)
    near = lum[np.abs(b) < np.radians(8)].mean()
    far = lum[np.abs(b) > np.radians(40)].mean()
    assert near > far * 1.5, (near, far)


def test_stars_present():
    sky = generate_skybox(256, 128, seed=42, n_stars=500)
    # Bright star pixels well above background floor.
    assert (sky.max(axis=-1) > 0.5).sum() > 50
