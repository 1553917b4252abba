"""External asset loaders: skybox / disk texture file paths.

Reference parity: load_disk_texture + compute_edge_alpha
(render.py:420-459) and load_or_generate_skybox (render.py:344-413).
"""

import os

import numpy as np
import pytest

from bhr_tpu.models.skybox import _GENERATOR_VERSION, load_or_generate_skybox

_CACHE_NAME = f"skybox_v{_GENERATOR_VERSION}_128x64_1_50.npy"
from bhr_tpu.utils.io import compute_edge_alpha, load_disk_texture


@pytest.fixture
def png_assets(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    sky = (rng.random((64, 128, 3)) * 255).astype(np.uint8)
    sky_p = tmp_path / "sky.png"
    Image.fromarray(sky).save(sky_p)
    disk = (rng.random((32, 96, 3)) * 255).astype(np.uint8)
    disk_p = tmp_path / "disk.png"
    Image.fromarray(disk).save(disk_p)
    return str(sky_p), str(disk_p)


def test_load_disk_texture_adds_softened_alpha(png_assets):
    _, disk_p = png_assets
    tex = load_disk_texture(disk_p)
    assert tex.shape == (32, 96, 4)
    assert tex.dtype == np.float32
    alpha = tex[..., 3]
    # Edge softening: zero at both radial edges, solid in the middle.
    np.testing.assert_allclose(alpha[0], 0.0, atol=1e-6)
    assert alpha[16].min() > 0.9
    np.testing.assert_allclose(
        alpha, np.broadcast_to(compute_edge_alpha(32)[:, None], alpha.shape)
    )


def test_load_disk_texture_missing_returns_none(tmp_path):
    assert load_disk_texture(None) is None
    assert load_disk_texture(str(tmp_path / "nope.png")) is None


def test_load_external_skybox(png_assets):
    sky_p, _ = png_assets
    tex, h, w = load_or_generate_skybox(sky_p)
    assert (h, w) == (64, 128)
    assert tex.shape == (64, 128, 3)
    assert tex.dtype == np.float32
    assert 0.0 <= tex.min() and tex.max() <= 1.0


def test_generate_when_no_path(tmp_path):
    cache = str(tmp_path / "cache")
    tex, h, w = load_or_generate_skybox(None, tex_w=128, tex_h=64,
                                        n_stars=50, seed=1, cache_dir=cache)
    assert tex.shape == (64, 128, 3)
    assert tex.max() > 0
    # Second call must hit the .npy cache and return identical pixels.
    assert os.path.isfile(os.path.join(cache, _CACHE_NAME))
    tex2, _, _ = load_or_generate_skybox(None, tex_w=128, tex_h=64,
                                         n_stars=50, seed=1, cache_dir=cache)
    assert np.array_equal(tex, tex2)
    # A different seed keys a different entry (no false hit).
    tex3, _, _ = load_or_generate_skybox(None, tex_w=128, tex_h=64,
                                         n_stars=50, seed=2, cache_dir=cache)
    assert not np.array_equal(tex, tex3)


def test_skybox_cache_corrupt_entry_regenerates(tmp_path):
    cache = str(tmp_path / "cache")
    os.makedirs(cache)
    with open(os.path.join(cache, _CACHE_NAME), "wb") as f:
        f.write(b"not an npy file")
    tex, _, _ = load_or_generate_skybox(None, tex_w=128, tex_h=64,
                                        n_stars=50, seed=1, cache_dir=cache)
    assert tex.shape == (64, 128, 3)
    assert tex.max() > 0


def test_skybox_cache_disabled(tmp_path):
    tex, _, _ = load_or_generate_skybox(None, tex_w=128, tex_h=64,
                                        n_stars=50, seed=1, cache_dir=None)
    assert tex.shape == (64, 128, 3)


def test_edge_alpha_profile():
    a = compute_edge_alpha(100)
    assert a[0] == 0.0 and a[-1] < 0.05
    assert a[50] == 1.0
    # Monotone ramp-in and falloff-out.
    assert (np.diff(a[:10]) >= 0).all()
    assert (np.diff(a[80:]) <= 0).all()
