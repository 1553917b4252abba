"""Robustness smoke tests: extreme-but-legal scene configurations.

Every config must render without NaN/Inf and produce a non-degenerate
image. Mirrors the reference's CLI validation envelope
(render.py:4586-4616): fov in (0, 180), ar1 < ar2, step > 0.
"""

import numpy as np
import pytest

import bhr_tpu
from bhr_tpu.models.skybox import generate_skybox

W, H = 96, 64
SKY = None


def _sky():
    global SKY
    if SKY is None:
        SKY = generate_skybox(256, 128, seed=5, n_stars=200)
    return SKY


def _disk(n_r=24, n_phi=64):
    rng = np.random.default_rng(2)
    return rng.random((n_r, n_phi, 4)).astype(np.float32)


CONFIGS = [
    dict(disk_tilt=89.0),                        # near edge-on plane
    dict(fov=170.0),                             # near fisheye
    # fov=1 from r=6 sees only the shadow (angular radius ~26 deg):
    # a legitimately all-black frame.
    dict(fov=1.0, expect_black=True),
    dict(pov=(2.2, 0.0, 0.1)),                   # camera almost at r_in
    dict(pov=(40.0, 0.0, 5.0), r_max=50.0),      # far camera
    dict(disk_inner_radius=1.05, disk_outer_radius=1.2),  # thin annulus
    dict(step_size=1.0),                         # coarse integration
    dict(anti_alias="lod_radius", aa_strength=2.0),
    dict(lens_flare=True),
]


@pytest.mark.parametrize("overrides", CONFIGS)
def test_extreme_config_renders_clean(overrides):
    expect_black = overrides.pop("expect_black", False)
    cfg = bhr_tpu.SceneConfig(
        width=W, height=H, fov=overrides.pop("fov", 60.0),
        pov=overrides.pop("pov", (6.0, 0.0, 0.5)),
        disk_inner_radius=overrides.pop("disk_inner_radius", 2.0),
        disk_outer_radius=overrides.pop("disk_outer_radius", 3.5),
        n_stars=200, **overrides,
    ).validated()
    r = bhr_tpu.Renderer(cfg, _sky(), _disk())
    img = np.asarray(r.render(cfg.pov, cfg.fov))
    assert img.shape == (H, W, 3)
    assert np.isfinite(img).all()
    assert 0.0 <= img.min() and img.max() <= 1.0 + 1e-6
    if not expect_black:
        assert img.std() > 1e-4  # not a constant frame
