"""E2E golden-scene tests (CPU backend, deterministic)."""

import hashlib
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from e2e_render import (  # noqa: E402
    MAX_ABS_TOL,
    MEAN_ABS_TOL,
    OUTLIER_FRAC,
    golden_path,
    render_e2e_scene,
)


@pytest.mark.slow
def test_e2e_scene_deterministic_and_sane():
    img = render_e2e_scene()
    assert img.shape == (180, 320, 3)
    assert np.isfinite(img).all()
    assert 0.0 <= img.min() and img.max() <= 1.0
    # Scene content: black-hole shadow (the disk crosses the exact
    # center at this tilt, so assert a dominant dark fraction) + ring.
    h, w = 180, 320
    center = img[h // 2 - 16 : h // 2 + 16, w // 2 - 16 : w // 2 + 16]
    dark_frac = (center.sum(axis=-1) < 0.05).mean()
    assert dark_frac > 0.5, f"shadow should dominate the center ({dark_frac})"
    assert img.max() > 0.5, "photon ring should be bright"
    assert (img.sum(axis=-1) > 0.02).mean() > 0.05

    img2 = render_e2e_scene()
    np.testing.assert_array_equal(img, img2)


def _check_scene_golden(scene: str):
    """Same contract as e2e_render.verify(): bit-exact short-circuit,
    then the shared tolerance bounds (single source of the literals)."""
    path = golden_path(scene)
    if not os.path.exists(path):
        import pytest

        pytest.skip(f"no {scene} golden for this backend yet")
    data = np.load(path, allow_pickle=True)
    golden = data["image"]
    img = render_e2e_scene(scene)
    if hashlib.md5(img.tobytes()).hexdigest() == str(data["md5"]):
        return
    diff = np.abs(img.astype(np.float64) - golden.astype(np.float64))
    assert diff.max() <= MAX_ABS_TOL, diff.max()
    assert diff.mean() <= MEAN_ABS_TOL, diff.mean()
    outliers = (diff > 10 * MEAN_ABS_TOL).mean()
    assert outliers <= OUTLIER_FRAC, outliers


def test_e2e_matches_golden_if_present():
    _check_scene_golden("default")


def test_e2e_aa_matches_golden_if_present():
    # Same scene with ray-differential AA: covers the diff-RK4
    # transport and mip-LOD sampling paths the non-AA golden never
    # touches.
    _check_scene_golden("aa")


def test_e2e_v2_matches_golden_if_present():
    # Same geometry through the disk_v2 volume renderer: pins the slab
    # radiative transfer, structure modulation, and palette paths.
    _check_scene_golden("v2")


def test_e2e_v2sci_matches_golden_if_present():
    # V2 with the scientific palette AND the structure modulation layer
    # (m=1/m=2 modes + shear texture + hotspots) — the full
    # DiskV2StructureParams surface, reachable via --v2_structure.
    _check_scene_golden("v2sci")


def test_e2e_flare_matches_golden_if_present():
    # Same scene with the lens-flare stack: pins the ghost blobs,
    # diffraction rings, hex aperture, and star streaks of
    # ops/lens_flare.py, which the other families never execute.
    _check_scene_golden("flare")


@pytest.mark.slow
def test_e2e_video_matches_golden_if_present():
    # The sharded video engine end-to-end (orbit cameras, packed
    # lifecycle params, batched shard_map render, async PNG writes):
    # frames 0 and 4 of a tiny 8-frame orbit, as read back from the
    # engine's PNG output. The still families never execute this path.
    _check_scene_golden("video")


def test_e2e_cli_alias_conflict_rejected(monkeypatch):
    """`--scene v2 --aa` must raise through main(), not silently verify
    the aa golden family (regression: main() resolved the alias before
    the _scene_name conflict guard could see it)."""
    import sys

    import e2e_render

    monkeypatch.setattr(
        sys, "argv", ["e2e_render.py", "--verify", "--scene", "v2", "--aa"]
    )
    with pytest.raises(ValueError, match="conflicts"):
        e2e_render.main()
