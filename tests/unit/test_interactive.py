"""Interactive-mode tests (headless-safe): backend dispatch, the
headless preview renderer, and the live differential toggle.

The reference's interactive mode is a ti.GUI loop (render.py:4156-4353);
the windowed matplotlib loop needs a display, so these tests cover the
pieces that run on CI hosts: dispatch policy, the headless preview, and
the pipeline contract behind the 'd' key.
"""

import glob
import os

import numpy as np
import pytest

from bhr_tpu.config import SceneConfig
from bhr_tpu.interactive import run_headless_preview, run_interactive


@pytest.fixture()
def tiny_cfg():
    return SceneConfig(
        width=64, height=36, fov=60.0, step_size=0.3, n_stars=100,
        disk_inner_radius=2.0, disk_outer_radius=3.5, disk_tilt=15.0,
        interactive=True,
    ).validated()


def test_headless_preview_renders_frames(tiny_cfg, tmp_path):
    out = str(tmp_path / "preview")
    run_headless_preview(tiny_cfg, n_frames=2, out_dir=out)
    frames = sorted(glob.glob(os.path.join(out, "preview_*.png")))
    assert len(frames) == 2
    from PIL import Image

    img = np.asarray(Image.open(frames[0]))
    assert img.shape == (36, 64, 3)
    assert img.max() > 8  # disk/ring visible, not a black frame


def test_headless_backend_env_dispatches_to_preview(tiny_cfg, monkeypatch):
    """MPLBACKEND=agg 'succeeds' without a window, so dispatch must
    route straight to the headless preview."""
    called = {}
    monkeypatch.setenv("MPLBACKEND", "agg")
    monkeypatch.setattr(
        "bhr_tpu.interactive.run_headless_preview",
        lambda config, **kw: called.setdefault("headless", True),
    )
    run_interactive(tiny_cfg)
    assert called == {"headless": True}


def test_window_failure_falls_back_but_loop_errors_propagate(
    tiny_cfg, monkeypatch
):
    """Only window creation falls back to the headless preview; an
    error from the render loop itself must propagate (regression: a
    blanket except swallowed mid-session errors and masked them with a
    minutes-long preview render)."""
    import bhr_tpu.interactive as imod

    monkeypatch.setenv("MPLBACKEND", "TkAgg")  # GUI backend: try window
    called = {}
    monkeypatch.setattr(
        imod, "run_headless_preview",
        lambda config, **kw: called.setdefault("headless", True),
    )

    # Window creation fails -> headless fallback.
    monkeypatch.setattr(
        imod, "_open_window",
        lambda config: (_ for _ in ()).throw(ImportError("no tk")),
    )
    run_interactive(tiny_cfg)
    assert called == {"headless": True}

    # Window opens but the loop raises -> error propagates, no preview.
    called.clear()
    monkeypatch.setattr(imod, "_open_window", lambda config: object())
    monkeypatch.setattr(
        imod, "_run_matplotlib",
        lambda config, window: (_ for _ in ()).throw(
            RuntimeError("mid-session device error")
        ),
    )
    with pytest.raises(RuntimeError, match="mid-session"):
        run_interactive(tiny_cfg)
    assert called == {}


def test_force_differentials_switches_lod_path(tiny_cfg):
    """The pipeline contract behind the interactive 'd' key: with
    anti_alias=disabled, force_differentials=True must actually render
    the differential+mip-LOD variant (regression: the toggle was a
    no-op because use_ray_differentials gated it off)."""
    from bhr_tpu.modes import _make_renderer

    renderer, dynamic = _make_renderer(tiny_cfg)
    tex = dynamic.advance(0.0, 0.0, recompute_stats=True)
    renderer.update_disk_texture(tex)
    off = renderer.render(tiny_cfg.pov, tiny_cfg.fov,
                          force_differentials=False)
    on = renderer.render(tiny_cfg.pov, tiny_cfg.fov,
                         skip_differentials=False, force_differentials=True)
    assert np.isfinite(on).all()
    assert np.abs(on - off).max() > 1e-4, (
        "forced differentials did not change the image"
    )
