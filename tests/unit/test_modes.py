"""Run-mode tests: image, video resume protocol, CLI parsing."""

import dataclasses
import glob
import json
import os

import numpy as np
import pytest

from bhr_tpu.cli import build_parser, config_from_args
from bhr_tpu.config import SceneConfig
from bhr_tpu.modes import render_image, render_video


@pytest.fixture()
def tiny_cfg(tmp_path):
    return SceneConfig(
        width=64, height=36, fov=60.0, step_size=0.3, n_stars=100,
        disk_inner_radius=2.0, disk_outer_radius=3.5, disk_tilt=15.0,
        n_frames=3, fps=2, orbit=True,
        output=str(tmp_path / "video.mp4"),
    ).validated()


def test_render_image_lifecycle(tiny_cfg):
    img = render_image(tiny_cfg)
    assert img.shape == (36, 64, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.01


@pytest.mark.slow
def test_video_writes_frames_and_progress(tiny_cfg, tmp_path):
    cfg = dataclasses.replace(tiny_cfg, video=True)
    render_video(cfg)
    frames = sorted(glob.glob(str(tmp_path / ".frames_*" / "frame_*.png")))
    assert len(frames) == 3
    progress = glob.glob(str(tmp_path / ".frames_*" / "progress.json"))[0]
    data = json.load(open(progress))
    assert sorted(data["completed"]) == [0, 1, 2]
    assert data["params"]["n_frames"] == 3


@pytest.mark.slow
def test_video_resume_skips_completed(tiny_cfg, tmp_path):
    cfg = dataclasses.replace(tiny_cfg, video=True)
    render_video(cfg)
    progress = glob.glob(str(tmp_path / ".frames_*" / "progress.json"))[0]
    data = json.load(open(progress))
    data["completed"] = [0]
    json.dump(data, open(progress, "w"))
    frame1 = glob.glob(str(tmp_path / ".frames_*" / "frame_0001.png"))[0]
    frame0 = glob.glob(str(tmp_path / ".frames_*" / "frame_0000.png"))[0]
    # Nanosecond mtime + inode: getmtime float equality can false-pass
    # on coarse-granularity filesystems when a buggy resume rewrites
    # the (deterministic) frame sub-second after the first run.
    st0 = os.stat(frame0)
    os.remove(frame1)

    render_video(dataclasses.replace(cfg, resume=True))
    # frame 1 re-rendered, frame 0 untouched
    assert os.path.exists(frame1)
    st0b = os.stat(frame0)
    assert (st0b.st_mtime_ns, st0b.st_ino) == (st0.st_mtime_ns, st0.st_ino)


@pytest.mark.slow
def test_failed_png_write_never_marked_completed(tiny_cfg, tmp_path,
                                                 monkeypatch):
    # Regression: progress.json must only record frames whose PNGs are
    # actually on disk (writer.drain() before the progress write). With
    # the old submit-then-record order, a failed async write left the
    # frame "completed" forever and resume skipped it permanently.
    import bhr_tpu.utils.io as io_mod

    real_save = io_mod.save_image
    fail_once = {"armed": True}

    def flaky_save(img, path):
        if "frame_0001" in path and fail_once["armed"]:
            fail_once["armed"] = False
            raise OSError("simulated disk-full")
        return real_save(img, path)

    monkeypatch.setattr(io_mod, "save_image", flaky_save)
    cfg = dataclasses.replace(tiny_cfg, video=True)
    with pytest.raises(OSError):
        render_video(cfg)

    # Whatever progress exists must not claim the lost frame.
    for progress in glob.glob(str(tmp_path / ".frames_*" / "progress.json")):
        assert 1 not in json.load(open(progress)).get("completed", [])

    # A resume (or restart) run must produce every frame.
    render_video(dataclasses.replace(cfg, resume=True))
    frames = sorted(glob.glob(str(tmp_path / ".frames_*" / "frame_*.png")))
    assert len(frames) == 3


def test_video_v2_disk_advances(tiny_cfg, tmp_path):
    # Regression: the sequential video path must advance the V2 volume
    # disk through the sampler's t_offset — with a static camera, two
    # frames must differ (the disk pattern advects by Omega * dt).
    cfg = dataclasses.replace(
        tiny_cfg, video=True, orbit=False, disk_model="v2", n_frames=2,
        output=str(tmp_path / "v2.mp4"),
    )
    render_video(cfg)
    from PIL import Image

    frames = sorted(glob.glob(str(tmp_path / ".frames_*" / "frame_*.png")))
    assert len(frames) == 2
    a = np.asarray(Image.open(frames[0]))
    b = np.asarray(Image.open(frames[1]))
    assert (a != b).any(), "V2 disk must rotate between video frames"


def test_refresh_stats_updates_normalization():
    # Regression: video resume replay refreshes normalization stats at
    # the last frame % 60 == 0 point so resumed frames don't render
    # with the permissive init stats.
    from bhr_tpu.models.dynamic_disk import DynamicDiskSystem

    dyn = DynamicDiskSystem(32, 64, 2.0, 3.5, seed=3)
    p98_init = float(dyn.density_p98)
    for f in range(3):
        for fac in dyn.factories.values():
            fac.tick(now=f * 0.1, dt=0.1)
    dyn.refresh_stats(0.2)
    assert float(dyn.density_p98) != p98_init
    assert np.isfinite(float(dyn.density_p98))
    assert np.isfinite(np.asarray(dyn.row_stats)).all()


@pytest.mark.slow
def test_video_param_change_invalidates(tiny_cfg, tmp_path):
    cfg = dataclasses.replace(tiny_cfg, video=True)
    render_video(cfg)
    cfg2 = dataclasses.replace(cfg, orbit_degrees=180.0, resume=True)
    render_video(cfg2)
    progress = glob.glob(str(tmp_path / ".frames_*" / "progress.json"))[0]
    data = json.load(open(progress))
    assert data["params"]["orbit_degrees"] == 180.0
    assert sorted(data["completed"]) == [0, 1, 2]


def test_video_scene_param_change_invalidates(tiny_cfg, tmp_path):
    """Scene-defining params (seed, pov...) must invalidate a resume —
    the reference's five-param set would silently keep stale frames."""
    import shutil

    from bhr_tpu.modes import (
        load_video_progress, video_resume_params, video_temp_paths,
    )

    cfg = dataclasses.replace(tiny_cfg, video=True, resume=True)
    temp_dir, progress_file = video_temp_paths(cfg.output)
    os.makedirs(temp_dir, exist_ok=True)
    params = video_resume_params(cfg)
    json.dump({"params": params, "completed": [0, 1]},
              open(progress_file, "w"))

    for changed in (
        dataclasses.replace(cfg, seed=7),
        dataclasses.replace(cfg, pov=(8.0, 0.0, 0.5)),
        dataclasses.replace(cfg, disk_tilt=30.0),
    ):
        os.makedirs(temp_dir, exist_ok=True)
        json.dump({"params": params, "completed": [0, 1]},
                  open(progress_file, "w"))
        done, _ = load_video_progress(
            changed, temp_dir, progress_file,
            video_resume_params(changed),
        )
        assert done == set(), f"stale frames kept for {changed}"
    shutil.rmtree(temp_dir, ignore_errors=True)


def test_video_cross_engine_resume_not_invalidated(tiny_cfg):
    """The 'sharded' engine marker must never wipe completed frames."""
    import shutil

    from bhr_tpu.modes import (
        load_video_progress, video_resume_params, video_temp_paths,
    )

    cfg = dataclasses.replace(tiny_cfg, video=True, resume=True)
    temp_dir, progress_file = video_temp_paths(cfg.output)
    os.makedirs(temp_dir, exist_ok=True)
    json.dump(
        {"params": video_resume_params(cfg, sharded=True),
         "completed": [0, 2]},
        open(progress_file, "w"),
    )
    done, cross = load_video_progress(
        cfg, temp_dir, progress_file, video_resume_params(cfg, sharded=False)
    )
    assert done == {0, 2}
    assert cross
    shutil.rmtree(temp_dir, ignore_errors=True)


def test_cli_defaults_match_reference():
    args = build_parser().parse_args([])
    cfg = config_from_args(args)
    assert cfg.pov == (6.0, 0.0, 0.5)
    assert cfg.fov == 90.0
    assert cfg.image_size == (1920, 1080)
    assert cfg.step_size == 0.1
    assert cfg.r_max == 10.0
    assert cfg.n_stars == 6000
    assert cfg.disk_inner_radius == 2.0
    assert cfg.disk_outer_radius == 15.0
    assert cfg.n_frames == 3600
    assert cfg.fps == 36
    assert cfg.disk_rotation_speed == 0.1


def test_cli_aliases_and_deprecated_flags():
    args = build_parser().parse_args(
        ["--ar1", "2.5", "--ar2", "4.0", "--disk_generation_scale", "4",
         "--disk_rotation_algorithm", "parametric", "--keyframes_count", "7"]
    )
    cfg = config_from_args(args)
    assert cfg.disk_inner_radius == 2.5
    assert cfg.disk_outer_radius == 4.0
    assert cfg.disk_generation_scale == 4  # accepted, ignored


def test_cli_invalid_rejected():
    args = build_parser().parse_args(["--step_size", "-1"])
    with pytest.raises(ValueError):
        config_from_args(args)


def test_cli_fov_out_of_range_rejected():
    # The reference validates BEFORE its (dead) fov % 180 line:
    # validate_args raises on fov outside (0, 180) (render.py:4589)
    # and only then __main__ computes args.fov % 180 (render.py:4625),
    # an identity for every value that survives validation.
    args = build_parser().parse_args(["--fov", "250"])
    with pytest.raises(ValueError):
        config_from_args(args)
    assert config_from_args(
        build_parser().parse_args(["--fov", "70"])
    ).fov == 70.0


def test_missing_disk_texture_raises(tiny_cfg):
    """A typo'd --disk_texture path must fail loudly instead of silently
    rendering the procedural lifecycle disk."""
    cfg = dataclasses.replace(tiny_cfg, disk_texture="no/such/file.png")
    with pytest.raises(FileNotFoundError, match="no/such/file.png"):
        render_image(cfg)


@pytest.mark.slow
def test_corrupt_progress_json_restarts(tiny_cfg, tmp_path):
    """A truncated progress.json (pre-atomic-write runs, disk faults)
    restarts the video instead of crashing the resume path."""
    cfg = dataclasses.replace(tiny_cfg, video=True)
    render_video(cfg)
    progress = glob.glob(str(tmp_path / ".frames_*" / "progress.json"))[0]
    with open(progress, "w") as f:
        f.write('{"params": {"n_fra')  # truncated mid-write
    render_video(dataclasses.replace(cfg, resume=True))
    data = json.load(open(progress))
    assert sorted(data["completed"]) == [0, 1, 2]


def test_video_renderer_pins_scene_escape_radius(tiny_cfg, monkeypatch):
    """Sequential video must pin r_escape to the scene constant:
    recomputing it per frame from the orbit camera drifts by ulps and
    each distinct value recompiles the whole jitted trace."""
    import bhr_tpu.modes as modes_mod
    from bhr_tpu.config import scene_escape_radius

    captured = {}
    real = modes_mod._make_renderer

    def spy(config, r_escape_quantum=0.0, r_escape_override=None):
        captured["override"] = r_escape_override
        return real(config, r_escape_quantum, r_escape_override)

    monkeypatch.setattr(modes_mod, "_make_renderer", spy)
    # frame_shards=1 forces the sequential engine (the sharded engine
    # uses scene_escape_radius directly and never calls _make_renderer).
    cfg = dataclasses.replace(
        tiny_cfg, video=True, n_frames=1, frame_shards=1
    )
    render_video(cfg)
    assert captured["override"] == scene_escape_radius(cfg)


def test_pov_inside_horizon_rejected():
    # Horizon is at r = RS = 1.0 (reference units, rs = 1).
    for pov in [(0.0, 0.0, 0.0), (0.5, 0.5, 0.5), (1.0, 0.0, 0.0)]:
        with pytest.raises(ValueError, match="event"):
            SceneConfig(pov=pov).validated()
    SceneConfig(pov=(1.1, 0.0, 0.0)).validated()  # just outside: fine


def test_cli_multihost_rank_flags_require_coordinator():
    # Omitting --coordinator_address on one host of a fleet must fail
    # loud: a silent single-process run would race the real fleet's
    # temp dir and progress file (cli.py guard).
    from bhr_tpu.cli import main

    for flags in (["--num_processes", "2"], ["--process_id", "0"],
                  ["--num_processes", "2", "--process_id", "1"]):
        with pytest.raises(SystemExit) as exc:
            main(flags + ["-o", "x.png"])
        assert exc.value.code == 2  # argparse error exit


def test_render_image_auto_disk_texture_uses_cache(tiny_cfg, monkeypatch,
                                                   tmp_path):
    """--disk_texture auto renders with the generated-and-cached static
    texture: first run writes one .npy under the cache dir, second run
    loads it without regenerating."""
    import bhr_tpu.utils.cache as cache_mod

    cache_dir = tmp_path / "texcache"
    monkeypatch.setattr(cache_mod, "DEFAULT_CACHE_DIR", str(cache_dir))
    cfg = dataclasses.replace(tiny_cfg, disk_texture="auto")

    img = render_image(cfg)
    assert img.shape == (36, 64, 3)
    assert np.isfinite(img).all()
    cached = list(cache_dir.iterdir())
    assert len(cached) == 1 and cached[0].suffix == ".npy"

    calls = []
    import bhr_tpu.models.disk_texture as dt

    orig = dt.generate_disk_texture
    monkeypatch.setattr(dt, "generate_disk_texture",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    img2 = render_image(cfg)
    assert calls == []  # cache hit: no regeneration
    np.testing.assert_array_equal(img, img2)


def test_resume_params_key_generation_scale(tiny_cfg):
    """The resolved generation scale is frame content (it is
    size-adaptive): dynamic-texture videos must key it into resume
    invalidation; external-texture and V2 runs have no such knob."""
    from bhr_tpu.modes import video_resume_params

    p = video_resume_params(tiny_cfg)
    assert p["generation_scale"] == 2  # small texture -> scale 2
    ext = dataclasses.replace(tiny_cfg, disk_texture="x.png",
                              video=False)
    assert "generation_scale" not in video_resume_params(ext)
    v2 = dataclasses.replace(tiny_cfg, disk_model="v2")
    assert "generation_scale" not in video_resume_params(v2)
