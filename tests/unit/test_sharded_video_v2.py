"""V2 through the sharded video engine (VERDICT r3 #1).

The reference's video semantics (/root/reference/render.py:4437-4476)
apply to every disk model the framework offers; these tests pin that the
V2 volume model renders through the mesh-sharded engine — not a silent
fallback to the sequential per-frame loop — and that both engines
produce the same frames.
"""

import os

import numpy as np
import pytest

from bhr_tpu.config import SceneConfig


def _v2_video_cfg(tmp_path, name, **overrides):
    kwargs = dict(
        width=32, height=16, fov=60.0, step_size=0.3, n_stars=64,
        disk_inner_radius=2.0, disk_outer_radius=3.5, disk_tilt=15.0,
        disk_model="v2", video=True, orbit=True, n_frames=6, fps=4,
        output=str(tmp_path / name),
    )
    kwargs.update(overrides)
    return SceneConfig(**kwargs).validated()


def test_v2_video_is_sharded_eligible():
    """Explicit --frame_shards with --disk_model v2 routes to the
    sharded engine (the round-3 silent sequential fallback is gone)."""
    from bhr_tpu.modes import sharded_video_eligible

    cfg = SceneConfig(disk_model="v2", video=True, frame_shards=4)
    assert sharded_video_eligible(cfg)
    # frame_shards=1 stays the explicit sequential opt-out.
    assert not sharded_video_eligible(
        SceneConfig(disk_model="v2", video=True, frame_shards=1)
    )


def test_v2_sharded_video_matches_sequential(tmp_path):
    """Frame-for-frame: the sharded V2 engine and the sequential
    per-frame Renderer loop render the same video."""
    from PIL import Image

    from bhr_tpu.modes import render_video, video_temp_paths

    seq_cfg = _v2_video_cfg(tmp_path, "seq.mp4", frame_shards=1)
    render_video(seq_cfg)
    sh_cfg = _v2_video_cfg(tmp_path, "sh.mp4", frame_shards=3,
                           frames_per_dispatch=2)
    render_video(sh_cfg)

    seq_dir = video_temp_paths(seq_cfg.output)[0]
    sh_dir = video_temp_paths(sh_cfg.output)[0]
    for f in range(seq_cfg.n_frames):
        name = f"frame_{f:04d}.png"
        a = np.asarray(Image.open(os.path.join(seq_dir, name)), np.int16)
        b = np.asarray(Image.open(os.path.join(sh_dir, name)), np.int16)
        # Different program structures (staged jits vs one batched
        # lax.map) may differ by 1 ULP in float, flipping a uint8 at a
        # rounding boundary — never more.
        assert np.abs(a - b).max() <= 1, name
    assert os.path.getsize(sh_cfg.output) > 0


def test_v2_sharded_video_resume(tmp_path):
    """The resume protocol (progress.json superset invalidation, frame
    skip) works for V2 sharded videos."""
    import dataclasses
    import glob
    import json

    from bhr_tpu.parallel.video import render_video_sharded
    from bhr_tpu.modes import video_temp_paths

    cfg = _v2_video_cfg(tmp_path, "resume.mp4", frame_shards=3,
                        frames_per_dispatch=1)
    render_video_sharded(cfg)
    temp_dir, progress_file = video_temp_paths(cfg.output)
    frames = sorted(glob.glob(os.path.join(temp_dir, "frame_*.png")))
    assert len(frames) == cfg.n_frames

    # Forge an interruption after the first batch.
    with open(progress_file) as f:
        progress = json.load(f)
    progress["completed"] = [0, 1, 2]
    with open(progress_file, "w") as f:
        json.dump(progress, f)
    for fr in frames[3:]:
        os.remove(fr)
    os.remove(cfg.output)
    kept = [os.stat(fr).st_mtime_ns for fr in frames[:3]]

    render_video_sharded(dataclasses.replace(cfg, resume=True))
    assert all(os.path.exists(fr) for fr in frames)
    assert [os.stat(fr).st_mtime_ns for fr in frames[:3]] == kept, (
        "resume re-rendered completed frames"
    )
    assert os.path.getsize(cfg.output) > 0


def test_v2_param_change_invalidates_resume(tmp_path):
    """A V2 knob change must wipe stale frames on resume — the v2
    param block in video_resume_params is load-bearing."""
    import dataclasses

    from bhr_tpu.parallel.video import render_video_sharded
    from bhr_tpu.modes import video_temp_paths

    cfg = _v2_video_cfg(tmp_path, "inv.mp4", frame_shards=3, n_frames=3,
                        frames_per_dispatch=1)
    render_video_sharded(cfg)
    temp_dir, _ = video_temp_paths(cfg.output)
    first = os.path.join(temp_dir, "frame_0000.png")
    before = os.stat(first).st_mtime_ns

    changed = dataclasses.replace(cfg, v2_samples=4, resume=True)
    render_video_sharded(changed)
    assert os.stat(first).st_mtime_ns != before, (
        "param change did not invalidate completed frames"
    )
