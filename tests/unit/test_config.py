"""SceneConfig validation + texture-resolution parity tests."""

import pytest

from bhr_tpu.config import SceneConfig, compute_disk_texture_resolution


def test_defaults_valid():
    cfg = SceneConfig().validated()
    assert cfg.image_size == (1920, 1080)


def test_fov_in_range_passes_through():
    cfg = SceneConfig(fov=90.0).validated()
    assert cfg.fov == 90.0


def test_fov_out_of_range_raises():
    # Matches the reference: validate_args raises before its dead
    # fov % 180 line ever matters (render.py:4589 vs 4625).
    with pytest.raises(ValueError):
        SceneConfig(fov=250.0).validated()
    with pytest.raises(ValueError):
        SceneConfig(fov=-30.0).validated()


def test_disk_texture_npy_cache(tmp_path):
    # The reference caches generated static disk textures as .npy keyed
    # by params (render.py:1170-1186); exercise generate->cache->hit,
    # including an ndarray cam_pos.
    import numpy as np

    from bhr_tpu.utils.cache import load_cached_disk_texture

    kw = dict(
        width=64, height=36, cam_pos=np.array([6.0, 0.0, 0.5]), fov=60.0,
        seed=3, r_inner=2.0, r_outer=3.5, generation_scale=1,
        cache_dir=str(tmp_path),
    )
    tex = load_cached_disk_texture(**kw)
    assert tex.ndim == 3 and tex.shape[-1] == 4
    cached = list(tmp_path.iterdir())
    assert len(cached) == 1 and cached[0].suffix == ".npy"
    tex2 = load_cached_disk_texture(**kw)
    np.testing.assert_array_equal(np.asarray(tex), np.asarray(tex2))


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(fov=0.0),
        dict(fov=180.0),
        dict(disk_inner_radius=5.0, disk_outer_radius=3.0),
        dict(step_size=0.0),
        dict(step_size=-1.0),
        dict(aa_strength=0.4),
        dict(aa_strength=2.5),
        dict(n_frames=0),
        dict(fps=0),
        dict(orbit_degrees=float("inf")),
        dict(anti_alias="bogus"),
        dict(disk_texture="x.png", video=True),
        dict(disk_texture="x.png", interactive=True),
        dict(disk_texture="x.png", disk_model="v2"),
        dict(disk_generation_scale=3),
    ],
)
def test_invalid_configs_raise(kwargs):
    with pytest.raises(ValueError):
        SceneConfig(**kwargs).validated()


def test_resolution_presets():
    assert SceneConfig(resolution="sd").image_size == (640, 360)
    assert SceneConfig(resolution="4k").image_size == (3840, 2160)
    assert SceneConfig(width=123, height=45).image_size == (123, 45)


def test_texture_resolution_floors_and_rounding():
    n_phi, n_r = compute_disk_texture_resolution(64, 64, (6, 0, 0.5), 90, 2.0, 3.5)
    assert n_phi == 256 and n_r == 128  # floors kick in
    n_phi, n_r = compute_disk_texture_resolution(
        1920, 1080, (6, 0, 0.5), 90, 2.0, 15.0
    )
    assert n_phi % 16 == 0 and n_r % 16 == 0
    assert n_phi >= 256 and n_r >= 128


def test_negative_orbit_degrees_allowed():
    cfg = SceneConfig(orbit_degrees=-360.0).validated()
    assert cfg.orbit_degrees == -360.0


def test_scene_escape_radius_matches_per_frame_orbit_camera():
    """The sharded engine's static escape radius must equal the
    sequential engine's per-frame escape_radius(r_max, orbit cam pos)
    for every orbit frame — with pov z != 0 the orbit camera distance
    is sqrt(|pov|^2 + z^2), NOT |pov| (regression: far-annulus band
    flickering between engines under cross-engine resume)."""
    from bhr_tpu.camera import orbit_camera_position
    from bhr_tpu.config import escape_radius, scene_escape_radius

    cfg = SceneConfig(
        pov=(6.0, 0.0, 0.5), r_max=10.0, orbit=True,
        orbit_degrees=360.0, n_frames=7,
    ).validated()
    expected = scene_escape_radius(cfg)
    for f in range(cfg.n_frames):
        pos = orbit_camera_position(f, cfg.n_frames, cfg.orbit_degrees, cfg.pov)
        assert abs(escape_radius(cfg.r_max, pos) - expected) < 1e-9
    # Static-camera scenes keep the plain formula.
    static = SceneConfig(pov=(6.0, 0.0, 0.5), r_max=10.0).validated()
    assert scene_escape_radius(static) == escape_radius(10.0, (6.0, 0.0, 0.5))


def test_v2_model_never_traces_ray_differentials():
    """AA differentials feed the texture-model LOD sampler only; with
    disk_model='v2' the flag must not trigger the 2-3x differential
    trace (regression: silent no-op AA tripling hot-loop work)."""
    v2 = SceneConfig(disk_model="v2", anti_alias="lod_radius").validated()
    assert v2.use_ray_differentials is False
    v1 = SceneConfig(anti_alias="lod_radius").validated()
    assert v1.use_ray_differentials is True
    assert SceneConfig().validated().use_ray_differentials is False


def test_v2_surface_validation():
    """The V2 knobs validate at config time: palette/samples directly,
    body + structure params through the DiskV2*Params validators."""
    import pytest

    cfg = SceneConfig(
        disk_model="v2", v2_palette="scientific", v2_samples=4,
        v2_structure=True, v2_hotspot_count=3,
    ).validated()
    assert cfg.v2_params().r_in == cfg.disk_inner_radius
    sp = cfg.v2_structure_params()
    assert sp is not None and sp.hotspot_count == 3
    # Structure off -> None (pipeline skips the modulation stack).
    assert SceneConfig(disk_model="v2").validated().v2_structure_params() \
        is None
    with pytest.raises(ValueError):
        SceneConfig(disk_model="v2", v2_palette="neon").validated()
    with pytest.raises(ValueError):
        SceneConfig(disk_model="v2", v2_samples=0).validated()
    # DiskV2Params validator reached from config validation:
    with pytest.raises(ValueError):
        SceneConfig(disk_model="v2", v2_h0=-1.0).validated()
    # DiskV2StructureParams validator (mode strengths must sum < 1):
    with pytest.raises(ValueError):
        SceneConfig(disk_model="v2", v2_structure=True,
                    v2_mode1_strength=0.6,
                    v2_mode2_strength=0.6).validated()
    # Texture model never constructs V2 params -> bad v2 knobs are
    # inert there (they affect nothing).
    SceneConfig(v2_h0=-1.0).validated()


def test_v2_cli_flags_reach_config():
    from bhr_tpu.cli import build_parser, config_from_args

    args = build_parser().parse_args([
        "--disk_model", "v2", "--v2_palette", "scientific",
        "--v2_samples", "12", "--v2_structure",
        "--v2_shear_strength", "0.1", "--v2_hotspot_count", "5",
        "--v2_h0", "0.08",
    ])
    cfg = config_from_args(args)
    assert cfg.v2_palette == "scientific"
    assert cfg.v2_samples == 12
    assert cfg.v2_structure is True
    assert cfg.v2_shear_strength == 0.1
    assert cfg.v2_hotspot_count == 5
    assert cfg.v2_params().h0 == 0.08


def test_frame_shards_fail_loud():
    """An explicitly requested shard count the engine would ignore is
    an error, never a silent no-op (PARITY.md deviation 10)."""
    import pytest

    from bhr_tpu.config import SceneConfig

    with pytest.raises(ValueError, match="frame_shards"):
        SceneConfig(frame_shards=8).validated()  # no --video
    with pytest.raises(ValueError, match="frame_shards"):
        SceneConfig(video=True, frame_shards=-1).validated()
    # Valid: sharded video, sequential opt-out, default.
    SceneConfig(video=True, frame_shards=8).validated()
    SceneConfig(video=True, frame_shards=1).validated()
    SceneConfig().validated()


def test_frame_shards_above_device_count_warns(tmp_path, capsys):
    """Clamping an oversized --frame_shards must say so."""
    from bhr_tpu.config import SceneConfig
    from bhr_tpu.parallel.video import render_video_sharded

    cfg = SceneConfig(
        width=32, height=16, fov=60.0, step_size=0.3, n_stars=50,
        disk_inner_radius=2.0, disk_outer_radius=3.5,
        video=True, orbit=True, n_frames=2, fps=2, frame_shards=4096,
        frames_per_dispatch=1,
        output=str(tmp_path / "warn.mp4"),
    ).validated()
    stats = render_video_sharded(cfg)
    out = capsys.readouterr().out
    assert "exceeds" in out and "4096" in out
    # Stats contract (bench.py consumes this): frames rendered + wall
    # time always present; steady_fps needs >= 2 batches, so this
    # single-batch video reports None.
    assert stats["frames"] == 2 and stats["wall_s"] > 0
    assert stats["steady_fps"] is None or stats["steady_fps"] > 0
