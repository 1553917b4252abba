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


@pytest.mark.slow
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


class _FakeRenderer:
    def __init__(self):
        self.calls = []
        self.textures = 0

    def render(self, cam_pos, fov, frame=0, skip_differentials=False,
               force_differentials=False, skip_bloom=False,
               lens_flare=False):
        self.calls.append(dict(
            cam_pos=list(cam_pos), fov=fov, frame=frame,
            skip_differentials=skip_differentials,
            force_differentials=force_differentials,
            skip_bloom=skip_bloom, lens_flare=lens_flare,
        ))
        return np.zeros((4, 4, 3), np.float32)

    def update_disk_texture(self, tex):
        self.textures += 1


class _FakeDynamic:
    entity_count = 7

    def __init__(self):
        self.advances = []

    def advance(self, t, dt, recompute_stats=False, solo_idx=-1):
        self.advances.append((t, dt, recompute_stats, solo_idx))
        return np.zeros((8, 16, 4), np.float32)


def test_interactive_session_loop_body(tiny_cfg):
    """The windowed loop body, driven headlessly: key toggles reach the
    render call, the lifecycle advances with the clamped sim step, and
    the render/viewer timing split is accounted (VERDICT r1 #7)."""
    from bhr_tpu.interactive import InteractiveSession

    r, d = _FakeRenderer(), _FakeDynamic()
    sess = InteractiveSession(tiny_cfg, renderer=r, dynamic=d)

    sess.step(0.05)
    assert r.textures == 1 and len(r.calls) == 1
    c = r.calls[0]
    assert c["frame"] == 0  # rotation lives in the advancing texture
    assert c["skip_bloom"] is False and c["lens_flare"] is False
    assert c["skip_differentials"] is True  # AA disabled in tiny_cfg
    # First frame recomputes stats (frames % 60 == 1).
    assert d.advances[0][2] is True
    # Sim step = real_dt * rotation_speed * 20 (reference scaled_dt).
    assert d.advances[0][1] == pytest.approx(
        0.05 * tiny_cfg.disk_rotation_speed * 20.0)

    # Toggles: d/b/l flip flags; fov keys clamp; zoom shrinks radius.
    sess.handle_key("d"); sess.handle_key("b"); sess.handle_key("l")
    sess.handle_key("up"); sess.handle_key("+")
    r0 = sess.r
    sess.step(0.5)  # stalled frame: sim dt clamps to 0.1
    c = r.calls[1]
    assert c["force_differentials"] is True
    assert c["skip_bloom"] is True and c["lens_flare"] is True
    assert c["fov"] == tiny_cfg.fov - 5.0
    assert sess.r == r0
    assert d.advances[1][1] == pytest.approx(
        0.1 * tiny_cfg.disk_rotation_speed * 20.0)

    # Solo keys map to component indices; 0 resets.
    sess.handle_key("6")
    sess.step(0.05)
    assert d.advances[2][3] == 5  # filaments plane
    sess.handle_key("0")
    sess.step(0.05)
    assert d.advances[3][3] == -1

    # Mouse drag orbits the camera (theta clamped away from the poles).
    phi0, th0 = sess.phi, sess.theta
    sess.handle_drag(0, 0)
    sess.handle_drag(200, -100000)
    assert sess.phi != phi0
    assert 0.05 <= sess.theta <= np.pi - 0.05
    sess.handle_drag(None, None)
    assert sess.drag is None

    # Timing split: render accounted per step, viewer via the hook.
    assert sess.render_s > 0 and sess.frames == 4
    sess.record_viewer_time(0.033)
    assert sess.last_viewer_ms == pytest.approx(33.0)
    assert "FPS" in sess.hud_text() and "view" in sess.hud_text()
    assert "render" in sess.summary()

    # Quit.
    sess.handle_key("q")
    assert sess.running is False


def test_interactive_session_v2_rotates_via_t_offset(tiny_cfg):
    """With no dynamic system (V2), rotation must flow through the
    sampler's frame -> t_offset, not texture updates."""
    import dataclasses

    from bhr_tpu.interactive import InteractiveSession

    cfg = dataclasses.replace(tiny_cfg, disk_model="v2")
    r = _FakeRenderer()
    sess = InteractiveSession(cfg, renderer=r, dynamic=None)
    sess.step(0.05)
    sess.step(0.05)
    frames = [c["frame"] for c in r.calls]
    assert frames[1] > frames[0] > 0
    assert r.textures == 0


def test_run_matplotlib_loop_with_mock_window(tiny_cfg, monkeypatch):
    """Drive _run_matplotlib's real loop (blit path, HUD updates, event
    wiring, exit) without a display, via a mocked matplotlib window.
    Covers the windowed loop body that previously only ran under X."""
    import bhr_tpu.interactive as imod

    frames = {"n": 0}
    handlers = {}

    class _Canvas:
        def mpl_connect(self, name, fn):
            handlers[name] = fn

        def draw(self):
            pass

        def copy_from_bbox(self, bbox):
            return "bg-cache"

        def restore_region(self, bg):
            assert bg == "bg-cache"

        def blit(self, bbox):
            frames["blits"] = frames.get("blits", 0) + 1

        def flush_events(self):
            pass

        def draw_idle(self):
            frames["draw_idle"] = frames.get("draw_idle", 0) + 1

    class _Im:
        def set_data(self, img):
            frames["img_shape"] = img.shape

        def get_array(self):
            return np.zeros((4, 4, 3), np.float32)

    class _Hud:
        def set_text(self, s):
            frames["hud"] = s

    class _Ax:
        bbox = "axbbox"
        transAxes = None

        def axis(self, *_):
            pass

        def imshow(self, arr):
            return _Im()

        def text(self, *a, **kw):
            return _Hud()

        def draw_artist(self, artist):
            pass

    class _Fig:
        number = 1
        bbox = "figbbox"
        canvas = _Canvas()

    class _Plt:
        @staticmethod
        def ion():
            pass

        @staticmethod
        def show():
            pass

        @staticmethod
        def fignum_exists(num):
            frames["n"] += 1
            return frames["n"] <= 4  # run 4 loop iterations, then close

    # Real session logic over a fake renderer (no device work).
    monkeypatch.setattr(
        imod, "_build", lambda config: (_FakeRenderer(), _FakeDynamic())
    )
    imod._run_matplotlib(tiny_cfg, (_Plt, _Fig(), _Ax()))

    assert frames["blits"] == 4          # blit fast path used every frame
    assert "draw_idle" not in frames     # never fell back to full redraws
    assert frames["img_shape"] == (4, 4, 3)
    assert "FPS" in frames["hud"]
    # Event handlers are wired for keys + mouse orbit.
    assert {"key_press_event", "button_press_event",
            "button_release_event", "motion_notify_event"} <= set(handlers)


def test_run_matplotlib_blit_fallback(tiny_cfg, monkeypatch):
    """A backend whose canvas cannot blit must fall back to draw_idle
    (not crash, not render nothing)."""
    import bhr_tpu.interactive as imod

    frames = {"n": 0}

    class _Canvas:
        def mpl_connect(self, name, fn):
            pass

        def draw(self):
            pass

        def copy_from_bbox(self, bbox):
            raise NotImplementedError("no blitting here")

        def draw_idle(self):
            frames["draw_idle"] = frames.get("draw_idle", 0) + 1

    class _Im:
        def set_data(self, img):
            pass

        def get_array(self):
            return np.zeros((4, 4, 3), np.float32)

    class _Ax:
        transAxes = None

        def axis(self, *_):
            pass

        def imshow(self, arr):
            return _Im()

        def text(self, *a, **kw):
            class _H:
                def set_text(self, s):
                    pass
            return _H()

    class _Fig:
        number = 1
        canvas = _Canvas()

    class _Plt:
        @staticmethod
        def ion():
            pass

        @staticmethod
        def show():
            pass

        @staticmethod
        def fignum_exists(num):
            frames["n"] += 1
            return frames["n"] <= 2

        @staticmethod
        def pause(dt):
            pass

    monkeypatch.setattr(
        imod, "_build", lambda config: (_FakeRenderer(), _FakeDynamic())
    )
    imod._run_matplotlib(tiny_cfg, (_Plt, _Fig(), _Ax()))
    assert frames["draw_idle"] == 2


def test_mjpeg_preview_server_and_http_loop(tiny_cfg, monkeypatch):
    """The headless MJPEG preview: snapshot endpoint serves a real JPEG
    of the latest frame, /key injects session keys (q stops the loop),
    and run_http_preview drives the real InteractiveSession against it."""
    import urllib.request

    import bhr_tpu.interactive as imod
    from bhr_tpu.utils.preview_server import MJPEGServer

    # --- server alone: snapshot + key injection ---
    keys = []
    server = MJPEGServer(port=0, on_key=keys.append)
    server.start()
    try:
        frame = np.zeros((8, 8, 3), np.uint8)
        frame[2:6, 2:6] = 255
        server.submit(frame)
        base = f"http://127.0.0.1:{server.port}"
        data = urllib.request.urlopen(f"{base}/frame", timeout=10).read()
        assert data[:3] == b"\xff\xd8\xff"  # JPEG SOI marker
        from PIL import Image
        import io as _io

        img = Image.open(_io.BytesIO(data))
        assert img.size == (8, 8)
        urllib.request.urlopen(f"{base}/key?k=d&k=q", timeout=10).read()
        assert keys == ["d", "q"]
        # Stream endpoint yields at least one multipart frame.
        with urllib.request.urlopen(base, timeout=10) as stream:
            head = stream.read(64)
        assert b"--bhrframe" in head
    finally:
        server.stop()

    # --- the full HTTP-preview loop over a fake renderer ---
    r, d = _FakeRenderer(), _FakeDynamic()
    monkeypatch.setattr(imod, "_build", lambda config: (r, d))
    submitted = []

    class _Srv:
        port = 1234
        host = "127.0.0.1"

        def __init__(self, port, on_key, host="127.0.0.1"):
            self.on_key = on_key
            self.host = host

        def start(self):
            pass

        def set_key_handler(self, fn, backlog=None):
            for k in (backlog or []):
                fn(k)
            if backlog is not None:
                backlog.clear()
            self.on_key = fn

        def submit(self, img):
            submitted.append(np.asarray(img).shape)
            if len(submitted) == 3:
                self.on_key("q")  # viewer quits via /key

        def stop(self):
            submitted.append("stopped")

    import bhr_tpu.utils.preview_server as psmod

    monkeypatch.setattr(psmod, "MJPEGServer", _Srv)
    imod.run_http_preview(tiny_cfg, port=1234)
    assert submitted == [(4, 4, 3)] * 3 + ["stopped"]
    assert len(r.calls) == 3

    # CLI dispatch: --interactive --preview_port routes here; the bind
    # host defaults to loopback (the /key endpoint is unauthenticated).
    called = {}
    monkeypatch.setattr(
        imod, "run_http_preview",
        lambda config, port, host="127.0.0.1":
            called.update(port=port, host=host),
    )
    imod.run_interactive(tiny_cfg, preview_port=8089)
    assert called == {"port": 8089, "host": "127.0.0.1"}
    imod.run_interactive(tiny_cfg, preview_port=8089,
                         preview_host="0.0.0.0")
    assert called["host"] == "0.0.0.0"


def test_mjpeg_stream_open_before_first_frame_and_plus_key():
    """Review fixes: a stream opened during the first compile must wait
    for frame 1 (not close immediately), and /key?k=+ must map to the
    zoom-in binding despite parse_qs decoding '+' as a space."""
    import threading
    import urllib.request

    from bhr_tpu.utils.preview_server import MJPEGServer

    keys = []
    server = MJPEGServer(port=0, on_key=keys.append)
    server.start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        got = {}

        def read_stream():
            with urllib.request.urlopen(base, timeout=30) as stream:
                got["head"] = stream.read(64)

        t = threading.Thread(target=read_stream, daemon=True)
        t.start()
        import time as _time

        _time.sleep(0.5)  # stream connects while no frame exists yet
        server.submit(np.zeros((8, 8, 3), np.uint8))
        t.join(timeout=30)
        assert b"--bhrframe" in got.get("head", b""), got

        urllib.request.urlopen(f"{base}/key?k=+", timeout=10).read()
        urllib.request.urlopen(f"{base}/key?k=%2B", timeout=10).read()
        assert keys == ["+", "+"]

        # Atomic handler swap replays the backlog exactly once.
        replayed = []
        server.set_key_handler(replayed.append, backlog=keys)
        assert replayed == ["+", "+"] and keys == []
        urllib.request.urlopen(f"{base}/key?k=q", timeout=10).read()
        assert replayed == ["+", "+", "q"]
    finally:
        server.stop()


class _FakeDeviceRenderer(_FakeRenderer):
    """Fake with a device-resident path, to drive the lookahead swap."""

    def render_device(self, cam_pos, fov, frame=0, skip_differentials=False,
                      force_differentials=False, skip_bloom=False,
                      lens_flare=False):
        self.render(cam_pos, fov, frame, skip_differentials,
                    force_differentials, skip_bloom, lens_flare)
        return np.full((4, 4, 3), float(len(self.calls) - 1), np.float32)


def test_interactive_lookahead_double_buffers(tiny_cfg):
    """With lookahead (the default when the renderer has a device path),
    step N dispatches frame N and displays frame N-1: the returned
    sequence is f0, f0, f1, f2 ... — one frame of latency, render and
    fetch overlapped."""
    from bhr_tpu.interactive import InteractiveSession

    sess = InteractiveSession(
        tiny_cfg, renderer=_FakeDeviceRenderer(), dynamic=_FakeDynamic())
    assert sess.lookahead
    shown = [float(sess.step(0.05)[0, 0, 0]) for _ in range(4)]
    assert shown == [0.0, 0.0, 1.0, 2.0]


def test_interactive_lookahead_off_without_device_path(tiny_cfg):
    """A renderer without render_device falls back to the synchronous
    path even when lookahead is requested."""
    from bhr_tpu.interactive import InteractiveSession

    sess = InteractiveSession(
        tiny_cfg, renderer=_FakeRenderer(), dynamic=_FakeDynamic(),
        lookahead=True)
    assert not sess.lookahead
    assert sess.step(0.05).shape == (4, 4, 3)


def test_toggle_drops_pending_lookahead_frame(tiny_cfg):
    """A state-changing key (d/b/l/fov/zoom/solo) must invalidate the
    pending lookahead frame — otherwise one frame rendered under the
    OLD settings is displayed (or screenshot) after every toggle."""
    from bhr_tpu.interactive import InteractiveSession

    sess = InteractiveSession(
        tiny_cfg, renderer=_FakeDeviceRenderer(), dynamic=_FakeDynamic())
    sess.step(0.05)
    assert sess._pending is not None
    sess.handle_key("b")
    assert sess._pending is None
    # The next displayed frame is the fresh post-toggle dispatch, not
    # the stale pre-toggle one.
    shown = float(sess.step(0.05)[0, 0, 0])
    assert shown == 1.0  # frame 1 = first frame rendered after toggle


def test_fused_session_first_frame_matches_staged(tiny_cfg):
    """The fused one-dispatch path (production) renders the same first
    frame as the staged Renderer path — same scene state, same stats
    (both recompute from the frame-0 comp field)."""
    from bhr_tpu.interactive import InteractiveSession
    from bhr_tpu.utils.io import quantize_frame

    fused = InteractiveSession(tiny_cfg, lookahead=False)
    assert fused._fused is not None, "fused engine should build"
    staged = InteractiveSession(tiny_cfg, lookahead=False, fused=False)
    assert staged._fused is None

    a = np.asarray(fused.step(0.05))
    assert a.dtype == np.uint8
    b = quantize_frame(np.asarray(staged.step(0.05)))
    assert a.shape == b.shape
    assert a.any(), "fused frame is black"
    # Same math graph modulo program structure: uint8 rounding flips
    # at most 1 LSB.
    assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1


def test_fused_session_toggles_render_variants(tiny_cfg):
    """d/b/l toggles select distinct fused program variants without
    crashing; solo keys select the fused masked-comp variant (r5 —
    formerly a staged-path fallback)."""
    from bhr_tpu.interactive import InteractiveSession

    sess = InteractiveSession(tiny_cfg, lookahead=False)
    base = np.asarray(sess.step(0.05)).astype(np.int16)
    sess.handle_key("b")  # bloom off
    no_bloom = np.asarray(sess.step(0.05)).astype(np.int16)
    assert no_bloom.shape == base.shape
    sess.handle_key("l")  # flare on (bloom still off)
    flare = np.asarray(sess.step(0.05))
    assert flare.shape == base.shape
    sess.handle_key("6")  # solo filaments — stays on the fused engine
    solo = np.asarray(sess.step(0.05))
    assert solo.shape == base.shape and solo.dtype == np.uint8
    sess.handle_key("0")  # back to the full compose
    again = np.asarray(sess.step(0.05))
    assert again.dtype == np.uint8


def test_fused_session_solo_stays_fused_and_matches_staged(
        tiny_cfg, monkeypatch):
    """Solo debug views run through the fused one-dispatch engine (the
    staged body must never be entered) and render the same masked-comp
    frame as the staged path's display-local solo compose (VERDICT r4
    weak #3; reference solo behavior render.py:3728-3753)."""
    from bhr_tpu.interactive import InteractiveSession
    from bhr_tpu.utils.io import quantize_frame

    fused = InteractiveSession(tiny_cfg, lookahead=False)
    assert fused._fused is not None
    monkeypatch.setattr(
        InteractiveSession, "_step_staged",
        lambda self, dt: (_ for _ in ()).throw(
            AssertionError("solo frame took the staged path")),
    )
    fused.handle_key("6")  # solo filaments (comp slice 5)
    assert fused.solo == 5
    a = np.asarray(fused.step(0.05))
    assert a.dtype == np.uint8 and a.any()
    monkeypatch.undo()

    staged = InteractiveSession(tiny_cfg, lookahead=False, fused=False)
    staged.handle_key("6")
    b = quantize_frame(np.asarray(staged.step(0.05)))
    assert a.shape == b.shape
    # Identical masked comp field + solo-local stats in both paths:
    # uint8 rounding flips at most 1 LSB.
    assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1


def test_fused_session_v2(tiny_cfg):
    """The V2 volume model drives the fused interactive path too (no
    lifecycle system — zero entity placeholders, rotation via t)."""
    from bhr_tpu.config import SceneConfig
    from bhr_tpu.interactive import InteractiveSession

    cfg = SceneConfig(
        **{**tiny_cfg.__dict__, "disk_model": "v2"}
    ).validated()
    sess = InteractiveSession(cfg, lookahead=False)
    assert sess._fused is not None and sess.dynamic is None
    img = np.asarray(sess.step(0.05))
    assert img.dtype == np.uint8 and img.shape == (36, 64, 3)
    assert img.any()
