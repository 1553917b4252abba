"""Native H.264/MP4 writer: encode→probe→decode loop, wiring, fallbacks.

fastvideo restores the reference's H.264 assembly (render.py:4497-4503,
imageio/pyav) on hosts that have the ffmpeg shared libraries but no
Python bindings. The tests close the loop entirely inside the native
module (probe + first-frame decode) so no Python codec is needed, and
they must degrade: when the module did not build, video_available() is
False, the writer tests skip, and _assemble_video falls through to the
MJPEG AVI path (covered in test_video_assembly.py).
"""

import os

import numpy as np
import pytest
from PIL import Image

from bhr_tpu import native
from bhr_tpu.modes import _assemble_video

needs_video = pytest.mark.skipif(
    not native.video_available(),
    reason="native fastvideo did not build on this host",
)


def _gradient_frames(n, h, w):
    """Smooth moving-gradient frames (video-codec friendly, seeded)."""
    y, x = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        img = np.zeros((h, w, 3), np.float32)
        cx = w * (0.25 + 0.5 * i / max(n - 1, 1))
        img[..., 0] = np.exp(-((x - cx) ** 2 + (y - h / 2) ** 2) / (0.1 * w * h))
        img[..., 1] = x / w
        img[..., 2] = y / h
        frames.append((img * 255).astype(np.uint8))
    return frames


@needs_video
def test_encode_probe_roundtrip(tmp_path):
    path = str(tmp_path / "clip.mp4")
    frames = _gradient_frames(12, 48, 64)
    with native.H264Writer(path, 64, 48, fps=8) as writer:
        for f in frames:
            writer.write(f)
    assert os.path.getsize(path) > 0
    n, w, h = native.probe_video(path)
    assert (n, w, h) == (12, 64, 48)


@needs_video
def test_decoded_first_frame_close_to_input(tmp_path):
    path = str(tmp_path / "clip.mp4")
    frames = _gradient_frames(6, 64, 96)
    with native.H264Writer(path, 96, 64, fps=4, crf=12) as writer:
        for f in frames:
            writer.write(f)
    back = native.read_first_frame(path, 96, 64)
    assert back.shape == (64, 96, 3)
    # Lossy (yuv420p + x264) but at CRF 12 a smooth gradient survives
    # nearly intact: require PSNR well above "garbage".
    err = back.astype(np.float64) - frames[0].astype(np.float64)
    psnr = 10 * np.log10(255.0**2 / max(np.mean(err**2), 1e-9))
    assert psnr > 30.0, psnr


@needs_video
def test_writer_input_validation(tmp_path):
    path = str(tmp_path / "v.mp4")
    with pytest.raises(ValueError):
        native.H264Writer(path, 63, 48, fps=8)  # odd width
    writer = native.H264Writer(path, 64, 48, fps=8)
    with pytest.raises(ValueError):
        writer.write(np.zeros((48, 64, 4), np.uint8))
    with pytest.raises(ValueError):
        writer.write(np.zeros((32, 64, 3), np.uint8))  # wrong size
    writer.write(np.zeros((48, 64, 3), np.uint8))
    writer.close()
    writer.close()  # idempotent
    with pytest.raises(RuntimeError):
        writer.write(np.zeros((48, 64, 3), np.uint8))


@needs_video
def test_exception_aborts_without_trailer(tmp_path):
    """An in-flight exception must NOT finalize the container: a
    truncated-but-playable video at the advertised path is the failure
    mode the assembly chain promises not to produce."""
    path = str(tmp_path / "broken.mp4")
    with pytest.raises(RuntimeError, match="boom"):
        with native.H264Writer(path, 64, 48, fps=8) as writer:
            for f in _gradient_frames(3, 48, 64):
                writer.write(f)
            raise RuntimeError("boom")
    # No moov box was written, so probing must fail.
    with pytest.raises(RuntimeError):
        native.probe_video(path)


@needs_video
def test_assemble_video_keyboard_interrupt_removes_partial(tmp_path,
                                                           monkeypatch):
    """Ctrl-C during assembly: partial output removed, interrupt
    propagates (it must still stop the run)."""
    from bhr_tpu import modes

    temp_dir = str(tmp_path / "frames")
    os.makedirs(temp_dir)
    for i, f in enumerate(_gradient_frames(4, 48, 64)):
        Image.fromarray(f, "RGB").save(
            os.path.join(temp_dir, f"frame_{i:04d}.png"))
    out = str(tmp_path / "orbit.mp4")

    real_write = native.H264Writer.write
    calls = []

    def interrupting_write(self, frame):
        if len(calls) == 2:
            raise KeyboardInterrupt
        calls.append(1)
        real_write(self, frame)

    monkeypatch.setattr(native.H264Writer, "write", interrupting_write)
    with pytest.raises(KeyboardInterrupt):
        modes._assemble_video(temp_dir, out, 4, fps=4)
    assert not os.path.exists(out)


@needs_video
def test_open_failure_raises(tmp_path):
    with pytest.raises(RuntimeError):
        native.H264Writer("/nonexistent-dir/v.mp4", 64, 48, fps=8)


@needs_video
def test_assemble_video_uses_native_writer(tmp_path, capsys):
    temp_dir = str(tmp_path / "frames")
    os.makedirs(temp_dir)
    for i, f in enumerate(_gradient_frames(5, 48, 64)):
        Image.fromarray(f, "RGB").save(
            os.path.join(temp_dir, f"frame_{i:04d}.png"))
    out = str(tmp_path / "orbit.mp4")
    _assemble_video(temp_dir, out, 5, fps=4)
    assert "Video saved" in capsys.readouterr().out
    n, w, h = native.probe_video(out)
    assert (n, w, h) == (5, 64, 48)


@needs_video
def test_assemble_video_odd_dims_falls_back(tmp_path, capsys):
    """Odd-dimension frames can't be yuv420p-encoded: the chain must
    fall through (to MJPEG AVI on this host) instead of failing."""
    temp_dir = str(tmp_path / "frames")
    os.makedirs(temp_dir)
    for i, f in enumerate(_gradient_frames(3, 47, 63)):
        Image.fromarray(f, "RGB").save(
            os.path.join(temp_dir, f"frame_{i:04d}.png"))
    out = str(tmp_path / "orbit.mp4")
    _assemble_video(temp_dir, out, 3, fps=4)
    assert not os.path.exists(out)
    assert os.path.exists(str(tmp_path / "orbit.avi"))


@needs_video
def test_incremental_assembler_inline(tmp_path):
    from bhr_tpu.utils.io import IncrementalH264Assembler

    temp_dir = str(tmp_path / "frames")
    os.makedirs(temp_dir)
    out = str(tmp_path / "v.mp4")
    asm = IncrementalH264Assembler(out, 6, fps=4, temp_dir=temp_dir)
    for i, f in enumerate(_gradient_frames(6, 48, 64)):
        # Float input: must quantize identically to the PNG writer.
        asm.submit(i, f.astype(np.float32) / 255.0)
    assert asm.finalize()
    assert native.probe_video(out) == (6, 64, 48)


@needs_video
def test_incremental_assembler_resume_catch_up(tmp_path):
    """Frames 0-2 exist only as PNGs (earlier session); fresh submits
    start at 3 — the assembler must splice the gap from disk."""
    from bhr_tpu.utils.io import IncrementalH264Assembler

    temp_dir = str(tmp_path / "frames")
    os.makedirs(temp_dir)
    frames = _gradient_frames(6, 48, 64)
    for i in range(3):
        Image.fromarray(frames[i], "RGB").save(
            os.path.join(temp_dir, f"frame_{i:04d}.png"))
    out = str(tmp_path / "v.mp4")
    asm = IncrementalH264Assembler(out, 6, fps=4, temp_dir=temp_dir)
    for i in range(3, 6):
        asm.submit(i, frames[i])
    assert asm.finalize()
    assert native.probe_video(out) == (6, 64, 48)


@needs_video
def test_incremental_assembler_all_from_disk(tmp_path):
    """Resume run where everything was already rendered: zero submits,
    finalize() must still assemble the full video from the PNGs."""
    from bhr_tpu.utils.io import IncrementalH264Assembler

    temp_dir = str(tmp_path / "frames")
    os.makedirs(temp_dir)
    for i, f in enumerate(_gradient_frames(4, 48, 64)):
        Image.fromarray(f, "RGB").save(
            os.path.join(temp_dir, f"frame_{i:04d}.png"))
    out = str(tmp_path / "v.mp4")
    asm = IncrementalH264Assembler(out, 4, fps=4, temp_dir=temp_dir)
    assert asm.finalize()
    assert native.probe_video(out) == (4, 64, 48)


@needs_video
def test_incremental_assembler_failure_goes_inert(tmp_path):
    """Odd dimensions can't be encoded: submits must not raise, the
    partial file must be gone, finalize() must say 'run the post-pass'."""
    from bhr_tpu.utils.io import IncrementalH264Assembler

    temp_dir = str(tmp_path / "frames")
    os.makedirs(temp_dir)
    out = str(tmp_path / "v.mp4")
    asm = IncrementalH264Assembler(out, 3, fps=4, temp_dir=temp_dir)
    for i, f in enumerate(_gradient_frames(3, 47, 63)):
        asm.submit(i, f)
    assert not asm.finalize()
    assert not os.path.exists(out)


@needs_video
def test_discard_never_deletes_preexisting_video(tmp_path, monkeypatch):
    """A Ctrl-C on a run whose assembler never wrote the output file
    (native unavailable, or interrupted before frame 0) must not
    delete a complete video from an earlier run."""
    from bhr_tpu.utils.io import IncrementalH264Assembler

    out = str(tmp_path / "v.mp4")
    with open(out, "wb") as f:
        f.write(b"precious previous render")

    # Case 1: inert from birth (native disabled).
    monkeypatch.setenv("BHR_TPU_NATIVE", "0")
    asm = IncrementalH264Assembler(out, 3, fps=4, temp_dir=str(tmp_path))
    asm.discard()
    monkeypatch.delenv("BHR_TPU_NATIVE")
    assert open(out, "rb").read() == b"precious previous render"

    # Case 2: available but interrupted before any frame was encoded.
    asm = IncrementalH264Assembler(out, 3, fps=4, temp_dir=str(tmp_path))
    with pytest.raises(RuntimeError):
        with asm:
            raise RuntimeError("interrupt before frame 0")
    assert open(out, "rb").read() == b"precious previous render"

    # Case 3: odd-dimension frames go inert without touching the file.
    asm = IncrementalH264Assembler(out, 3, fps=4, temp_dir=str(tmp_path))
    asm.submit(0, _gradient_frames(1, 47, 63)[0])
    assert not asm.finalize()
    assert open(out, "rb").read() == b"precious previous render"


@needs_video
def test_context_manager_discards_after_loop_errors(tmp_path):
    """An exception AFTER the frame loop (e.g. a failed PNG drain) must
    still discard the in-flight video via __exit__."""
    from bhr_tpu.utils.io import IncrementalH264Assembler

    out = str(tmp_path / "v.mp4")
    frames = _gradient_frames(3, 48, 64)
    with pytest.raises(OSError):
        with IncrementalH264Assembler(out, 3, fps=4,
                                      temp_dir=str(tmp_path)) as asm:
            for i, f in enumerate(frames):
                asm.submit(i, f)
            raise OSError("disk full while draining PNGs")
    assert not os.path.exists(out)


@needs_video
def test_crf_controls_file_size(tmp_path):
    """--video_crf must reach the encoder: a much higher CRF yields a
    clearly smaller file for identical frames."""
    from bhr_tpu.utils.io import IncrementalH264Assembler

    temp_dir = str(tmp_path / "frames")
    os.makedirs(temp_dir)
    frames = _gradient_frames(8, 64, 96)
    sizes = {}
    for crf in (10, 40):
        out = str(tmp_path / f"v{crf}.mp4")
        asm = IncrementalH264Assembler(out, 8, fps=8, temp_dir=temp_dir,
                                       crf=crf)
        for i, f in enumerate(frames):
            asm.submit(i, f)
        assert asm.finalize()
        sizes[crf] = os.path.getsize(out)
    assert sizes[10] > sizes[40] * 1.5, sizes


@needs_video
def test_incremental_assembler_non_mp4_inert(tmp_path):
    from bhr_tpu.utils.io import IncrementalH264Assembler

    asm = IncrementalH264Assembler(
        str(tmp_path / "v.avi"), 3, fps=4, temp_dir=str(tmp_path))
    asm.submit(0, _gradient_frames(1, 48, 64)[0])
    assert not asm.finalize()


@needs_video
def test_incremental_matches_post_pass_pixels(tmp_path):
    """Inline assembly must encode the same frames as post-pass
    assembly, to the same quality.

    Bit-identity across encoder instances held through round 4, then
    broke with an environment update: this libx264 build's output
    depends on process memory-layout state (reproduced under disabled
    ASLR: stable; under normal ASLR: a handful of bitstream modes
    ±8 LSB apart after decode). fastvideo.cpp now pins every
    controllable source — one encoder thread, SWS_BITEXACT conversion,
    a zero-padded aligned staging copy, and a scoped default FP
    environment (XLA sets FTZ/DAZ, which flips x264 rate-control
    floats) — which shrank but did not eliminate the variance, so the
    asserted invariant is the user-meaningful one: both containers
    decode to the SAME frame within codec noise, and both are faithful
    to the source frame."""
    from bhr_tpu.modes import _assemble_video
    from bhr_tpu.utils.io import IncrementalH264Assembler, save_image

    temp_dir = str(tmp_path / "frames")
    os.makedirs(temp_dir)
    frames = _gradient_frames(4, 48, 64)
    floats = [f.astype(np.float32) / 255.0 for f in frames]
    for i, f in enumerate(floats):
        save_image(f, os.path.join(temp_dir, f"frame_{i:04d}.png"))

    inline = str(tmp_path / "inline.mp4")
    asm = IncrementalH264Assembler(inline, 4, fps=4, temp_dir=temp_dir)
    for i, f in enumerate(floats):
        asm.submit(i, f)
    assert asm.finalize()

    post = str(tmp_path / "post.mp4")
    _assemble_video(temp_dir, post, 4, fps=4)

    a = native.read_first_frame(inline, 64, 48)
    b = native.read_first_frame(post, 64, 48)
    diff = np.abs(a.astype(np.int16) - b.astype(np.int16))
    assert diff.max() <= 20 and diff.mean() <= 1.0, (
        diff.max(), diff.mean())
    # Both must be faithful encodes of the source frame 0 (crf 18 on
    # smooth gradients decodes within a few LSB on average).
    src = frames[0].astype(np.int16)
    for decoded in (a, b):
        d = np.abs(decoded.astype(np.int16) - src)
        assert d.mean() <= 3.0, d.mean()


def test_disable_env_gates_video(monkeypatch):
    monkeypatch.setenv("BHR_TPU_NATIVE", "0")
    assert not native.video_available()
    with pytest.raises(RuntimeError):
        native.H264Writer("/tmp/x.mp4", 64, 48, fps=8)
