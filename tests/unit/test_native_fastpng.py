"""Native C++ PNG encoder: roundtrip correctness, fallback, wiring.

The encoder replaces PIL in the video frame writer (reference async PNG
pool, /root/reference/render.py:4412-4417). Everything here must hold on
any host: when the toolchain is missing, available() is False and
save_image silently uses PIL instead — so the wiring tests run either
way, and the encoder-specific tests skip.
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from bhr_tpu import native
from bhr_tpu.utils.io import save_image

needs_native = pytest.mark.skipif(
    not native.available(), reason="native fastpng did not build on this host"
)


def _roundtrip(arr: np.ndarray) -> np.ndarray:
    data = native.encode_png_rgb8(arr)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


@needs_native
def test_roundtrip_random_images():
    rng = np.random.default_rng(42)
    for shape in [(1, 1, 3), (1, 7, 3), (5, 1, 3), (2, 2, 3), (33, 61, 3), (128, 256, 3)]:
        arr = (rng.random(shape) * 255).astype(np.uint8)
        assert np.array_equal(_roundtrip(arr), arr), shape


@needs_native
def test_roundtrip_realistic_gradient_frame():
    # Smooth gradients + black background exercise the Sub/Up filter
    # choices (a flat random image always picks None).
    h, w = 90, 160
    y, x = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3), np.float32)
    img[..., 0] = np.exp(-((x - 80) ** 2 + (y - 45) ** 2) / 400.0)
    img[..., 1] = x / w
    img[..., 2] = y / h
    arr = (img * 255).astype(np.uint8)
    assert np.array_equal(_roundtrip(arr), arr)


@needs_native
def test_roundtrip_all_levels_and_extremes():
    arr = np.zeros((16, 16, 3), np.uint8)
    arr[8:, 8:] = 255
    for level in (0, 1, 2, 6, 9):
        data = native.encode_png_rgb8(arr, level=level)
        back = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert np.array_equal(back, arr), level


@needs_native
def test_write_to_file_matches_encode(tmp_path):
    rng = np.random.default_rng(7)
    arr = (rng.random((24, 40, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / "frame.png")
    native.save_png_rgb8(arr, path)
    back = np.asarray(Image.open(path).convert("RGB"))
    assert np.array_equal(back, arr)


@needs_native
def test_rejects_bad_inputs():
    with pytest.raises(ValueError):
        native.save_png_rgb8(np.zeros((4, 4, 4), np.uint8), "/tmp/x.png")
    with pytest.raises(ValueError):
        native.save_png_rgb8(np.zeros((4, 4, 3), np.float32), "/tmp/x.png")
    with pytest.raises(RuntimeError):
        # Unwritable path surfaces as a nonzero return code.
        native.save_png_rgb8(
            np.zeros((4, 4, 3), np.uint8), "/nonexistent-dir/x.png"
        )


@needs_native
def test_non_contiguous_input():
    rng = np.random.default_rng(3)
    big = (rng.random((20, 20, 3)) * 255).astype(np.uint8)
    view = big[::2, ::2]  # non-contiguous view
    assert np.array_equal(_roundtrip(view), np.ascontiguousarray(view))


def test_save_image_float_quantization_parity(tmp_path, monkeypatch):
    """save_image must quantize identically through native and PIL paths
    (the video resume protocol mixes engines over one frame dir)."""
    rng = np.random.default_rng(11)
    img = rng.random((12, 18, 3)).astype(np.float32)
    p_native = str(tmp_path / "n.png")
    p_pil = str(tmp_path / "p.png")
    save_image(img, p_native)
    monkeypatch.setenv("BHR_TPU_NATIVE", "0")
    save_image(img, p_pil)
    a = np.asarray(Image.open(p_native).convert("RGB"))
    b = np.asarray(Image.open(p_pil).convert("RGB"))
    assert np.array_equal(a, b)


def test_save_image_uint8_roundtrip(tmp_path):
    arr = (np.random.default_rng(5).random((9, 13, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / "u8.png")
    save_image(arr, path)
    assert np.array_equal(np.asarray(Image.open(path).convert("RGB")), arr)


def test_disable_env_forces_fallback(tmp_path, monkeypatch):
    monkeypatch.setenv("BHR_TPU_NATIVE", "0")
    assert not native.available()
    # save_image still works through PIL.
    arr = np.zeros((4, 4, 3), np.uint8)
    path = str(tmp_path / "d.png")
    save_image(arr, path)
    assert os.path.getsize(path) > 0
