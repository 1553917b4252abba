"""Native host-runtime components (C++, loaded via ctypes).

The TPU compute path is JAX/XLA/Pallas; the pieces that run on the host
CPU around it are native where they are hot. Currently:

- ``fastpng``: PNG encoder for the video frame writer. The render host
  has a single CPU core, so PIL's encoder (~200-400 ms per FHD frame)
  dominates a 58 ms device render; the C++ encoder (three-way filter
  heuristic + zlib) cuts the host cost several-fold. Parity target: the
  reference's PNG save + async writer pool
  (/root/reference/render.py:420-425, 4412-4417).

Compilation happens on demand with g++ into ``_cache/`` keyed by a hash
of the source, so editing the .cpp invalidates cleanly. Everything
degrades gracefully: if a toolchain or zlib is missing, callers fall
back to PIL (``native.available()`` gates usage).

Set ``BHR_TPU_NATIVE=0`` to force the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastpng.cpp")
_CACHE = os.path.join(_DIR, "_cache")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _disabled() -> bool:
    return os.environ.get("BHR_TPU_NATIVE", "1") == "0"


def _build_and_load() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_CACHE, f"libfastpng-{tag}.so")
    if not os.path.exists(so_path):
        os.makedirs(_CACHE, exist_ok=True)
        # Compile to a temp name then os.replace: concurrent builders
        # (e.g. pytest workers) must never load a half-written .so.
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_CACHE)
        os.close(fd)
        base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, _SRC]
        # Prefer libdeflate (~3x zlib's deflate throughput); fall back
        # to zlib when the host lacks it.
        attempts = [base + ["-DUSE_LIBDEFLATE", "-ldeflate"], base + ["-lz"]]
        built = False
        for cmd in attempts:
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
                built = True
                break
            except Exception:
                continue
        if built:
            os.replace(tmp, so_path)
        else:
            if os.path.exists(tmp):
                os.unlink(tmp)
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.fastpng_write_rgb8.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_char_p,
    ]
    lib.fastpng_write_rgb8.restype = ctypes.c_int
    lib.fastpng_encode_rgb8.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.fastpng_encode_rgb8.restype = ctypes.c_int
    lib.fastpng_free.argtypes = [ctypes.c_void_p]
    lib.fastpng_free.restype = None
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _disabled():
        return None
    if not _tried:
        _tried = True
        _lib = _build_and_load()
    return _lib


def available() -> bool:
    """True when the native encoder compiled and loaded on this host."""
    return _get_lib() is not None


def save_png_rgb8(image: np.ndarray, path: str, level: int = 2) -> None:
    """Write an (H, W, 3) uint8 array as PNG via the native encoder.

    Raises RuntimeError if the encoder is unavailable or fails — callers
    (utils.io.save_image) catch nothing and must gate on available().
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native fastpng unavailable")
    if image.dtype != np.uint8 or image.ndim != 3 or image.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {image.dtype} {image.shape}")
    img = np.ascontiguousarray(image)
    h, w = img.shape[:2]
    rc = lib.fastpng_write_rgb8(
        img.ctypes.data_as(ctypes.c_void_p),
        np.int32(w), np.int32(h), np.int32(level),
        path.encode(),
    )
    if rc != 0:
        raise RuntimeError(f"fastpng_write_rgb8 failed with code {rc}")


def encode_png_rgb8(image: np.ndarray, level: int = 2) -> bytes:
    """Encode an (H, W, 3) uint8 array to PNG bytes (for tests/streams)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native fastpng unavailable")
    if image.dtype != np.uint8 or image.ndim != 3 or image.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {image.dtype} {image.shape}")
    img = np.ascontiguousarray(image)
    h, w = img.shape[:2]
    out = ctypes.c_void_p()
    out_len = ctypes.c_size_t()
    rc = lib.fastpng_encode_rgb8(
        img.ctypes.data_as(ctypes.c_void_p),
        np.int32(w), np.int32(h), np.int32(level),
        ctypes.byref(out), ctypes.byref(out_len),
    )
    if rc != 0:
        raise RuntimeError(f"fastpng_encode_rgb8 failed with code {rc}")
    try:
        return ctypes.string_at(out.value, out_len.value)
    finally:
        lib.fastpng_free(out)
