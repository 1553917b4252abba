"""Native host-runtime components (C++, loaded via ctypes).

The TPU compute path is JAX/XLA/Pallas; the pieces that run on the host
CPU around it are native where they are hot. Currently:

- ``fastpng``: PNG encoder for the video frame writer. The render host
  has a single CPU core, so PIL's encoder (~200-400 ms per FHD frame)
  dominates a 58 ms device render; the C++ encoder (three-way filter
  heuristic + libdeflate/zlib) is ~5x faster. Parity target: the
  reference's PNG save + async writer pool
  (/root/reference/render.py:420-425, 4412-4417).
- ``fastvideo``: H.264/MP4 assembly via libavformat/libavcodec/libx264.
  The reference assembles orbit videos with imageio/pyav
  (/root/reference/render.py:4497-4503); this host ships the ffmpeg
  shared libraries but neither pyav nor an ffmpeg CLI, so without this
  module video output degrades to the MJPEG-AVI fallback.

Compilation happens on demand with g++ into ``_cache/`` keyed by a hash
of each source, so editing a .cpp invalidates cleanly. Everything
degrades gracefully: if a toolchain or library is missing, callers fall
back to pure-Python paths (``available()`` / ``video_available()`` gate
usage).

Set ``BHR_TPU_NATIVE=0`` to force the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile
import threading
from typing import Dict, List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.path.join(_DIR, "_cache")

# module name -> alternative link-flag sets, tried in order (first that
# compiles wins; e.g. fastpng prefers libdeflate, ~3x zlib's deflate
# throughput, and falls back to zlib).
_LINK_ATTEMPTS: Dict[str, List[List[str]]] = {
    "fastpng": [["-DUSE_LIBDEFLATE", "-ldeflate"], ["-lz"]],
    "fastvideo": [["-lavformat", "-lavcodec", "-lavutil", "-lswscale"]],
}

_libs: Dict[str, Optional[ctypes.CDLL]] = {}
# One compile at a time: without this the first concurrent callers
# (AsyncPNGWriter's two workers, parallel pytest) each spawn a full
# g++ -O3 of the same source on the single-core host.
_build_lock = threading.Lock()


def _disabled() -> bool:
    return os.environ.get("BHR_TPU_NATIVE", "1") == "0"


def _build_and_load(name: str) -> Optional[ctypes.CDLL]:
    src = os.path.join(_DIR, f"{name}.cpp")
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_CACHE, f"lib{name}-{tag}.so")
    if not os.path.exists(so_path):
        os.makedirs(_CACHE, exist_ok=True)
        # Compile to a temp name then os.replace: concurrent builders
        # (e.g. pytest workers) must never load a half-written .so.
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_CACHE)
        os.close(fd)
        base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, src]
        built = False
        for extra in _LINK_ATTEMPTS[name]:
            try:
                subprocess.run(base + extra, check=True, capture_output=True,
                               timeout=120)
                built = True
                break
            except subprocess.CalledProcessError as exc:
                # A genuine compile error (vs a missing library on the
                # last attempt) must be diagnosable: the silent fallback
                # to PIL/MJPEG would otherwise hide a broken .cpp edit
                # forever. Opt-in so toolchain-less hosts stay quiet.
                if os.environ.get("BHR_TPU_NATIVE_DEBUG"):
                    sys.stderr.write(
                        f"[bhr_tpu.native] build of {name} with "
                        f"{extra} failed:\n"
                        f"{exc.stderr.decode(errors='replace')}\n")
                continue
            except Exception as exc:
                if os.environ.get("BHR_TPU_NATIVE_DEBUG"):
                    sys.stderr.write(
                        f"[bhr_tpu.native] build of {name}: {exc!r}\n")
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
    _declare(name, lib)
    return lib


def _declare(name: str, lib: ctypes.CDLL) -> None:
    c_i32, c_vp = ctypes.c_int32, ctypes.c_void_p
    if name == "fastpng":
        lib.fastpng_write_rgb8.argtypes = [c_vp, c_i32, c_i32, c_i32,
                                           ctypes.c_char_p]
        lib.fastpng_write_rgb8.restype = ctypes.c_int
        lib.fastpng_encode_rgb8.argtypes = [
            c_vp, c_i32, c_i32, c_i32,
            ctypes.POINTER(c_vp), ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.fastpng_encode_rgb8.restype = ctypes.c_int
        lib.fastpng_free.argtypes = [c_vp]
        lib.fastpng_free.restype = None
    elif name == "fastvideo":
        lib.fastvideo_available.restype = ctypes.c_int
        lib.fastvideo_open.argtypes = [ctypes.c_char_p, c_i32, c_i32, c_i32,
                                       c_i32]
        lib.fastvideo_open.restype = c_vp
        lib.fastvideo_write_frame.argtypes = [c_vp, c_vp]
        lib.fastvideo_write_frame.restype = ctypes.c_int
        lib.fastvideo_close.argtypes = [c_vp]
        lib.fastvideo_close.restype = ctypes.c_int
        lib.fastvideo_abort.argtypes = [c_vp]
        lib.fastvideo_abort.restype = None
        lib.fastvideo_probe.argtypes = [ctypes.c_char_p] + [
            ctypes.POINTER(c_i32)] * 3
        lib.fastvideo_probe.restype = ctypes.c_int
        lib.fastvideo_read_frame0.argtypes = [ctypes.c_char_p, c_vp, c_i32,
                                              c_i32]
        lib.fastvideo_read_frame0.restype = ctypes.c_int


def _get_lib(name: str) -> Optional[ctypes.CDLL]:
    if _disabled():
        return None
    if name not in _libs:
        with _build_lock:
            if name not in _libs:
                _libs[name] = _build_and_load(name)
    return _libs[name]


# ---------------------------------------------------------------- fastpng


def available() -> bool:
    """True when the native PNG encoder compiled and loaded on this host."""
    return _get_lib("fastpng") is not None


def _check_rgb8(image: np.ndarray) -> np.ndarray:
    if image.dtype != np.uint8 or image.ndim != 3 or image.shape[2] != 3:
        raise ValueError(
            f"expected (H, W, 3) uint8, got {image.dtype} {image.shape}")
    return np.ascontiguousarray(image)


def save_png_rgb8(image: np.ndarray, path: str, level: int = 2) -> None:
    """Write an (H, W, 3) uint8 array as PNG via the native encoder.

    Raises RuntimeError if the encoder is unavailable or fails — callers
    (utils.io.save_image) catch nothing and must gate on available().
    """
    lib = _get_lib("fastpng")
    if lib is None:
        raise RuntimeError("native fastpng unavailable")
    img = _check_rgb8(image)
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
    lib = _get_lib("fastpng")
    if lib is None:
        raise RuntimeError("native fastpng unavailable")
    img = _check_rgb8(image)
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


# --------------------------------------------------------------- fastvideo


def video_available() -> bool:
    """True when the native H.264 writer compiled and has an encoder."""
    lib = _get_lib("fastvideo")
    return lib is not None and bool(lib.fastvideo_available())


class H264Writer:
    """Streaming H.264/MP4 writer over the native fastvideo module.

    Mirrors the reference's imageio/pyav usage (render.py:4497-4503):
    open once, write (H, W, 3) uint8 frames in order, close to flush
    the encoder and finalize the container. Context-manager friendly;
    close() is idempotent. Width and height must be even (yuv420p).
    """

    def __init__(self, path: str, width: int, height: int, fps: int,
                 crf: int = 18):
        lib = _get_lib("fastvideo")
        if lib is None or not lib.fastvideo_available():
            raise RuntimeError("native fastvideo unavailable")
        if width % 2 or height % 2:
            raise ValueError(
                f"H.264 yuv420p needs even dimensions, got {width}x{height}")
        self._lib = lib
        self._width, self._height = int(width), int(height)
        self._handle = lib.fastvideo_open(
            path.encode(), np.int32(width), np.int32(height),
            np.int32(fps), np.int32(crf),
        )
        if not self._handle:
            raise RuntimeError(f"fastvideo_open failed for {path!r}")

    def write(self, frame: np.ndarray) -> None:
        if self._handle is None:
            raise RuntimeError("writer is closed")
        img = _check_rgb8(frame)
        if img.shape[:2] != (self._height, self._width):
            raise ValueError(
                f"frame is {img.shape[1]}x{img.shape[0]}, "
                f"writer is {self._width}x{self._height}")
        rc = self._lib.fastvideo_write_frame(
            self._handle, img.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise RuntimeError(f"fastvideo_write_frame failed with code {rc}")

    def close(self) -> None:
        if self._handle is not None:
            handle, self._handle = self._handle, None
            rc = self._lib.fastvideo_close(handle)
            if rc != 0:
                raise RuntimeError(f"fastvideo_close failed with code {rc}")

    def abort(self) -> None:
        """Free the handle WITHOUT finalizing the container: the file
        is left without its moov box (unplayable), so an interrupted
        write can never masquerade as a finished video."""
        if self._handle is not None:
            handle, self._handle = self._handle, None
            self._lib.fastvideo_abort(handle)

    def __enter__(self) -> "H264Writer":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        # Finalize on success; on ANY in-flight exception (including
        # KeyboardInterrupt) abort so no trailer is written — a
        # truncated-but-playable file at the advertised path is the
        # failure mode the assembly chain promises not to produce.
        if exc_type is None:
            self.close()
        else:
            self.abort()


def probe_video(path: str):
    """(n_frames, width, height) of a video file, via libavformat."""
    lib = _get_lib("fastvideo")
    if lib is None:
        raise RuntimeError("native fastvideo unavailable")
    n = ctypes.c_int32()
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    rc = lib.fastvideo_probe(path.encode(), ctypes.byref(n), ctypes.byref(w),
                             ctypes.byref(h))
    if rc != 0:
        raise RuntimeError(f"fastvideo_probe failed with code {rc}")
    return int(n.value), int(w.value), int(h.value)


def read_first_frame(path: str, width: int, height: int) -> np.ndarray:
    """Decode the first video frame to (H, W, 3) uint8 (test seam)."""
    lib = _get_lib("fastvideo")
    if lib is None:
        raise RuntimeError("native fastvideo unavailable")
    out = np.empty((height, width, 3), np.uint8)
    rc = lib.fastvideo_read_frame0(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p),
        np.int32(width), np.int32(height),
    )
    if rc != 0:
        raise RuntimeError(f"fastvideo_read_frame0 failed with code {rc}")
    return out
