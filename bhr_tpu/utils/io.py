"""Image IO: PNG save (sync + async pool), disk texture loading.

Parity targets: reference `save_image` (/root/reference/render.py:420-425),
`load_disk_texture` + `compute_edge_alpha` (render.py:437-459), and the
async PNG writer used by the video loop (render.py:4412-4417).
"""

from __future__ import annotations

import os
from concurrent.futures import Future, ThreadPoolExecutor
from typing import List, Optional

import numpy as np


def compute_edge_alpha(height: int, inner_soft: float = 0.1, outer_soft: float = 0.3) -> np.ndarray:
    """Radial edge-softening alpha for an (n_r,) texture column.

    Cubic ramp over the inner `inner_soft` fraction, quadratic falloff over
    the outer `outer_soft` fraction.
    """
    v = np.linspace(0.0, 1.0, height).astype(np.float32)
    alpha = np.ones_like(v)
    inner = v < inner_soft
    outer = v > (1.0 - outer_soft)
    alpha[inner] = (v[inner] / inner_soft) ** 3.0
    alpha[outer] = ((1.0 - v[outer]) / outer_soft) ** 2.0
    return alpha


def load_disk_texture(path: Optional[str]) -> Optional[np.ndarray]:
    """Load an external disk texture -> (h, w, 4) RGBA with edge softening."""
    if path and os.path.isfile(path):
        from PIL import Image

        img = Image.open(path).convert("RGB")
        rgb = np.asarray(img, dtype=np.float32) / 255.0
        h, w = rgb.shape[:2]
        alpha = np.broadcast_to(compute_edge_alpha(h)[:, None], (h, w)).copy()
        return np.concatenate([rgb, alpha[:, :, None]], axis=2)
    return None


def save_image(image: np.ndarray, path: str) -> None:
    """Save an (H, W, 3) image as PNG (float in [0, 1] or uint8)."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if image.dtype == np.uint8:
        img_uint8 = image
    else:
        img_uint8 = (np.clip(image, 0.0, 1.0) * 255.0).astype(np.uint8)
    Image.fromarray(img_uint8, "RGB").save(path)


class AsyncPNGWriter:
    """Bounded-queue asynchronous PNG writer (overlaps IO with rendering)."""

    def __init__(self, max_workers: int = 2, max_pending: int = 4):
        self._pool = ThreadPoolExecutor(max_workers=max_workers)
        self._pending: List[Future] = []
        self._max_pending = max_pending

    def submit(self, image: np.ndarray, path: str) -> None:
        if len(self._pending) >= self._max_pending:
            self._pending.pop(0).result()
        self._pending.append(self._pool.submit(save_image, image, path))

    def drain(self) -> None:
        for f in self._pending:
            f.result()
        self._pending.clear()

    def close(self) -> None:
        self.drain()
        self._pool.shutdown(wait=False)


def write_mjpeg_avi(
    frame_paths: List[str], output_path: str, fps: int,
    quality: int = 92,
) -> None:
    """Assemble PNG frames into an MJPEG AVI with no external encoder.

    Dependency-free fallback for hosts without pyav/ffmpeg (the
    reference hard-depends on pyav, render.py:4497-4503): every frame
    is JPEG-encoded via PIL and wrapped in a RIFF/AVI container with an
    idx1 index — playable by ffplay/VLC/browsers and losslessly
    re-muxable to MP4 later (`ffmpeg -i x.avi -c copy x.mp4`).
    """
    import io as _io
    import struct

    from PIL import Image

    if not frame_paths:
        raise ValueError("no frames to assemble")
    first = Image.open(frame_paths[0])
    width, height = first.size

    jpegs = []
    for p in frame_paths:
        buf = _io.BytesIO()
        Image.open(p).convert("RGB").save(buf, "JPEG", quality=quality)
        data = buf.getvalue()
        if len(data) % 2:
            data += b"\x00"
        jpegs.append(data)

    n = len(jpegs)
    max_size = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(payload)) + payload

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<14I",
        int(1_000_000 / max(fps, 1)),  # microseconds per frame
        max_size * fps,                # max bytes per second (upper bound)
        0,                             # padding granularity
        0x10,                          # AVIF_HASINDEX
        n, 0, 1, max_size, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, max(fps, 1),                # scale / rate -> fps
        0, n, max_size, 0xFFFFFFFF - 1, -1,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_payload = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_payload)

    idx_entries = []
    offset = 4  # relative to the start of the 'movi' fourcc
    for j in jpegs:
        idx_entries.append(
            struct.pack("<4sIII", b"00dc", 0x10, offset, len(j))
        )
        offset += 8 + len(j)
    idx1 = chunk(b"idx1", b"".join(idx_entries))

    riff_payload = b"AVI " + hdrl + movi + idx1
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "wb") as fh:
        fh.write(chunk(b"RIFF", riff_payload))
