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


def write_json_atomic(path: str, obj) -> None:
    """Write JSON via temp file + os.replace so a kill mid-write can
    never leave truncated JSON (the video resume protocol reads this
    back; a corrupt progress.json must not be able to exist)."""
    import json

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def quantize_frame(image: np.ndarray) -> np.ndarray:
    """(H, W, 3) float [0,1] or uint8 -> uint8, the one quantizer every
    frame consumer shares (PNG frames, inline H.264, MJPEG) so a video
    assembled from RAM is pixel-identical to one assembled from the
    PNGs on disk.

    Round, not truncate: the sharded video engine quantizes on device
    with jnp.round, and both engines share one frame dir under resume —
    the quantizers must agree. (The reference truncates, render.py:423;
    a half-LSB bias, not a visual one.)
    """
    if image.dtype == np.uint8:
        return image
    return np.round(np.clip(image, 0.0, 1.0) * 255.0).astype(np.uint8)


def save_image(image: np.ndarray, path: str) -> None:
    """Save an (H, W, 3) image as PNG (float in [0, 1] or uint8).

    Uses the native C++ encoder (bhr_tpu/native) when it built on this
    host — ~5x faster than PIL on the single-core render host, which
    makes PNG encode the video loop's bottleneck otherwise. Falls back
    to PIL (BHR_TPU_NATIVE=0, missing toolchain, or non-PNG suffix).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    img_uint8 = quantize_frame(image)

    if (
        path.lower().endswith(".png")
        and img_uint8.ndim == 3
        and img_uint8.shape[2] == 3
    ):
        from bhr_tpu import native

        if native.available():
            native.save_png_rgb8(img_uint8, path)
            return
    from PIL import Image

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
    with Image.open(frame_paths[0]) as first:
        width, height = first.size
    n = len(frame_paths)

    def chunk_header(fourcc: bytes, size: int) -> bytes:
        return fourcc + struct.pack("<I", size)

    def pack_avih(max_size: int) -> bytes:
        return struct.pack(
            "<14I",
            int(1_000_000 / max(fps, 1)),  # microseconds per frame
            max_size * fps,                # max bytes per second (bound)
            0,                             # padding granularity
            0x10,                          # AVIF_HASINDEX
            n, 0, 1, max_size, width, height, 0, 0, 0, 0,
        )

    def pack_strh(max_size: int) -> bytes:
        # dwQuality = -1 (driver default), dwSampleSize = 0 (required
        # for 'vids' streams: frames are variable-size).
        return struct.pack(
            "<4s4sIHHIIIIIIiI4H",
            b"vids", b"MJPG", 0, 0, 0, 0,
            1, max(fps, 1),                # scale / rate -> fps
            0, n, max_size, -1, 0,
            0, 0, width, height,
        )

    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )

    # Streaming layout: headers are written with placeholder sizes,
    # frames are JPEG-encoded and appended one at a time (peak memory
    # is one frame, not the whole video), then RIFF/movi/avih/strh
    # size fields are patched in place.
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "wb") as fh:
        fh.write(chunk_header(b"RIFF", 0) + b"AVI ")

        hdrl_payload = (
            b"hdrl"
            + chunk_header(b"avih", 56) + pack_avih(0)
            + chunk_header(b"LIST", 4 + 8 + 56 + 8 + len(strf))
            + b"strl"
            + chunk_header(b"strh", 56) + pack_strh(0)
            + chunk_header(b"strf", len(strf)) + strf
        )
        hdrl_at = fh.tell()
        fh.write(chunk_header(b"LIST", len(hdrl_payload)) + hdrl_payload)

        movi_list_at = fh.tell()
        fh.write(chunk_header(b"LIST", 0) + b"movi")

        index = []  # (offset_in_movi, padded_size)
        offset = 4  # relative to the start of the 'movi' fourcc
        max_size = 0
        for p_frame in frame_paths:
            buf = _io.BytesIO()
            with Image.open(p_frame) as im:
                im.convert("RGB").save(buf, "JPEG", quality=quality)
            data = buf.getvalue()
            # RIFF: ckSize excludes the odd-length pad byte; the pad is
            # written after the declared payload (a padded-in ckSize
            # makes strict re-muxers carry a trailing 0x00 into the
            # JPEG stream).
            pad = b"\x00" if len(data) % 2 else b""
            fh.write(chunk_header(b"00dc", len(data)) + data + pad)
            index.append((offset, len(data)))
            offset += 8 + len(data) + len(pad)
            max_size = max(max_size, len(data))

        # offset accumulated 8 + payload + pad per chunk from a start of
        # 4 (the 'movi' fourcc), which is exactly the LIST payload size.
        movi_size = offset
        fh.write(chunk_header(b"idx1", 16 * n))
        for off, sz in index:
            fh.write(struct.pack("<4sIII", b"00dc", 0x10, off, sz))

        riff_size = fh.tell() - 8
        fh.seek(4)
        fh.write(struct.pack("<I", riff_size))
        fh.seek(movi_list_at + 4)
        fh.write(struct.pack("<I", movi_size))
        # hdrl layout: LIST(8) 'hdrl'(4) 'avih'+size(8) <avih 56>
        #              LIST(8) 'strl'(4) 'strh'+size(8) <strh 56> ...
        fh.seek(hdrl_at + 20)
        fh.write(pack_avih(max_size))
        fh.seek(hdrl_at + 20 + 56 + 8 + 4 + 8)
        fh.write(pack_strh(max_size))


# Containers the native H.264 writer handles; shared by the inline
# assembler and the post-pass native path so they can never disagree.
H264_CONTAINER_EXTS = (".mp4", ".mkv", ".mov")


class IncrementalH264Assembler:
    """Encode the orbit video WHILE frames render, from RAM.

    The reference assembles its video in a post-pass over the PNG
    frames (render.py:4497-4503) — which re-decodes every frame it
    just encoded. Here each rendered frame is already in host memory
    when the PNG is queued, so it is fed straight into the native
    H.264 writer; on an uninterrupted run the video is finished the
    moment the last frame renders and the post-pass (and its
    full-video PNG decode) never runs.

    The PNG frames stay the durability anchor, untouched:

    - resume: frames completed by an earlier session exist only on
      disk; ``submit`` transparently catches up by decoding the gap
      frames (in index order) before encoding the fresh one.
    - interruption / any encode error: the writer is ABORTED (no MP4
      trailer — see H264Writer.abort) and the partial file removed;
      ``finalize`` then reports False and the caller falls back to the
      post-pass assembler chain.
    - unavailability (no native codec, odd dimensions, non-MP4 output):
      the assembler is inert from birth and ``finalize`` returns False.

    Frames are quantized with the same ``quantize_frame`` as the PNG
    writer, so the inline video is pixel-identical to a post-pass one.

    Use as a context manager around the whole render-and-finalize
    region: ``__exit__`` discards on any in-flight exception (including
    those raised after the frame loop, e.g. a failed PNG drain), so no
    partial file can survive at the advertised path.
    """

    def __init__(self, output_path: str, n_frames: int, fps: int,
                 temp_dir: str, crf: int = 18):
        self._path = output_path
        self._n = n_frames
        self._fps = fps
        self._crf = crf
        self._dir = temp_dir
        self._writer = None
        self._next = 0
        # True once this session touched the file at output_path —
        # discard() must never delete a pre-existing video this run
        # never wrote (e.g. inert assembler + Ctrl-C).
        self._opened = False
        ext = os.path.splitext(output_path)[1].lower()
        self._dead = ext not in H264_CONTAINER_EXTS
        if not self._dead:
            try:
                from bhr_tpu import native

                self._dead = not native.video_available()
            except Exception:
                self._dead = True

    def _encode(self, rgb: np.ndarray) -> None:
        if self._writer is None:
            from bhr_tpu import native

            h, w = rgb.shape[:2]
            if (h % 2) or (w % 2):
                # Check before touching the filesystem: an inert-able
                # condition must not mark the output file as ours.
                raise ValueError(f"odd dimensions {w}x{h} for yuv420p")
            os.makedirs(os.path.dirname(self._path) or ".", exist_ok=True)
            # From here the native open may create/truncate the file.
            self._opened = True
            self._writer = native.H264Writer(self._path, w, h, self._fps,
                                             crf=self._crf)
        self._writer.write(rgb)
        self._next += 1

    def _catch_up(self, upto: int) -> None:
        from PIL import Image

        while self._next < upto:
            p = os.path.join(self._dir, f"frame_{self._next:04d}.png")
            self._encode(np.asarray(Image.open(p).convert("RGB")))

    def submit(self, frame_idx: int, image: np.ndarray) -> None:
        """Feed frame `frame_idx` (fresh render, float [0,1] or uint8).

        Must be called in increasing frame order; earlier frames that
        were never submitted this session are read from their PNGs.
        Never raises on encode problems — the assembler goes inert and
        the post-pass fallback takes over at finalize()."""
        if self._dead or frame_idx >= self._n:
            return
        try:
            self._catch_up(frame_idx)
            self._encode(quantize_frame(np.asarray(image)))
        except Exception as exc:
            self._report_fallback(exc)
            self.discard()

    def finalize(self) -> bool:
        """Close the container. True = video complete at output_path;
        False = caller must run the post-pass assembler chain."""
        if self._dead:
            return False
        try:
            self._catch_up(self._n)
            if self._writer is None:  # zero frames
                raise RuntimeError("no frames were encoded")
            writer, self._writer = self._writer, None
            writer.close()
            self._dead = True
            return True
        except Exception as exc:
            self._report_fallback(exc)
            self.discard()
            return False

    def _report_fallback(self, exc: Exception) -> None:
        """One diagnostic line when inline assembly dies — without it
        the silent post-pass fallback would be undebuggable."""
        if not self._dead:
            print(f"inline H.264 assembly failed at frame {self._next} "
                  f"({exc!r}); the post-pass assembler will run instead")

    def discard(self) -> None:
        """Abort without a trailer and, if THIS session wrote to the
        output path, remove the partial file (a pre-existing video from
        an earlier completed run is never deleted). Idempotent; the PNG
        frames are untouched."""
        if self._writer is not None:
            writer, self._writer = self._writer, None
            try:
                writer.abort()
            except Exception:
                pass
        self._dead = True
        if self._opened:
            self._opened = False
            try:
                os.remove(self._path)
            except OSError:
                pass

    def __enter__(self) -> "IncrementalH264Assembler":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is not None:
            self.discard()
