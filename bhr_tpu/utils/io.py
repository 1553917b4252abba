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
