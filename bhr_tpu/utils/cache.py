"""Caching: disk-texture .npy cache + persistent XLA compile cache.

Parity targets: reference `load_cached_disk_texture` (render.py:
1152-1187, cache key disk_{r1}_{r2}_{seed}_{nphi}x{nr}_scale{s}.npy) and
the Taichi offline kernel cache (render.py:2222-2223) — the XLA
equivalent is jax's persistent compilation cache.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

DEFAULT_CACHE_DIR = "output/.disk_texture_cache"
DEFAULT_COMPILE_CACHE = os.path.expanduser("~/.cache/bhr_tpu_xla")


def enable_compile_cache(path: str = DEFAULT_COMPILE_CACHE) -> None:
    """Turn on jax's persistent compilation cache (idempotent)."""
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def texture_cache_key(r_inner: float, r_outer: float, seed: int,
                      n_phi: int, n_r: int, generation_scale: int) -> str:
    return (f"disk_{r_inner:.2f}_{r_outer:.2f}_{seed}_{n_phi}x{n_r}"
            f"_scale{generation_scale}.npy")


def load_cached_disk_texture(
    width: Optional[int] = None,
    height: Optional[int] = None,
    cam_pos: Optional[List[float]] = None,
    fov: Optional[float] = None,
    seed: int = 42,
    r_inner: float = 2.0,
    r_outer: float = 3.5,
    force: bool = False,
    generation_scale: int = 2,
    cache_dir: Optional[str] = None,
) -> np.ndarray:
    """Load or generate-and-cache the static disk texture.

    Resolution is camera-dependent when width/height/cam_pos/fov are all
    given, else 1024x512. Returns (n_r, n_phi, 4) float32.
    """
    from ..config import compute_disk_texture_resolution
    from ..models.disk_texture import generate_disk_texture

    if (
        width is not None and height is not None
        and cam_pos is not None and fov is not None
    ):
        n_phi, n_r = compute_disk_texture_resolution(
            width, height, tuple(cam_pos), fov, r_inner, r_outer
        )
    else:
        n_phi, n_r = 1024, 512

    if cache_dir is None:
        # Resolved at call time so tests (and embedders) can repoint
        # DEFAULT_CACHE_DIR.
        cache_dir = DEFAULT_CACHE_DIR
    key = texture_cache_key(r_inner, r_outer, seed, n_phi, n_r, generation_scale)
    path = os.path.join(cache_dir, key)
    if not force and os.path.exists(path):
        return np.load(path)

    tex = np.asarray(
        generate_disk_texture(
            n_phi=n_phi, n_r=n_r, seed=seed, r_inner=r_inner,
            r_outer=r_outer, generation_scale=generation_scale,
        )
    )
    os.makedirs(cache_dir, exist_ok=True)
    np.save(path, tex)
    return tex
