"""Device mesh helpers for multi-chip frame rendering.

The reference is single-process single-device; its latent frame-level
parallelism (sequential orbit loop, render.py:4437-4476) becomes the
primary multi-chip axis here: orbit frames are embarrassingly parallel
given deterministic per-frame scene state, so they shard across chips
over ICI with no collectives in the render path (only a gather of
completed frames / metrics at the end).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> int:
    """Initialize jax.distributed for multi-host rendering over DCN.

    On single-host runs this is a no-op returning 1. On a pod slice (or
    a CPU fleet), call before any jax API with the coordinator address;
    afterwards `jax.devices()` spans all hosts and `make_frame_mesh`
    builds a global mesh — frame sharding needs no collectives, so
    cross-host traffic is zero during rendering (only the final PNG
    gather, which each host writes locally anyway).

    Extra kwargs pass through to jax.distributed.initialize — e.g.
    ``heartbeat_timeout_seconds`` to tune how fast the fleet notices a
    dead process (the fleet-abort tests shorten it from the 100 s
    default).

    Returns the process count.
    """
    import jax

    if coordinator_address is None:
        return 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    return jax.process_count()


def make_frame_mesh(
    n_frames_axis: Optional[int] = None,
    n_tile_axis: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ("frames", "tile") mesh over the available devices.

    frames — data-parallel axis over orbit frames.
    tile   — spatial axis splitting pixel rows within a frame (useful for
             single large frames on many chips).
    """
    devs = list(devices if devices is not None else jax.devices())
    total = len(devs)
    if n_frames_axis is None:
        n_frames_axis = total // n_tile_axis
    if n_frames_axis * n_tile_axis != total:
        raise ValueError(
            f"mesh {n_frames_axis}x{n_tile_axis} != {total} devices"
        )
    arr = np.asarray(devs).reshape(n_frames_axis, n_tile_axis)
    return Mesh(arr, ("frames", "tile"))
