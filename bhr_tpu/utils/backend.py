"""Backend liveness probe, safe against a dead device relay.

Initializing the default JAX backend can BLOCK for many minutes when it
is a remote-tunneled accelerator whose relay is down (observed on this
environment's TPU tunnel: ~20 min hang, then UNAVAILABLE). Worse,
backend init holds a process-global lock and ``jax.devices("cpu")``
initializes *all* registered plugins first — so once any thread in the
process touches the dead backend, even the CPU fallback blocks. The
only safe probe is a subprocess: kill it on timeout and the probing
process stays clean (it can then pin jax_platforms=cpu and never
initialize the dead plugin at all).

Shared by the driver hooks (__graft_entry__) and bench.py.
"""

from __future__ import annotations

import subprocess
import sys


def probe_default_backend(timeout_s: float = 60.0) -> int:
    """Default-backend device count, or -1 if the probe failed or timed
    out (backend unusable)."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        if out.returncode == 0:
            return int(out.stdout.strip().splitlines()[-1])
    except (subprocess.TimeoutExpired, ValueError, IndexError):
        pass
    return -1
