"""Approximate quantiles via histogram counting (sort-free).

TPU sorts are bitonic networks — jnp.percentile over a ~1.2M-texel field
costs hundreds of passes and dominated the per-frame dynamic-texture
stats (SURVEY.md §7 flags percentile normalization as a hard part).
Counting quantiles replace the sort with threshold-comparisons fused
into reductions: error <= (hi - lo) / bins, plenty for normalization
stats that only steer brightness scaling.

Implementation note: thresholds are processed in small chunks (a full
(N, bins) broadcast would materialize gigabytes); each chunk is an
elementwise compare fused into a reduction.
"""

from __future__ import annotations

import jax.numpy as jnp

_CHUNK = 16


def _edges(lo, hi, bins: int) -> jnp.ndarray:
    return lo + (hi - lo) * jnp.arange(1, bins + 1) / bins


def approx_quantile(
    x: jnp.ndarray,
    q: float,
    bins: int = 512,
    lo: float = 0.0,
    hi=None,
    mask=None,
) -> jnp.ndarray:
    """Approximate q-quantile of ``x`` (optionally masked), sort-free."""
    flat = x.reshape(-1)
    if hi is None:
        hi = jnp.max(flat)
    hi = jnp.maximum(hi, lo + 1e-9)
    edges = _edges(lo, hi, bins)

    if mask is not None:
        mflat = mask.reshape(-1)
        n = jnp.sum(mflat)
    else:
        mflat = None
        n = flat.shape[0]

    counts = []
    for c0 in range(0, bins, _CHUNK):
        e = edges[c0 : c0 + _CHUNK]
        le = flat[:, None] <= e[None, :]
        if mflat is not None:
            le = le & mflat[:, None]
        counts.append(jnp.sum(le, axis=0))
    counts = jnp.concatenate(counts)

    target = q * n
    reached = counts >= target
    idx = jnp.argmax(reached)
    return jnp.where(jnp.any(reached), edges[idx], hi)


def approx_quantile_rows(
    x: jnp.ndarray, q: float, bins: int = 64, lo: float = 0.0, hi=None
) -> jnp.ndarray:
    """Row-wise approximate q-quantiles of an (R, C) array -> (R,)."""
    if hi is None:
        hi = jnp.max(x)
    hi = jnp.maximum(hi, lo + 1e-9)
    edges = _edges(lo, hi, bins)
    counts = []
    for c0 in range(0, bins, _CHUNK):
        e = edges[c0 : c0 + _CHUNK]
        counts.append(jnp.sum(x[:, :, None] <= e[None, None, :], axis=1))
    counts = jnp.concatenate(counts, axis=1)  # (R, B)
    target = q * x.shape[1]
    reached = counts >= target
    idx = jnp.argmax(reached, axis=1)
    vals = edges[idx]
    return jnp.where(jnp.any(reached, axis=1), vals, hi)
