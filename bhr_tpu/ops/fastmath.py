"""Fast transcendental approximations for sampling hot paths.

XLA lowers atan2/arccos to long polynomial chains; texture-coordinate
math runs them per ray (millions per frame) and they dominated the
deferred-shading pass. These ~1e-4-rad approximations cost ~15 VPU ops:
at a 2912-texel azimuth that is a 0.05-texel coordinate error — far
below the bilinear filter's own footprint.
"""

from __future__ import annotations

import jax.numpy as jnp

_PI = 3.14159265358979
_HALF_PI = 1.5707963267948966


def fast_atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """atan2 via a degree-9 odd polynomial on [0, 1] + octant folding.

    Max error ~1e-5 rad; matches jnp.arctan2's conventions for all
    quadrants (result in (-pi, pi]).
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    a = mn / jnp.maximum(mx, 1e-30)
    s = a * a
    # Horner polynomial for atan(a), a in [0, 1].
    r = a * (
        0.99997726
        + s * (-0.33262347
               + s * (0.19354346
                      + s * (-0.11643287
                             + s * (0.05265332 + s * -0.01172120))))
    )
    r = jnp.where(ay > ax, _HALF_PI - r, r)
    r = jnp.where(x < 0.0, _PI - r, r)
    return jnp.where(y < 0.0, -r, r)


def fast_arccos(z: jnp.ndarray) -> jnp.ndarray:
    """arccos(z) = atan2(sqrt(1 - z^2), z), using the fast atan2."""
    z = jnp.clip(z, -1.0, 1.0)
    return fast_atan2(jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0)), z)
