"""Procedural noise primitives (pure JAX, jax.random-keyed).

One implementation replaces BOTH of the reference's duplicated noise
stacks: the host NumPy generators (render.py:1026-1091) and the Taichi
device simplex/FBM (render.py:2639-2785). RNG uses jax.random keys —
determinism-by-seed is preserved, but streams differ from NumPy, so
parity with the reference is statistical, not bitwise (SURVEY.md §7
"RNG parity").

TPU note: the classic simplex permutation table (reference
render.py:2269-2288) is replaced by a computational integer hash —
chained table lookups lower to gathers, and at texture scale the
background generator would issue billions of them per frame.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp



def _grad3_dot(h, x, y, z):
    """Dot of an edge-gradient direction (selected by hash) with the
    offset vector — Perlin's classic h & 15 gradient table (12 edge
    directions, 4 duplicated) in branchless form. `& 15` replaces an
    integer mod-12 (a multi-op division on the VPU)."""
    h = h & 15
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    r1 = jnp.where(h & 1 == 0, u, -u)
    r2 = jnp.where(h & 2 == 0, v, -v)
    return r1 + r2


def _hash3(i, j, k):
    """Computational lattice hash (int32 multiply-xorshift mix).

    Replaces the classic chained permutation-table lookups
    (PERM[i + PERM[j + PERM[k]]]) — on TPU each table lookup is a
    gather, and simplex evaluates 4 corners x 3 chained lookups per
    sample; at texture scale that is billions of gathers per frame. The
    mix below is pure VPU integer ALU with equivalent statistical
    quality (different stream: visual parity is statistical, not
    bitwise, per SURVEY.md RNG-parity note).
    """
    h = (
        i * jnp.int32(374761393)
        + j * jnp.int32(668265263)
        + k * jnp.int32(1440662683)
    )
    h = (h ^ (h >> 13)) * jnp.int32(1274126177)
    h = h ^ (h >> 16)
    return h & jnp.int32(0x7FFFFFFF)


def simplex_noise_3d(x, y, z):
    """Gustavson 3D simplex noise, fully vectorized. Output ~[-1, 1]."""
    f3 = 1.0 / 3.0
    g3 = 1.0 / 6.0

    s = (x + y + z) * f3
    i = jnp.floor(x + s).astype(jnp.int32)
    j = jnp.floor(y + s).astype(jnp.int32)
    k = jnp.floor(z + s).astype(jnp.int32)

    t = (i + j + k).astype(x.dtype) * g3
    x0 = x - (i.astype(x.dtype) - t)
    y0 = y - (j.astype(x.dtype) - t)
    z0 = z - (k.astype(x.dtype) - t)

    # Simplex corner offsets: Gustavson's 6-case ordering branch tree
    # (reference render.py:2697-2712) reduced to boolean algebra over
    # the three pairwise comparisons — 6 logic ops instead of a 36-way
    # select table (truth-table equivalent, verified in tests against
    # the scalar oracle).
    a = x0 >= y0
    b = y0 >= z0
    c = x0 >= z0

    b_i1 = a & (b | c)
    b_j1 = (~a) & b
    b_k1 = (~b) & ~(a & c)
    b_i2 = a | (b & c)
    b_j2 = (~a) | b
    b_k2 = (~b) | ((~a) & (~c))

    i1 = b_i1.astype(jnp.int32)
    j1 = b_j1.astype(jnp.int32)
    k1 = b_k1.astype(jnp.int32)
    i2 = b_i2.astype(jnp.int32)
    j2 = b_j2.astype(jnp.int32)
    k2 = b_k2.astype(jnp.int32)

    x1 = x0 - b_i1.astype(x.dtype) + g3
    y1 = y0 - b_j1.astype(x.dtype) + g3
    z1 = z0 - b_k1.astype(x.dtype) + g3
    x2 = x0 - b_i2.astype(x.dtype) + 2.0 * g3
    y2 = y0 - b_j2.astype(x.dtype) + 2.0 * g3
    z2 = z0 - b_k2.astype(x.dtype) + 2.0 * g3
    x3 = x0 - 1.0 + 3.0 * g3
    y3 = y0 - 1.0 + 3.0 * g3
    z3 = z0 - 1.0 + 3.0 * g3

    gi0 = _hash3(i, j, k)
    gi1 = _hash3(i + i1, j + j1, k + k1)
    gi2 = _hash3(i + i2, j + j2, k + k2)
    gi3 = _hash3(i + 1, j + 1, k + 1)

    def corner(t, gi, cx, cy, cz):
        t = jnp.maximum(t, 0.0)
        t2 = t * t
        return t2 * t2 * _grad3_dot(gi, cx, cy, cz)

    n0 = corner(0.6 - x0 * x0 - y0 * y0 - z0 * z0, gi0, x0, y0, z0)
    n1 = corner(0.6 - x1 * x1 - y1 * y1 - z1 * z1, gi1, x1, y1, z1)
    n2 = corner(0.6 - x2 * x2 - y2 * y2 - z2 * z2, gi2, x2, y2, z2)
    n3 = corner(0.6 - x3 * x3 - y3 * y3 - z3 * z3, gi3, x3, y3, z3)
    return 32.0 * (n0 + n1 + n2 + n3)


def fbm_3d(x, y, z, octaves: int = 4, persistence: float = 0.5,
           lacunarity: float = 2.0):
    """Fractal Brownian motion over 3D simplex noise (unrolled octaves)."""
    value = 0.0
    amplitude = 1.0
    freq = 1.0
    for _ in range(octaves):
        value = value + amplitude * simplex_noise_3d(x * freq, y * freq, z * freq)
        amplitude *= persistence
        freq *= lacunarity
    return value


@functools.partial(jax.jit, static_argnames=("shape", "max_arcs"))
def tileable_noise(key, shape: Tuple[int, int], max_arcs: int = 60) -> jnp.ndarray:
    """Cloudy arc noise, seamless in the phi (second) axis.

    30-60 soft arcs: von-Mises-like azimuthal profile
    exp(kappa (cos(phi - phi_0) - 1)) x radial Gaussian, summed and
    clipped to [0, 1]. Parity: reference `_tileable_noise`
    (render.py:1026-1054); vectorized over a padded max_arcs batch with
    zero-intensity padding instead of a Python loop.
    """
    h, w = shape
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    n_arcs = jax.random.randint(k1, (), 30, 60)
    arc_phi = jax.random.uniform(k2, (max_arcs,), maxval=2.0 * jnp.pi)
    arc_r = jnp.sqrt(jax.random.uniform(k3, (max_arcs,)))
    arc_phi_width = jax.random.uniform(k4, (max_arcs,), minval=0.15, maxval=0.5)
    arc_r_width = jax.random.uniform(k5, (max_arcs,), minval=0.03, maxval=0.08)
    arc_intensity = jax.random.uniform(k6, (max_arcs,), minval=0.03, maxval=0.12)
    arc_intensity = jnp.where(jnp.arange(max_arcs) < n_arcs, arc_intensity, 0.0)

    phi = jnp.linspace(0.0, 2.0 * jnp.pi, w, endpoint=False)
    r = jnp.linspace(0.0, 1.0, h)
    phi_g, r_g = jnp.meshgrid(phi, r)

    kappa = 0.6 / (arc_phi_width**2)
    az = jnp.exp(
        kappa[:, None, None]
        * (jnp.cos(phi_g[None] - arc_phi[:, None, None]) - 1.0)
    )
    rad = jnp.exp(
        -0.5 * ((r_g[None] - arc_r[:, None, None]) / arc_r_width[:, None, None]) ** 2
    )
    cloud = jnp.sum(az * rad * arc_intensity[:, None, None], axis=0)
    return jnp.clip(cloud, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("shape",))
def periodic_pixel_noise(key, shape: Tuple[int, int]) -> jnp.ndarray:
    """White pixel noise in [-1, 1], periodic in phi (last column = first)."""
    h, w = shape
    noise = jax.random.uniform(key, (h, w))
    noise = noise.at[:, -1].set(noise[:, 0])
    return noise * 2.0 - 1.0


def _bilinear_resize(small: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear upscale of an (h, w) array (align-centers convention)."""
    h, w = small.shape
    ys = (jnp.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (jnp.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    fy = jnp.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xs - x0, 0.0, 1.0)[None, :]
    top = small[y0][:, x0] * (1 - fx) + small[y0][:, x1] * fx
    bot = small[y1][:, x0] * (1 - fx) + small[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


def fbm_noise(
    key,
    shape: Tuple[int, int],
    octaves: int = 4,
    persistence: float = 0.5,
    base_scale: int = 1,
    wrap_u: bool = False,
) -> jnp.ndarray:
    """2D FBM field in [0, ~1].

    wrap_u=True sums tileable arc-noise octaves (phi-seamless) and
    normalizes by the max; wrap_u=False sums bilinear-upscaled random
    grids (image-pyramid FBM). Parity: reference `_fbm_noise`
    (render.py:1068-1091).
    """
    h, w = shape
    keys = jax.random.split(key, octaves)
    if wrap_u:
        result = jnp.zeros(shape)
        for idx in range(octaves):
            result = result + tileable_noise(keys[idx], shape) * (persistence**idx)
        return result / (jnp.max(result) + 1e-6)
    result = jnp.zeros(shape)
    amplitude = 1.0
    total = 0.0
    for idx in range(octaves):
        scale = base_scale * (2**idx)
        sh = max(h // scale, 2)
        sw = max(w // scale, 2)
        small = jax.random.uniform(keys[idx], (sh, sw))
        result = result + _bilinear_resize(small, h, w) * amplitude
        total += amplitude
        amplitude *= persistence
    return result / total
