"""Noise primitive tests: simplex oracle parity + field properties."""

import jax
import jax.numpy as jnp
import numpy as np

from bhr_tpu.ops.noise import (
    fbm_3d,
    fbm_noise,
    periodic_pixel_noise,
    simplex_noise_3d,
    tileable_noise,
)


def _hash3_oracle(i, j, k):
    """Scalar twin of ops.noise._hash3 (int32 two's-complement wrap,
    arithmetic right shift)."""

    def i32(x):
        x &= 0xFFFFFFFF
        return x - 0x100000000 if x >= 0x80000000 else x

    h = i32(i * 374761393 + j * 668265263 + k * 1440662683)
    h = i32((h ^ (h >> 13)) * 1274126177)
    h = i32(h ^ (h >> 16))
    return h & 0x7FFFFFFF


def _simplex_oracle(x, y, z):
    """Independent scalar NumPy implementation of Gustavson 3D simplex
    with the computational lattice hash.

    Scope: this oracle validates the *vectorized branchless* JAX
    implementation against straightforward scalar control flow (the
    corner-ordering branch tree, per-corner falloff). The hash and the
    h & 15 gradient table are shared constants of this framework's
    noise spec — deviations from the reference's table noise are
    documented in docs/PARITY.md (items 1, 9)."""

    def grad(h, x, y, z):
        h = h & 15
        u = x if h < 8 else y
        v = y if h < 4 else (x if h in (12, 14) else z)
        return (u if h & 1 == 0 else -u) + (v if h & 2 == 0 else -v)

    f3, g3 = 1.0 / 3.0, 1.0 / 6.0
    s = (x + y + z) * f3
    i, j, k = int(np.floor(x + s)), int(np.floor(y + s)), int(np.floor(z + s))
    t = (i + j + k) * g3
    x0, y0, z0 = x - (i - t), y - (j - t), z - (k - t)

    if x0 >= y0:
        if y0 >= z0:
            i1, j1, k1, i2, j2, k2 = 1, 0, 0, 1, 1, 0
        elif x0 >= z0:
            i1, j1, k1, i2, j2, k2 = 1, 0, 0, 1, 0, 1
        else:
            i1, j1, k1, i2, j2, k2 = 0, 0, 1, 1, 0, 1
    else:
        if y0 < z0:
            i1, j1, k1, i2, j2, k2 = 0, 0, 1, 0, 1, 1
        elif x0 < z0:
            i1, j1, k1, i2, j2, k2 = 0, 1, 0, 0, 1, 1
        else:
            i1, j1, k1, i2, j2, k2 = 0, 1, 0, 1, 1, 0

    x1, y1, z1 = x0 - i1 + g3, y0 - j1 + g3, z0 - k1 + g3
    x2, y2, z2 = x0 - i2 + 2 * g3, y0 - j2 + 2 * g3, z0 - k2 + 2 * g3
    x3, y3, z3 = x0 - 1 + 3 * g3, y0 - 1 + 3 * g3, z0 - 1 + 3 * g3

    gi0 = _hash3_oracle(i, j, k)
    gi1 = _hash3_oracle(i + i1, j + j1, k + k1)
    gi2 = _hash3_oracle(i + i2, j + j2, k + k2)
    gi3 = _hash3_oracle(i + 1, j + 1, k + 1)

    n = 0.0
    for (t0, gi, cx, cy, cz) in [
        (0.6 - x0 * x0 - y0 * y0 - z0 * z0, gi0, x0, y0, z0),
        (0.6 - x1 * x1 - y1 * y1 - z1 * z1, gi1, x1, y1, z1),
        (0.6 - x2 * x2 - y2 * y2 - z2 * z2, gi2, x2, y2, z2),
        (0.6 - x3 * x3 - y3 * y3 - z3 * z3, gi3, x3, y3, z3),
    ]:
        if t0 >= 0:
            n += t0**4 * grad(gi, cx, cy, cz)
    return 32.0 * n


def test_simplex_matches_scalar_oracle():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, (64, 3)).astype(np.float64)
    got = np.asarray(
        simplex_noise_3d(
            jnp.asarray(pts[:, 0], jnp.float32),
            jnp.asarray(pts[:, 1], jnp.float32),
            jnp.asarray(pts[:, 2], jnp.float32),
        )
    )
    want = np.array([_simplex_oracle(*p) for p in pts])
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_simplex_range_and_continuity():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-50, 50, (2000, 3)).astype(np.float32)
    vals = np.asarray(simplex_noise_3d(*[jnp.asarray(pts[:, i]) for i in range(3)]))
    assert np.abs(vals).max() <= 1.05
    assert vals.std() > 0.1
    # small perturbation -> small change
    eps = 1e-3
    vals2 = np.asarray(
        simplex_noise_3d(
            jnp.asarray(pts[:, 0] + eps), jnp.asarray(pts[:, 1]),
            jnp.asarray(pts[:, 2]),
        )
    )
    assert np.abs(vals2 - vals).max() < 0.05


def test_fbm_3d_more_octaves_more_detail():
    xs = jnp.linspace(0.0, 4.0, 512)
    a = np.asarray(fbm_3d(xs, xs * 0.7, xs * 0.3, octaves=1))
    b = np.asarray(fbm_3d(xs, xs * 0.7, xs * 0.3, octaves=5))
    # higher octave count adds high-frequency energy
    def hf_energy(v):
        return np.abs(np.diff(v)).mean()
    assert hf_energy(b) > hf_energy(a)


def test_tileable_noise_seamless():
    key = jax.random.PRNGKey(0)
    field = np.asarray(tileable_noise(key, (32, 128)))
    assert field.shape == (32, 128)
    assert field.min() >= 0.0 and field.max() <= 1.0
    # phi-seamless: wrap continuity between last and first columns is as
    # smooth as interior continuity.
    wrap_jump = np.abs(field[:, 0] - field[:, -1]).mean()
    interior_jump = np.abs(np.diff(field, axis=1)).mean()
    assert wrap_jump < interior_jump * 3 + 1e-3


def test_periodic_pixel_noise():
    key = jax.random.PRNGKey(3)
    n = np.asarray(periodic_pixel_noise(key, (16, 64)))
    np.testing.assert_array_equal(n[:, 0], n[:, -1])
    assert -1.0 <= n.min() and n.max() <= 1.0
    assert n.std() > 0.3


def test_fbm_noise_wrap_and_pyramid():
    key = jax.random.PRNGKey(4)
    wrapped = np.asarray(fbm_noise(key, (32, 64), octaves=3, wrap_u=True))
    assert wrapped.shape == (32, 64)
    assert wrapped.max() <= 1.0 + 1e-5
    pyramid = np.asarray(
        fbm_noise(key, (32, 64), octaves=3, base_scale=2, wrap_u=False)
    )
    assert 0.0 <= pyramid.min() and pyramid.max() <= 1.0 + 1e-5
    assert pyramid.std() > 0.01


def test_noise_deterministic_by_key():
    key = jax.random.PRNGKey(7)
    a = np.asarray(tileable_noise(key, (16, 32)))
    b = np.asarray(tileable_noise(key, (16, 32)))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(tileable_noise(jax.random.PRNGKey(8), (16, 32)))
    assert not np.array_equal(a, c)
