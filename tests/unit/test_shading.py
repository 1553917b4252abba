"""Blackbody + relativistic g-factor shading tests."""

import jax.numpy as jnp
import numpy as np

from bhr_tpu.ops.shading import apply_g_factor, blackbody_rgb


def _blackbody_oracle(T):
    t = T / 100.0
    r = np.where(
        t <= 66, 1.0,
        np.clip(1.292936 * np.power(np.maximum(t - 60, 1e-6), -0.1332047592), 0, 1),
    )
    g = np.where(
        t <= 66,
        np.clip(0.390082 * np.log(np.maximum(t, 1e-6)) - 0.631841, 0, 1),
        np.clip(1.129891 * np.power(np.maximum(t - 60, 1e-6), -0.0755148492), 0, 1),
    )
    b = np.where(
        t >= 66, 1.0,
        np.where(
            t <= 19, 0.0,
            np.clip(0.543207 * np.log(np.maximum(t - 10, 1e-6)) - 1.19625, 0, 1),
        ),
    )
    return np.stack([r, g, b], axis=-1)


def test_blackbody_matches_oracle():
    temps = np.linspace(1000.0, 40000.0, 257).astype(np.float32)
    got = np.asarray(blackbody_rgb(jnp.asarray(temps)))
    want = _blackbody_oracle(temps)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_blackbody_qualitative():
    cold = np.asarray(blackbody_rgb(jnp.asarray(2000.0)))
    hot = np.asarray(blackbody_rgb(jnp.asarray(20000.0)))
    assert cold[0] > cold[2]  # cold = red-dominant
    assert hot[2] > 0.9  # hot = blue saturated
    assert cold[2] < 0.3


def test_doppler_beaming_asymmetry():
    """Approaching side of the disk must be brighter than the receding side.

    Camera at +x; disk flow v = r_hat x n_hat (clockwise seen from +z for
    n = +z). At hit (0, +r, 0) the flow v = (1, 0, 0) moves toward the
    camera (approaching); at (0, -r, 0) it moves away.
    """
    cam = jnp.asarray([50.0, 0.0, 0.0], jnp.float32)
    r = 3.0
    base = jnp.ones((2, 3), jnp.float32)
    hit_pos = jnp.asarray([[0.0, r, 0.0], [0.0, -r, 0.0]], jnp.float32)
    hit_r = jnp.asarray([r, r], jnp.float32)
    to_cam = cam[None, :] - hit_pos
    out = np.asarray(
        apply_g_factor(base, hit_pos, hit_r, to_cam, cam, 2.0, 15.0, 0.0)
    )
    lum = out.sum(axis=-1)
    assert lum[0] > lum[1] * 1.2, lum


def test_g_factor_finite_and_bounded():
    rng = np.random.default_rng(0)
    n = 128
    hit_xy = rng.uniform(-10, 10, (n, 2))
    hit_pos = np.concatenate([hit_xy, np.zeros((n, 1))], axis=-1).astype(np.float32)
    hit_r = np.linalg.norm(hit_xy, axis=-1).astype(np.float32)
    base = rng.random((n, 3)).astype(np.float32)
    cam = jnp.asarray([6.0, 0.0, 0.5], jnp.float32)
    to_cam = np.asarray(cam)[None] - hit_pos
    out = np.asarray(
        apply_g_factor(
            jnp.asarray(base), jnp.asarray(hit_pos), jnp.asarray(hit_r),
            jnp.asarray(to_cam), cam, 2.0, 15.0, np.radians(15.0),
        )
    )
    assert np.isfinite(out).all()
    assert (out >= 0).all() and (out <= 10.0).all()


def test_wien_shift_receding_side_redder():
    """Receding side (g < 1) is redshifted: higher R/B ratio than the
    approaching side (g > 1), which is blueshifted."""
    cam = jnp.asarray([50.0, 0.0, 0.0], jnp.float32)
    r = 3.0
    base = jnp.ones((2, 3), jnp.float32)
    # (0, +r): approaching; (0, -r): receding (see beaming test).
    hit_pos = jnp.asarray([[0.0, r, 0.0], [0.0, -r, 0.0]], jnp.float32)
    hit_r = jnp.asarray([r, r], jnp.float32)
    to_cam = np.asarray(cam)[None] - np.asarray(hit_pos)
    out = np.asarray(
        apply_g_factor(
            base, hit_pos, hit_r, jnp.asarray(to_cam), cam, 2.0, 15.0, 0.0,
        )
    )
    approach_rb = out[0, 0] / max(out[0, 2], 1e-6)
    recede_rb = out[1, 0] / max(out[1, 2], 1e-6)
    assert recede_rb > approach_rb * 1.05, (recede_rb, approach_rb)


def test_pow_const_matches_power():
    """Strength-reduced integer/half-integer exponents match jnp.power
    (regression: g-factor luminosity must stay correct if
    G_LUMINOSITY_POWER is retuned)."""
    from bhr_tpu.ops.shading import pow_const

    x = jnp.asarray(np.linspace(0.0, 4.0, 33), jnp.float32)
    for p in (0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 7.0, 16.0, 1.2):
        np.testing.assert_allclose(
            np.asarray(pow_const(x, p)),
            np.asarray(x, dtype=np.float64) ** p,
            rtol=3e-6, atol=1e-6, err_msg=f"p={p}",
        )
