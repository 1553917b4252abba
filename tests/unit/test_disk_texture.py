"""Disk texture generator + parametric rotation tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from bhr_tpu.models.disk_texture import (
    build_parametric_state,
    compose_disk_texture,
    compose_from_state,
    generate_disk_texture,
    generate_filaments,
    generate_hotspots,
    generate_turbulence,
    keplerian_omega,
)
import jax


N_R, N_PHI = 64, 256


@pytest.fixture(scope="module")
def state():
    return build_parametric_state(n_phi=N_PHI, n_r=N_R, seed=42,
                                  r_inner=2.0, r_outer=3.5)


def test_texture_shape_range(state):
    tex = np.asarray(compose_from_state(state, 0.0))
    assert tex.shape == (N_R, N_PHI, 4)
    assert tex.min() >= 0.0 and tex.max() <= 1.0
    assert np.isfinite(tex).all()
    # Non-trivial structure in both color and alpha.
    assert tex[..., 3].std() > 0.05
    assert tex[..., 0].std() > 0.05


def test_deterministic_by_seed():
    a = np.asarray(generate_disk_texture(n_phi=128, n_r=32, seed=5))
    b = np.asarray(generate_disk_texture(n_phi=128, n_r=32, seed=5))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(generate_disk_texture(n_phi=128, n_r=32, seed=6))
    assert not np.allclose(a, c)


def test_edge_softening(state):
    """Alpha falls to ~0 at the inner and outer radial edges."""
    tex = np.asarray(compose_from_state(state, 0.0))
    assert tex[0, :, 3].max() < 0.05
    assert tex[-1, :, 3].max() < 0.2
    mid = tex[N_R // 2, :, 3]
    assert mid.mean() > tex[0, :, 3].mean()


def test_parametric_rotation_is_row_roll(state):
    """compose(t) equals compose(0) with each row rolled by the
    Keplerian pixel shift (exact: rotation is an integer-pixel gather)."""
    t = 7.3
    a = np.asarray(compose_from_state(state, 0.0))
    b = np.asarray(compose_from_state(state, t))
    omega = np.asarray(state.omega_rows)
    shift = (t * omega / (2 * np.pi) * N_PHI).astype(np.int32)
    rolled = np.stack(
        [np.roll(a[r], -shift[r], axis=0) for r in range(N_R)], axis=0
    )
    np.testing.assert_allclose(b, rolled, atol=1e-5)


def test_rotation_direction_inner_faster(state):
    """Inner rows rotate by more pixels than outer rows (Keplerian)."""
    omega = np.asarray(state.omega_rows)
    assert omega[0] > omega[-1]
    assert (np.diff(omega) <= 1e-6).all()


def test_keplerian_omega_law():
    r = jnp.asarray([2.0, 3.0, 8.0])
    w = np.asarray(keplerian_omega(r))
    np.testing.assert_allclose(w, np.sqrt(0.5 / (np.asarray(r) ** 3 + 1e-6)),
                               rtol=1e-6)


def test_generation_scale_variants():
    for scale in (1, 2, 4):
        tex = np.asarray(
            generate_disk_texture(n_phi=128, n_r=32, seed=3,
                                  generation_scale=scale)
        )
        assert tex.shape == (32, 128, 4)
        assert np.isfinite(tex).all()
    with pytest.raises(ValueError):
        generate_disk_texture(n_phi=128, n_r=32, generation_scale=3)


def test_rt_toggle(state):
    """enable_rt=False removes the RT density contribution."""
    with_rt = np.asarray(generate_disk_texture(n_phi=128, n_r=32, seed=9,
                                               enable_rt=True))
    without = np.asarray(generate_disk_texture(n_phi=128, n_r=32, seed=9,
                                               enable_rt=False))
    assert not np.allclose(with_rt, without)


def test_color_temp_shifts_palette():
    warm = np.asarray(generate_disk_texture(n_phi=128, n_r=32, seed=4,
                                            color_temp=2700.0))
    cool = np.asarray(generate_disk_texture(n_phi=128, n_r=32, seed=4,
                                            color_temp=6500.0))
    # Warm palette has relatively stronger red vs blue.
    warm_rb = warm[..., 0].mean() / (warm[..., 2].mean() + 1e-6)
    cool_rb = cool[..., 0].mean() / (cool[..., 2].mean() + 1e-6)
    assert warm_rb > cool_rb


def test_turbulence_keplerian_shear():
    key = jax.random.PRNGKey(11)
    turb, shift, temp = generate_turbulence(key, 32, 128, 1)
    shift = np.asarray(shift)
    # Inner rows sheared more than outer rows, clamped at n_phi/4.
    assert shift[0] >= shift[-1]
    assert np.abs(shift).max() <= 128 // 4
    assert np.asarray(temp).max() <= 0.05 + 1e-6


def test_filaments_sparse_and_bounded():
    key = jax.random.PRNGKey(12)
    arcs, temp = generate_filaments(key, 32, 128, 1, max_count=60, max_subs=4)
    arcs = np.asarray(arcs)
    temp = np.asarray(temp)
    assert arcs.max() <= 1.0 and arcs.min() >= 0.0
    assert (temp <= arcs * 0.5 + 1e-5).all()


def test_hotspots_temp_ratio():
    key = jax.random.PRNGKey(13)
    hs, hs_t = generate_hotspots(key, 32, 128)
    np.testing.assert_allclose(np.asarray(hs_t), 0.12 * np.asarray(hs), atol=1e-6)


def test_compose_percentile_normalization():
    """P98 normalization: composed alpha saturates at <= 1 with ~2% at 1."""
    rng = np.random.default_rng(0)
    n_r, n_phi = 32, 128
    density = jnp.asarray(rng.random((n_r, n_phi)).astype(np.float32))
    temp_base = jnp.asarray(rng.random((n_r, n_phi)).astype(np.float32) * 0.2)
    temp_struct = jnp.asarray(rng.random((n_r, n_phi)).astype(np.float32))
    az = jnp.zeros((n_r, n_phi))
    edge = jnp.ones((n_r,))
    tex = np.asarray(
        compose_disk_texture(temp_base, temp_struct, density, az, edge, 6000.0)
    )
    alpha = tex[..., 3]
    assert alpha.max() <= 1.0
    assert (alpha >= 0.999).mean() < 0.05
    assert (alpha >= 0.999).mean() > 0.001


def test_rt_spike_count_scales_with_disk_area():
    """Wide disks draw ~15-30 * disk_area * 0.8 RT fingers (reference
    render.py:1517); the padded slot count must cover that upper bound
    instead of silently capping at 48 (regression: ~10x undercount at
    production radii)."""
    import jax

    from bhr_tpu.models.disk_texture import generate_rt_spikes

    key = jax.random.PRNGKey(7)
    wide_area = (15.0**2 - 2.0**2) / 10.0  # 22.1 -> 265..530 spikes
    spikes, temp = generate_rt_spikes(key, 64, 256, wide_area)
    spikes48, _ = generate_rt_spikes(key, 64, 256, wide_area, max_count=48)
    # ~10x more fingers -> clearly more covered area (same key; different
    # draw shapes, so compare coverage, not pixels; inner-disk overlap
    # saturates coverage well below 10x — a silent cap would give 1.0x).
    assert float(jnp.mean(spikes > 0.05)) > 1.3 * float(jnp.mean(spikes48 > 0.05))
    assert bool(jnp.isfinite(spikes).all()) and bool(jnp.isfinite(temp).all())
    # Narrow default scene stays small: padded bound tracks the area.
    narrow_area = (3.5**2 - 2.0**2) / 10.0
    s_narrow, _ = generate_rt_spikes(key, 64, 256, narrow_area)
    assert float(jnp.mean(s_narrow > 0.05)) < float(jnp.mean(spikes > 0.05))


def test_spiral_arm_toggle():
    """Kill-switch parity (reference tests/unit/test_spiral_arm_toggle):
    disabled (the default, ENABLE_DISK_SPIRAL_ARMS=False) returns exact
    zeros; enabled produces a bounded non-trivial spiral field."""
    from bhr_tpu.constants import ENABLE_DISK_SPIRAL_ARMS
    from bhr_tpu.models.disk_texture import generate_spiral_arms

    assert ENABLE_DISK_SPIRAL_ARMS is False  # reference default
    key = jax.random.PRNGKey(5)
    sp, sp_t = generate_spiral_arms(key, 32, 128)
    assert not np.asarray(sp).any() and not np.asarray(sp_t).any()

    sp_on, sp_t_on = generate_spiral_arms(key, 32, 128, enabled=True)
    sp_on = np.asarray(sp_on)
    assert sp_on.shape == (32, 128)
    assert sp_on.max() > 0.05 and sp_on.min() >= 0.0
    assert np.asarray(sp_t_on).max() <= sp_on.max() + 1e-6
    # deterministic by key
    again, _ = generate_spiral_arms(key, 32, 128, enabled=True)
    np.testing.assert_array_equal(sp_on, np.asarray(again))
