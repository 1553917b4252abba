"""Disk V2 tests: boundary conventions, monotonicity, determinism,
modulation safety, and the emission integrator.

Mirrors the reference suite's invariants
(tests/unit/test_disk_v2_physical_fields.py,
test_disk_v2_structure_modulations.py) plus coverage for the
planned-but-unbuilt pieces we implemented (integrator, palette).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bhr_tpu.models.disk_v2 import (
    DiskV2Params,
    DiskV2StructureParams,
    angular_velocity_field,
    apply_palette,
    density_field,
    disk_half_thickness,
    disk_radial_mask,
    disk_radial_weight,
    disk_vertical_weight,
    disk_volume_mask,
    hotspot_modulation,
    integrate_emission,
    midplane_density_field,
    midplane_temperature_field,
    shear_modulation,
    smoothstep,
    structure_modulation,
    temperature_field,
    weak_mode_modulation,
)

P = DiskV2Params()


# -- params validation -------------------------------------------------------

@pytest.mark.parametrize(
    "kwargs",
    [
        dict(r_in=-1.0),
        dict(r_in=5.0, r_out=3.0),
        dict(h0=0.0),
        dict(rho_power=0.0),
        dict(edge_softness=0.6),
    ],
)
def test_params_validation(kwargs):
    with pytest.raises(ValueError):
        DiskV2Params(**kwargs)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(mode1_strength=0.6, mode2_strength=0.5),
        dict(shear_strength=1.0),
        dict(hotspot_strength=1.0),
        dict(hotspot_count=0),
    ],
)
def test_structure_params_validation(kwargs):
    with pytest.raises(ValueError):
        DiskV2StructureParams(**kwargs)


# -- geometry ----------------------------------------------------------------

def test_smoothstep_endpoints_and_monotone():
    x = jnp.linspace(-1.0, 2.0, 100)
    y = np.asarray(smoothstep(0.0, 1.0, x))
    assert y[0] == 0.0 and y[-1] == 1.0
    assert (np.diff(y) >= -1e-7).all()
    with pytest.raises(ValueError):
        smoothstep(1.0, 1.0, x)


def test_mask_closed_interval_weight_closes_to_zero():
    """The documented mask/weight duality: boundaries are inside the hard
    mask but the smooth weight is exactly 0 there."""
    for r in (P.r_in, P.r_out):
        assert bool(disk_radial_mask(r, P))
        assert float(disk_radial_weight(r, P)) == 0.0
    mid = 0.5 * (P.r_in + P.r_out)
    assert float(disk_radial_weight(mid, P)) == 1.0
    assert not bool(disk_radial_mask(P.r_in - 1e-6, P))
    assert not bool(disk_radial_mask(P.r_out + 1e-6, P))


def test_half_thickness_growth():
    r = jnp.asarray([P.r_in, 5.0, P.r_out])
    h = np.asarray(disk_half_thickness(r, P))
    assert (np.diff(h) > 0).all()
    assert np.isclose(h[0], P.h0 * P.r_in)


def test_vertical_weight_surface_zero():
    r = 5.0
    h = float(disk_half_thickness(r, P))
    assert float(disk_vertical_weight(r, 0.0, P)) == 1.0
    assert float(disk_vertical_weight(r, h, P)) == 0.0
    assert float(disk_vertical_weight(r, -h, P)) == 0.0
    # volume mask: surface is inside (closed interval)
    assert bool(disk_volume_mask(r, h, P))
    assert not bool(disk_volume_mask(r, h + 1e-6, P))


# -- physical fields ---------------------------------------------------------

def test_omega_keplerian_scaling():
    assert np.isclose(float(angular_velocity_field(P.r_in, P)), P.omega_scale)
    w4 = float(angular_velocity_field(4.0 * P.r_in, P))
    assert np.isclose(w4, P.omega_scale * 4.0 ** (-1.5), rtol=1e-6)


def test_midplane_density_monotone_decreasing_in_bulk():
    r = jnp.linspace(P.r_in + 1.0, P.r_out - 1.5, 64)
    rho = np.asarray(midplane_density_field(r, P))
    assert (np.diff(rho) < 1e-7).all()
    assert float(midplane_density_field(P.r_out + 1.0, P)) == 0.0


def test_midplane_temperature_peaks_off_inner_edge():
    r = jnp.linspace(P.r_in, P.r_out, 256)
    t = np.asarray(midplane_temperature_field(r, P))
    assert t[0] == 0.0  # zero at r_in (closed-off inner edge)
    peak = r[int(np.argmax(t))]
    assert P.r_in < peak < 0.5 * (P.r_in + P.r_out)


def test_density_field_vertical_gaussian():
    r = 5.0
    h = float(disk_half_thickness(r, P))
    mid = float(density_field(r, 0.0, P))
    above = float(density_field(r, 0.5 * h, P))
    outside = float(density_field(r, 1.5 * h, P))
    assert mid > above > 0.0
    assert outside == 0.0


def test_temperature_field_cooler_off_midplane():
    r = 5.0
    h = float(disk_half_thickness(r, P))
    assert float(temperature_field(r, 0.0, P)) > float(
        temperature_field(r, 0.6 * h, P)
    )


def test_fields_scalar_and_array_inputs():
    assert np.ndim(np.asarray(density_field(5.0, 0.0, P))) == 0
    arr = density_field(jnp.linspace(2.5, 9.0, 8), jnp.zeros(8), P)
    assert arr.shape == (8,)


# -- structure modulations ---------------------------------------------------

def test_modulations_neutral_outside_disk():
    r_out = P.r_out + 1.0
    for fn in (weak_mode_modulation,):
        assert float(fn(r_out, 1.0, P)) == 1.0
    assert float(shear_modulation(r_out, 1.0, P)) == 1.0
    assert float(hotspot_modulation(r_out, 1.0, P)) == 1.0
    assert float(structure_modulation(r_out, 1.0, P)) == 1.0


def test_modulations_positive_and_near_one():
    r = jnp.linspace(P.r_in + 0.5, P.r_out - 0.5, 32)
    phi = jnp.linspace(0.0, 2 * jnp.pi, 33)[None, :]
    f = np.asarray(structure_modulation(r[:, None], phi, P))
    assert (f > 0).all()
    assert 0.3 < f.mean() < 1.7


def test_shear_deterministic_by_seed():
    r = jnp.linspace(3.0, 8.0, 16)[:, None]
    phi = jnp.linspace(0.0, 2 * jnp.pi, 17)[None, :]
    a = np.asarray(shear_modulation(r, phi, P, seed=1))
    b = np.asarray(shear_modulation(r, phi, P, seed=1))
    c = np.asarray(shear_modulation(r, phi, P, seed=2))
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_modulation_phi_wrap_continuity():
    r = jnp.full((8,), 5.0)
    eps = 1e-4
    a = np.asarray(structure_modulation(r, jnp.full((8,), eps), P))
    b = np.asarray(structure_modulation(r, jnp.full((8,), 2 * np.pi - eps), P))
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_advection_rotates_pattern():
    """phi_adv = phi - Omega t: the pattern at (r, phi, t) equals the
    static pattern at (r, phi - Omega t)."""
    r = 4.0
    phi = 1.0
    t = 3.0
    omega = float(angular_velocity_field(r, P))
    moved = float(shear_modulation(r, phi, P, seed=3, t=t))
    static = float(shear_modulation(r, phi - omega * t, P, seed=3, t=0.0))
    assert abs(moved - static) < 1e-5


# -- integrator + palette ----------------------------------------------------

def test_integrator_basic_properties():
    n = 16
    rng = np.random.default_rng(0)
    radii = rng.uniform(P.r_in + 1.0, P.r_out - 1.0, n)
    phis = rng.uniform(0, 2 * np.pi, n)
    hit = np.stack(
        [radii * np.cos(phis), radii * np.sin(phis), np.zeros(n)], axis=-1
    ).astype(np.float32)
    dirs = np.tile(np.array([0.0, 0.0, -1.0], np.float32), (n, 1))
    inten, temp, alpha = integrate_emission(
        jnp.asarray(hit), jnp.asarray(dirs), P
    )
    inten, temp, alpha = map(np.asarray, (inten, temp, alpha))
    assert (inten >= 0).all() and np.isfinite(inten).all()
    assert (alpha >= 0).all() and (alpha <= 1).all()
    assert (temp >= 0).all()
    # hits inside the disk produce some emission
    assert inten.max() > 0


def test_integrator_grazing_rays_more_opaque():
    """Shallow incidence crosses more material -> higher alpha."""
    hit = jnp.asarray([[5.0, 0.0, 0.0]], jnp.float32)
    steep = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    shallow_dir = np.array([[0.95, 0.0, -0.31225]], np.float32)
    _, _, a_steep = integrate_emission(hit, steep, P)
    _, _, a_shallow = integrate_emission(hit, jnp.asarray(shallow_dir), P)
    assert float(a_shallow[0]) > float(a_steep[0])


def test_integrator_outside_disk_dark():
    hit = jnp.asarray([[P.r_out + 2.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    inten, _, alpha = integrate_emission(hit, d, P)
    assert float(inten[0]) == 0.0
    assert float(alpha[0]) == 0.0


def test_palette_modes():
    inten = jnp.asarray([0.0, 0.5, 5.0])
    temp = jnp.asarray([0.1, 0.5, 0.9])
    sci = np.asarray(apply_palette(inten, temp, "scientific"))
    cin = np.asarray(apply_palette(inten, temp, "cinematic"))
    for out in (sci, cin):
        assert out.shape == (3, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert (out[0] == 0).all()  # zero intensity -> black
    # cinematic clamps blue below red
    assert (cin[:, 2] <= cin[:, 0] + 1e-6).all()
    with pytest.raises(ValueError):
        apply_palette(inten, temp, "bogus")


def test_modulation_batch_independent():
    """A point's modulation must not depend on its batch companions.

    The reference normalizes by batch max (safe on dense grids); the
    renderer evaluates sparse per-ray sets, so normalization here is a
    fixed lattice constant — subset evaluation must equal full-batch
    evaluation exactly, and scalar queries must be meaningful (not
    saturated to 1 +/- strength).
    """
    rng = np.random.default_rng(7)
    r = jnp.asarray(rng.uniform(P.r_in + 0.2, P.r_out - 0.2, 64))
    phi = jnp.asarray(rng.uniform(0, 2 * np.pi, 64))
    full = np.asarray(structure_modulation(r, phi, P))
    sub = np.asarray(structure_modulation(r[:5], phi[:5], P))
    np.testing.assert_array_equal(sub, full[:5])
    one = float(structure_modulation(r[0], phi[0], P))
    np.testing.assert_allclose(one, full[0], rtol=1e-6)


@pytest.mark.slow
def test_pipeline_v2_seed_reaches_structure():
    """Regression: the renderer must thread config.seed into the V2
    volume shading — two Renderer configs differing ONLY in seed must
    produce different disk structure (the original bug: CLI --seed had
    no effect on the V2 disk)."""
    import dataclasses

    from bhr_tpu.config import SceneConfig
    from bhr_tpu.models.skybox import generate_skybox
    from bhr_tpu.pipeline import Renderer

    cfg = SceneConfig(
        width=64, height=36, fov=60.0, step_size=0.3, n_stars=50,
        disk_inner_radius=2.0, disk_outer_radius=3.5, disk_tilt=15.0,
        disk_model="v2",
    ).validated()
    sky = generate_skybox(256, 128, seed=42, n_stars=50)

    imgs = []
    for seed in (1, 2):
        r = Renderer(dataclasses.replace(cfg, seed=seed), sky, None)
        imgs.append(r.render(cfg.pov, cfg.fov))
    assert not np.allclose(imgs[0], imgs[1]), (
        "config.seed does not reach the V2 structure modulation"
    )


def test_hotspot_narrow_sigma_not_saturated():
    """Sub-lattice hotspot sigmas still normalize by the true peak:
    the modulation falls off smoothly from a spot center instead of
    clipping to a hard-edged plateau at 1 + strength (regression:
    the fixed 512x128 lattice missed narrow Gaussian cores, so
    raw/max overshot and saturated the clip)."""
    sp = DiskV2StructureParams(
        hotspot_phi_sigma=0.004, hotspot_logr_sigma=0.003
    )
    params = DiskV2Params()
    seed = 11
    # Replicate the spot-center draw (documented rng contract).
    rng = np.random.default_rng(seed)
    log_span = float(np.log(params.r_out / params.r_in))
    center_phi = float(rng.uniform(0.0, 2.0 * np.pi))
    center_logr = float(
        (rng.uniform(0.0, 1.0) ** sp.hotspot_inner_bias) * log_span
    )
    r0 = params.r_in * float(np.exp(center_logr))

    offs = np.array([0.0, 0.25, 0.5, 1.0]) * sp.hotspot_phi_sigma
    vals = np.asarray(
        hotspot_modulation(
            jnp.full(offs.shape, r0), jnp.asarray(center_phi + offs),
            params, sp, seed=seed,
        )
    )
    # Peak bounded by the normalization, smooth monotone falloff.
    assert vals[0] <= 1.0 + sp.hotspot_strength + 1e-6
    assert np.all(np.diff(vals) < 0), vals
    assert vals[0] - vals[1] > 5e-3 * sp.hotspot_strength, vals


def test_preview_top_view_and_cross_section():
    """Preview diagnostics (design_ad_v2.md:454-470): finite, correctly
    shaped, non-black inside the disk, dark outside it."""
    from bhr_tpu.models.disk_v2 import render_cross_section, render_top_view

    params = DiskV2Params(r_in=2.0, r_out=6.0)
    top = np.asarray(render_top_view(params, size=96, seed=3))
    assert top.shape == (96, 96, 3)
    assert np.isfinite(top).all()
    assert top.max() > 0.05  # emission visible
    # Center (inside r_in) is dark; the disk annulus is not.
    c = 48
    assert top[c, c].max() < 1e-3
    ring = top[c, int(c + 4.0 / (6.0 * 1.05) * c)]  # r ~ 4.0 sample
    assert ring.max() > 0.01

    for field in ("density", "temperature"):
        cs = np.asarray(render_cross_section(
            params, size_r=64, size_z=16, field=field))
        assert cs.shape == (16, 64)
        assert np.isfinite(cs).all()
        assert 0.99 <= cs.max() <= 1.01  # normalized
        # Midplane row is the brightest region (vertical falloff).
        assert cs[8].mean() >= cs[0].mean()

    with pytest.raises(ValueError):
        render_cross_section(params, size_r=8, size_z=4, field="nope")
