"""Entity lifecycle tests: fade math, death, steady state, accumulation."""


import jax.numpy as jnp
import numpy as np
import pytest

from bhr_tpu.constants import (
    FILAMENT_DEATH_THRESHOLD,
    FILAMENT_MAX_LIFETIME,
)
from bhr_tpu.models.dynamic_disk import DynamicDiskSystem
from bhr_tpu.models.lifecycle import (
    MAX_FILAMENTS,
    MAX_HOTSPOTS,
    MAX_RT_SPIKES,
    Entity,
    accumulate_entity_layer,
    make_factories,
    pack_filaments,
    pack_timer_entities,
)


def _filament(birth=0.0, **kw):
    defaults = dict(
        entity_type="filament", birth_time=birth, lifetime=30.0,
        fade_in=0.0, fade_out=0.0, omega=0.3, phi_center=1.0,
        base_r=0.5, sigma_r=0.01, sigma_phi0=0.06,
        peak_density=0.8, peak_temp=0.2, alpha_shear=0.03,
    )
    defaults.update(kw)
    return Entity(**defaults)


def _hotspot(birth=0.0, **kw):
    defaults = dict(
        entity_type="hotspot", birth_time=birth, lifetime=20.0,
        fade_in=4.0, fade_out=4.0, omega=0.3, phi_center=2.0,
        phi_width=0.1, r_center=0.5, r_width=0.03, intensity=0.7,
        delta_t=0.12,
    )
    defaults.update(kw)
    return Entity(**defaults)


def test_filament_density_factor_monotonic():
    e = _filament()
    vals = [e.density_factor(t) for t in np.linspace(0, 60, 30)]
    assert vals[0] == 1.0
    assert all(b <= a + 1e-9 for a, b in zip(vals, vals[1:]))


def test_filament_death_by_threshold_or_age():
    e = _filament(alpha_shear=2.0, tau_cool=5.0)  # fast decay
    # find first death time
    t = 0.0
    while not e.is_dead(t) and t < 200:
        t += 0.5
    assert t < FILAMENT_MAX_LIFETIME
    assert e.density_factor(t) < FILAMENT_DEATH_THRESHOLD
    e2 = _filament(alpha_shear=0.0, tau_cool=1e9)  # never decays
    assert not e2.is_dead(FILAMENT_MAX_LIFETIME - 1)
    assert e2.is_dead(FILAMENT_MAX_LIFETIME + 0.1)


def test_timer_fade_envelope():
    e = _hotspot()
    assert e.fade_factor(-1.0) == 0.0
    assert abs(e.fade_factor(2.0) - 0.5) < 1e-9  # mid fade-in
    assert e.fade_factor(10.0) == 1.0  # alive
    assert abs(e.fade_factor(26.0) - 0.5) < 1e-9  # mid fade-out
    assert e.fade_factor(30.0) == 0.0  # done


def test_factory_steady_state_counts():
    factories = make_factories(32, 2.0, 3.5, seed=42)
    for f in factories.values():
        f.seed_initial(0.0)
    total0 = sum(len(f.entities) for f in factories.values())
    assert total0 == 200 + 30 + 15
    # run for a while; counts should stay near targets
    for i in range(1, 200):
        t = i * 0.5
        for f in factories.values():
            f.tick(t, 0.5)
    fil = len(factories["filament"].entities)
    hs = len(factories["hotspot"].entities)
    rt = len(factories["rt_spike"].entities)
    assert 150 <= fil <= 220, fil
    assert 20 <= hs <= 35, hs
    assert 8 <= rt <= 20, rt
    # capacities never exceeded (device packing safety)
    assert fil <= MAX_FILAMENTS and hs <= MAX_HOTSPOTS and rt <= MAX_RT_SPIKES


def test_accumulate_entity_layer_shapes_and_content():
    factories = make_factories(32, 2.0, 3.5, seed=1)
    for f in factories.values():
        f.seed_initial(0.0)
    now = 1.0
    for f in factories.values():
        f.tick(now, 1.0)
    fil = jnp.asarray(pack_filaments(factories["filament"], now))
    hs = jnp.asarray(pack_timer_entities(factories["hotspot"], now, MAX_HOTSPOTS))
    rt = jnp.asarray(pack_timer_entities(factories["rt_spike"], now, MAX_RT_SPIKES))
    omega = jnp.asarray(factories["filament"].omega_rows)
    staging = np.asarray(accumulate_entity_layer(fil, hs, rt, omega, 32, 128))
    assert staging.shape == (6, 32, 128)
    assert np.isfinite(staging).all()
    assert (staging >= 0).all()
    # every plane has some content at steady state
    for plane in range(6):
        assert staging[plane].max() > 0, plane
    # sparsity: filament plane should not be dense
    assert (staging[0] > 0.05).mean() < 0.7


def test_filament_shear_spreads_with_age():
    """An old filament has a wider azimuthal footprint than a young one."""
    e_young = _filament(birth=0.0)
    e_old = _filament(birth=-40.0)
    omega = jnp.full((32,), 0.3)

    def footprint(e):
        fac = type("F", (), {"alive_entities": [e]})()
        p = jnp.asarray(pack_filaments(fac, 0.0))
        st = np.asarray(
            accumulate_entity_layer(
                p, jnp.zeros((1, 8)), jnp.zeros((1, 8)), omega, 32, 128
            )
        )
        d = st[0]
        row = d[np.argmax(d.max(axis=1))]
        peak = row.max()
        return (row > peak * 0.3).sum()

    assert footprint(e_old) > footprint(e_young)


@pytest.mark.slow
def test_dynamic_disk_visual_sanity():
    """Full system: no NaN, temporal change, steady-state texture stats
    (the reference's visual-sanity budget tests,
    tests/unit/test_lifecycle_perf.py:137-217)."""
    dyn = DynamicDiskSystem(48, 192, 2.0, 3.5, seed=42)
    tex0 = np.asarray(dyn.advance(0.0, 0.0, recompute_stats=True))
    tex1 = np.asarray(dyn.advance(0.5, 0.5))
    assert np.isfinite(tex0).all() and np.isfinite(tex1).all()
    assert tex0[..., 3].std() > 0.02
    assert np.abs(tex1 - tex0).mean() > 1e-4
    assert tex0.max() <= 1.0 and tex0.min() >= 0.0


def test_entity_layer_phi_scale_close_to_full_res():
    """phi_scale=2 linear upsample stays close to full-res evaluation."""
    import jax.numpy as jnp

    from bhr_tpu.models.lifecycle import (
        MAX_HOTSPOTS,
        MAX_RT_SPIKES,
        accumulate_entity_layer,
        pack_filaments,
        pack_timer_entities,
    )
    from bhr_tpu.models.dynamic_disk import DynamicDiskSystem

    n_r, n_phi = 64, 256
    dyn = DynamicDiskSystem(n_r, n_phi, 2.0, 3.5, seed=7)
    fil = jnp.asarray(pack_filaments(dyn.factories["filament"], 1.0))
    hs = jnp.asarray(
        pack_timer_entities(dyn.factories["hotspot"], 1.0, MAX_HOTSPOTS)
    )
    rt = jnp.asarray(
        pack_timer_entities(dyn.factories["rt_spike"], 1.0, MAX_RT_SPIKES)
    )
    omega = dyn.omega_rows

    full = np.asarray(
        accumulate_entity_layer(fil, hs, rt, omega, n_r, n_phi, phi_scale=1)
    )
    half = np.asarray(
        accumulate_entity_layer(fil, hs, rt, omega, n_r, n_phi, phi_scale=2)
    )
    assert half.shape == full.shape
    scale = max(float(np.abs(full).max()), 1e-6)
    rel_err = np.abs(half - full).max() / scale
    assert rel_err < 0.05, rel_err
    # Upsample must preserve total mass closely.
    assert np.allclose(half.sum(), full.sum(), rtol=0.01)


def test_recompute_stats_rt_gating_matches_compose():
    """With enable_rt=False the stats density must drop the RT term
    exactly like the compose path (reference recompute_interactive_stats:
    `rt_w = 0.20 if self._param_enable_rt else 0.0`, render.py:3676)."""
    import jax.numpy as jnp

    from bhr_tpu.models.dynamic_disk import _recompute_stats

    comp = np.zeros((13, 16, 32), np.float32)
    comp[7] = 1.0   # hot RT density plane
    comp[12] = 1.0  # neutral disturbance modulation
    edge = np.ones(16, np.float32)

    p98_on, _, _ = _recompute_stats(jnp.asarray(comp), jnp.asarray(edge), True)
    p98_off, _, _ = _recompute_stats(
        jnp.asarray(comp), jnp.asarray(edge), False
    )
    # on: density = 0.15 + 0.20*rt = 0.35; off: the 0.15 base only.
    assert abs(float(p98_on) - 0.35) < 0.02, float(p98_on)
    assert abs(float(p98_off) - 0.15) < 0.02, float(p98_off)


def test_solo_persists_full_field_stats():
    """A stats recompute that lands while a component is soloed must
    persist stats from the FULL comp field (regression: the solo branch
    used to drop the recompute, leaving stale normalization after
    un-soloing). Deliberate deviation from the reference, whose solo
    branch persists the solo-derived stats for up to 59 frames
    (render.py:3745-3749) — see PARITY.md deviation 13."""
    a = DynamicDiskSystem(32, 64, 2.0, 3.5, seed=3)
    b = DynamicDiskSystem(32, 64, 2.0, 3.5, seed=3)
    init_p98 = float(a.density_p98)
    a.advance(0.5, 0.5, recompute_stats=True)
    b.advance(0.5, 0.5, recompute_stats=True, solo_idx=3)
    assert float(a.density_p98) != init_p98
    np.testing.assert_allclose(
        np.asarray(a.density_p98), np.asarray(b.density_p98), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.struct_scale), np.asarray(b.struct_scale), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.row_stats), np.asarray(b.row_stats), rtol=1e-6
    )


@pytest.mark.slow
def test_enable_rt_false_zeroes_rt_planes():
    """RT disabled must mean what it means in the parametric path:
    zero RT planes (no spawning at all), not just a zeroed density
    weight — otherwise RT temperature structures still render through
    temp_struct_from_comp."""
    dyn = DynamicDiskSystem(32, 64, 2.0, 3.5, seed=7, enable_rt=False)
    assert len(dyn.factories["rt_spike"].entities) == 0
    dyn.advance(1.0, 1.0, recompute_stats=True)
    dyn.advance(2.0, 1.0)
    assert len(dyn.factories["rt_spike"].entities) == 0
    comp = np.asarray(dyn.comp)
    assert np.all(comp[7] == 0.0) and np.all(comp[8] == 0.0)
    # Other entity planes still alive.
    assert np.any(comp[5] > 0.0) or np.any(comp[9] > 0.0)


def test_entity_layer_rejects_indivisible_phi_scale():
    fil = jnp.zeros((4, 8), jnp.float32)
    hs = jnp.zeros((4, 8), jnp.float32)
    rt = jnp.zeros((4, 8), jnp.float32)
    omega = jnp.ones((16,), jnp.float32)
    with pytest.raises(ValueError, match="phi_scale"):
        accumulate_entity_layer(fil, hs, rt, omega, 16, 63, phi_scale=2)


def test_solo_comp_masked_select():
    """Fused solo mask: kept pair intact, others zero, disturb_mod 1."""
    dyn = DynamicDiskSystem(32, 64, 2.0, 3.5, seed=5)
    dyn.advance(0.5, 0.5, recompute_stats=True)
    comp = dyn.comp
    solo = np.asarray(dyn._solo_comp(comp, 3))
    full = np.asarray(comp)
    np.testing.assert_array_equal(solo[3], full[3])
    np.testing.assert_array_equal(solo[4], full[4])  # paired temp slice
    assert np.all(solo[12] == 1.0)                   # neutral disturb
    for i in (0, 1, 2, 5, 6, 7, 8, 9, 10, 11):
        assert np.all(solo[i] == 0.0), i

