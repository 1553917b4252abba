"""Dynamic disk: background noise + entity lifecycle -> per-frame texture.

Orchestrates the two-layer dynamic texture system of the reference
(`_init_lifecycle_system` / `_advance_lifecycle_frame`,
/root/reference/render.py:4079-4153): a time-evolving noise background
(comp slices 0-4, 11, 12) plus the entity lifecycle layer (slices 5-10),
composed through the 13-component contract with periodically-recomputed
normalization stats.

The whole per-frame device path (background noise + entity evaluation +
compose) is one jitted program; only factory bookkeeping and parameter
packing stay on host.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import DISK_COLOR_TEMPERATURE
from ..ops.background import generate_background_components
from ..utils.io import compute_edge_alpha
from .disk_texture import compose_from_components
from .disk_texture import density_from_comp, temp_struct_from_comp
from ..ops.stats import approx_quantile, approx_quantile_rows
from .lifecycle import (
    MAX_HOTSPOTS,
    MAX_RT_SPIKES,
    accumulate_entity_layer,
    make_factories,
    pack_filaments,
    pack_timer_entities,
    radial_omega_rows,
)


def assemble_comp(bg: jnp.ndarray, staging: jnp.ndarray) -> jnp.ndarray:
    """Assemble the 13-component field from background + entity planes:
    [tb, sp, sp_t, turb, turb_t, fil_d, fil_t, rt_d, rt_t, hs_d, hs_t,
    az, dm] — background slices 0-4 and 5-6 bracket the 6 entity
    staging planes (comp slices 5-10). Single source of the layout;
    shared by every engine (sequential, sharded video, profiler)."""
    return jnp.concatenate([bg[0:5], staging, bg[5:7]], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("n_r", "n_phi", "enable_rt", "generation_scale",
                     "compose"),
)
def _dynamic_step(
    fil_params, hs_params, rt_params, omega_rows, edge,
    density_p98, struct_scale, row_stats,
    az_freq, az_shear, r_inner, r_outer, t,
    n_r: int, n_phi: int, enable_rt: bool, color_temp,
    generation_scale: int = 2, compose: bool = True,
):
    """Full device step: comp field (+ composed RGBA texture) at time t.

    ``compose=False`` skips the texture compose — callers that recompute
    stats (or solo a component) compose afterwards with the fresh stats,
    and composing the full field twice per stats frame measurably costs.
    """
    bg = generate_background_components(
        n_r, n_phi, az_freq, az_shear, r_inner, r_outer, t,
        generation_scale=generation_scale,
    )
    staging = accumulate_entity_layer(
        fil_params, hs_params, rt_params, omega_rows, n_r, n_phi,
        phi_scale=generation_scale,
    )
    comp = assemble_comp(bg, staging)
    if not compose:
        return comp, None
    # Python-scalar 0.0: statically elides the per-row roll gather
    # (rotation lives in the background coords + entity phases).
    tex = compose_from_components(
        comp, omega_rows, edge, density_p98, struct_scale, row_stats,
        0.0, enable_rt, color_temp,
    )
    return comp, tex


@functools.partial(jax.jit, static_argnames=("enable_rt",))
def _recompute_stats(comp, edge, enable_rt: bool = True):
    """Normalization stats from the live comp field, with temp-base
    floors so sparse entity rows don't over-clamp the background
    (reference recompute_interactive_stats, render.py:3655-3712).

    The RT density weight is gated on ``enable_rt`` exactly like the
    compose path (reference: `rt_w = 0.20 if self._param_enable_rt
    else 0.0`), so stats and compose always normalize the same density.

    Quantiles are histogram-approximate (ops/stats.py): exact
    jnp.percentile would sort ~1.2M texels per frame, which dominated
    the dynamic-texture step on TPU.
    """
    density = density_from_comp(comp, edge, enable_rt)
    density_p98 = jnp.maximum(approx_quantile(density, 0.98), 0.01)

    temp_struct = temp_struct_from_comp(comp)
    pos = temp_struct > 0
    struct_scale = jnp.where(
        jnp.any(pos),
        approx_quantile(temp_struct, 0.95, mask=pos),
        1.0,
    )
    struct_scale = jnp.maximum(struct_scale, 0.01)

    ts_scaled = jnp.clip(temp_struct / (struct_scale + 1e-6) * 0.8, 0.0, 1.2)
    struct_max = jnp.max(ts_scaled, axis=1)
    struct_p70 = approx_quantile_rows(ts_scaled, 0.7, lo=0.0, hi=1.2)

    tb_max = jnp.max(comp[0], axis=1)
    struct_max = jnp.maximum(struct_max, tb_max)
    struct_p70 = jnp.maximum(struct_p70, tb_max * 0.8)
    return density_p98, struct_scale, jnp.stack([struct_max, struct_p70], axis=1)


# Solo-component debug pairs (density slice <-> its temperature slice),
# reference compose_interactive_texture (render.py:3728-3753).
_SOLO_PAIRS = {
    0: [], 1: [2], 2: [1], 3: [4], 4: [3], 5: [6], 6: [5],
    7: [8], 8: [7], 9: [10], 10: [9], 11: [], 12: [],
}


def solo_comp(comp: jnp.ndarray, solo_idx: int) -> jnp.ndarray:
    """Zero all components except the soloed density/temp pair;
    disturb_mod becomes the neutral multiplier 1. One fused masked
    select (this runs every frame while a solo view is held). Module-
    level so the fused one-dispatch engine (parallel/video.py) and the
    staged DynamicDiskSystem path share the identical mask logic."""
    keep = {solo_idx} | set(_SOLO_PAIRS.get(solo_idx, []))
    mask = jnp.asarray(
        [i in keep for i in range(13)], bool
    )[:, None, None]
    # Non-kept slices drop to 0, except disturb_mod (slice 12)
    # whose neutral value is 1.
    fill = jnp.zeros((13,), comp.dtype).at[12].set(1.0)[:, None, None]
    return jnp.where(mask, comp, fill)


def adaptive_generation_scale(n_r: int, n_phi: int) -> int:
    """Low-res generation factor by texture size: 4 for 4K-class
    textures (n_phi >= 4096), else 2 — both from the reference's
    validated choice set {1, 2, 4} (render.py:78-87). At n_phi >= 4096
    the scale-4 grid still samples entity/noise features at >= 9 cells
    per sigma (entity sigma_phi >= 0.04 rad -> 0.04/2pi * 4096/4 = 26
    cells), and halving the generation grid again saves ~11 ms/frame at
    4K. Falls back to 1 when the size is not divisible. ONE policy for
    every engine."""
    scale = 4 if n_phi >= 4096 else 2
    while scale > 1 and (n_r % scale or n_phi % scale):
        scale //= 2
    return scale


class DynamicDiskSystem:
    """Per-frame dynamic texture generator (lifecycle + background).

    Usage:
        dyn = DynamicDiskSystem(n_r, n_phi, r_inner, r_outer, seed=42)
        tex = dyn.advance(t=0.0, dt=0.0, recompute_stats=True)
        ... each frame:
        tex = dyn.advance(t, dt, recompute_stats=(frame % 60 == 0))
    """

    def __init__(
        self,
        n_r: int,
        n_phi: int,
        r_inner: float,
        r_outer: float,
        seed: int = 42,
        enable_rt: bool = True,
        color_temp: Optional[float] = None,
        generation_scale: Optional[int] = None,
    ):
        self.n_r = n_r
        self.n_phi = n_phi
        # Low-res background generation + kron upscale, mirroring the
        # reference's generation-scale optimization (render.py:78-87);
        # size-adaptive by default (adaptive_generation_scale), with
        # divisibility fallback for explicit overrides.
        if generation_scale is None:
            self.generation_scale = adaptive_generation_scale(n_r, n_phi)
        else:
            self.generation_scale = (
                generation_scale if (n_r % generation_scale == 0 and
                                     n_phi % generation_scale == 0) else 1
            )
        self.r_inner = float(r_inner)
        self.r_outer = float(r_outer)
        self.enable_rt = enable_rt
        self.color_temp = float(
            DISK_COLOR_TEMPERATURE if color_temp is None else color_temp
        )

        rng = np.random.default_rng(seed)
        self.az_freq = float(rng.integers(2, 5))
        self.az_shear = float(rng.uniform(2.0, 4.0))

        self.factories: Dict = make_factories(
            n_r, r_inner, r_outer, seed, enable_rt=enable_rt
        )
        for f in self.factories.values():
            f.seed_initial(now=0.0)

        r_norm, omega_np = radial_omega_rows(n_r, r_inner, r_outer)
        self.omega_rows = jnp.asarray(omega_np)
        self.edge = jnp.asarray(compute_edge_alpha(n_r))

        # Initial permissive stats (reference init_background_layer,
        # render.py:3532-3542) — replaced by the first recompute.
        tb_init = np.clip(1.0 - r_norm, 0.0, 1.0) ** 1.3 * 0.25
        self.density_p98 = jnp.float32(0.5)
        self.struct_scale = jnp.float32(0.5)
        self.row_stats = jnp.asarray(
            np.stack(
                [np.maximum(tb_init, 0.25), np.maximum(tb_init * 0.8, 0.10)],
                axis=1,
            ).astype(np.float32)
        )
        self.comp: Optional[jnp.ndarray] = None

    @property
    def entity_count(self) -> int:
        return sum(len(f.entities) for f in self.factories.values())

    def _pack(self, now: float):
        fil = jnp.asarray(pack_filaments(self.factories["filament"], now))
        hs = jnp.asarray(
            pack_timer_entities(self.factories["hotspot"], now, MAX_HOTSPOTS)
        )
        rt = jnp.asarray(
            pack_timer_entities(self.factories["rt_spike"], now, MAX_RT_SPIKES)
        )
        return fil, hs, rt

    def advance(
        self,
        t: float,
        dt: float,
        recompute_stats: bool = False,
        solo_idx: int = -1,
    ) -> jnp.ndarray:
        """Tick factories, regenerate the comp field, compose the texture.

        Returns the (n_r, n_phi, 4) RGBA texture for time ``t``.
        """
        for f in self.factories.values():
            f.tick(now=t, dt=dt)
        fil, hs, rt = self._pack(t)

        comp, tex = _dynamic_step(
            fil, hs, rt, self.omega_rows, self.edge,
            self.density_p98, self.struct_scale, self.row_stats,
            jnp.float32(self.az_freq), jnp.float32(self.az_shear),
            jnp.float32(self.r_inner), jnp.float32(self.r_outer),
            jnp.float32(t),
            self.n_r, self.n_phi, self.enable_rt,
            jnp.float32(self.color_temp),
            generation_scale=self.generation_scale,
            compose=not (recompute_stats or solo_idx >= 0),
        )
        self.comp = comp

        # Persisted stats always come from the FULL comp field, even
        # while a component is soloed; the solo stats below are
        # display-local and never stored. DELIBERATE deviation: the
        # reference's solo branch persists solo-derived stats into its
        # stats fields (render.py:3745-3749), so for up to 59 frames
        # after un-soloing it composes with solo normalization — here
        # un-soloing resumes immediately with full-field stats
        # (PARITY.md deviation 13).
        if recompute_stats:
            self.density_p98, self.struct_scale, self.row_stats = (
                _recompute_stats(comp, self.edge, self.enable_rt)
            )
        if solo_idx >= 0:
            comp = self._solo_comp(comp, solo_idx)
            p98, scale, row_stats = _recompute_stats(comp, self.edge, self.enable_rt)
            tex = compose_from_components(
                comp, self.omega_rows, self.edge, p98, scale, row_stats,
                0.0, self.enable_rt, jnp.float32(self.color_temp),
            )
        elif recompute_stats:
            tex = compose_from_components(
                comp, self.omega_rows, self.edge, self.density_p98,
                self.struct_scale, self.row_stats, 0.0,
                self.enable_rt, jnp.float32(self.color_temp),
            )
        return tex

    def refresh_stats(self, t: float) -> None:
        """Recompute normalization stats from the CURRENT factory state
        at time ``t`` without ticking the factories.

        Used by video resume: the replay loop ticks factories frame by
        frame and calls this at the frame an uninterrupted run last
        recomputed stats, reproducing its normalization exactly.
        """
        fil, hs, rt = self._pack(t)
        comp, _ = _dynamic_step(
            fil, hs, rt, self.omega_rows, self.edge,
            self.density_p98, self.struct_scale, self.row_stats,
            jnp.float32(self.az_freq), jnp.float32(self.az_shear),
            jnp.float32(self.r_inner), jnp.float32(self.r_outer),
            jnp.float32(t),
            self.n_r, self.n_phi, self.enable_rt,
            jnp.float32(self.color_temp),
            generation_scale=self.generation_scale,
            compose=False,
        )
        self.comp = comp
        self.density_p98, self.struct_scale, self.row_stats = (
            _recompute_stats(comp, self.edge, self.enable_rt)
        )

    def _solo_comp(self, comp: jnp.ndarray, solo_idx: int) -> jnp.ndarray:
        return solo_comp(comp, solo_idx)
