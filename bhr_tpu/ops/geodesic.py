"""Null-geodesic integration around a Schwarzschild black hole (pure JAX).

Physics: the Cartesian equivalent-potential form of the photon equation
of motion, d^2 x / dlambda^2 = -1.5 * L^2 * x / r^5, with conserved
L^2 = |dir x pos|^2, integrated by RK4 with an r-adaptive step
(parity: reference ray-march kernel, /root/reference/render.py:2787-3006,
acceleration + Jacobian at render.py:2518-2539).

TPU-first design — this module deliberately restructures the reference's
per-pixel divergent while-loop:

  * Rays are arrays, not threads. All pixels advance in lock-step inside a
    single `lax.while_loop`; per-ray termination is handled with masks.
  * **Deferred shading**: the loop performs *zero* texture gathers.
    Disk-plane crossings are recorded into a fixed-size hit buffer
    ((N, K, 12) — xy, ray dir, 2 ray-differential vectors) via masked
    scatter; texture sampling + relativistic shading + alpha compositing
    run afterwards as one fully vectorized pass (see pipeline.py). This
    keeps the hot loop pure VPU math and turns all HBM gathers into a few
    large batched lookups.
  * Ray-differential AA integrates the variational equation alongside the
    main ray using the acceleration Jacobian, sharing the main ray's RK4
    stage positions.

A Pallas kernel with per-tile early exit (ops/geodesic_pallas.py) provides
the production path for large frames; this module is the semantics
reference, the small-scale/CPU path, and the test oracle.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..camera import Camera
from ..constants import MAX_DISK_CROSSINGS, RS

# Hit-record feature layout along the last axis of `hits`:
#   0:2   hit_x, hit_y          (world xy on the tilted disk plane)
#   2:5   ray direction at the crossing step (pre-step, points away from cam)
#   5:8   d(pos)/d(pixel_x) at the crossing (ray differentials; zeros if off)
#   8:11  d(pos)/d(pixel_y) at the crossing
#   11    t_frac within the step (diagnostics; the Pallas production
#         kernel writes 0 here in non-AA mode — no shader reads it)
HIT_FEATURES = 12


class TraceResult(NamedTuple):
    """Output of the geodesic integrator for N rays.

    ``hits`` uses (K, HIT_FEATURES, N) layout — feature planes contiguous
    over rays — so the Pallas kernel's tiled output reshapes into it with
    zero transposes at full-frame sizes.
    """

    captured: jnp.ndarray  # (N,) bool — fell through the horizon
    escaped: jnp.ndarray  # (N,) bool — left the escape sphere / affine cap
    escape_dir: jnp.ndarray  # (N, 3) unit direction for skybox lookup
    hit_count: jnp.ndarray  # (N,) int32 number of recorded disk crossings
    hits: jnp.ndarray  # (K, HIT_FEATURES, N)
    steps: jnp.ndarray  # (N,) int32 per-ray RK4 step counts when
    # record_step_counts=True (diagnostics / the Mray-steps/s benchmark
    # metric). Without that flag the field is backend-dependent filler —
    # the pure-JAX tracer returns its () lock-step trip count, the
    # Pallas tracer a () zero (tiles run independent loops; there is no
    # global count) — and must not be consumed.


def acceleration(pos: jnp.ndarray, l2: jnp.ndarray) -> jnp.ndarray:
    """a = -1.5 * L^2 * pos / r^5 (batched over leading axes)."""
    r2 = jnp.sum(pos * pos, axis=-1, keepdims=True)
    r5 = r2 * r2 * jnp.sqrt(r2)
    return -1.5 * l2[..., None] / r5 * pos


def acceleration_jacobian(pos: jnp.ndarray, d_pos: jnp.ndarray, l2: jnp.ndarray) -> jnp.ndarray:
    """Directional derivative of the acceleration along a perturbation.

    J(pos) @ d_pos = -1.5 L^2 / r^5 * (d_pos - 5 * pos * (pos.d_pos)/r^2)
    — the variational equation driving ray-differential transport.
    """
    r2 = jnp.sum(pos * pos, axis=-1, keepdims=True)
    r5 = r2 * r2 * jnp.sqrt(r2)
    factor = -1.5 * l2[..., None] / r5
    proj = jnp.sum(pos * d_pos, axis=-1, keepdims=True) / r2
    return factor * (d_pos - 5.0 * pos * proj)


def adaptive_step(r: jnp.ndarray, h_base: float, rs: float = RS) -> jnp.ndarray:
    """r-adaptive step: large far away, damped near the horizon.

    h = h_base * clamp( min(sqrt(r/rs), 10) / (1 + 2 (rs/r)^3), 0.2, 10 ).
    """
    r_safe = jnp.maximum(r, rs + 1e-3)
    far = jnp.minimum(jnp.sqrt(r_safe / rs), 10.0)
    near = 1.0 / (1.0 + 2.0 * (rs / r_safe) ** 3)
    return h_base * jnp.clip(far * near, 0.2, 10.0)


def _rk4_ray(pos, dirv, l2, h):
    """One RK4 step of (pos, dir); returns (new_pos, new_dir, stage k1p..k3p)."""
    hh = h[..., None]
    k1p = hh * dirv
    k1d = hh * acceleration(pos, l2)
    k2p = hh * (dirv + 0.5 * k1d)
    k2d = hh * acceleration(pos + 0.5 * k1p, l2)
    k3p = hh * (dirv + 0.5 * k2d)
    k3d = hh * acceleration(pos + 0.5 * k2p, l2)
    k4p = hh * (dirv + k3d)
    k4d = hh * acceleration(pos + k3p, l2)
    new_pos = pos + (k1p + 2 * k2p + 2 * k3p + k4p) / 6.0
    new_dir = dirv + (k1d + 2 * k2d + 2 * k3d + k4d) / 6.0
    return new_pos, new_dir, (k1p, k2p, k3p)


def _rk4_differential(pos, d_pos, d_dir, l2, h, stages):
    """RK4 step of one ray-differential (d_pos, d_dir), reusing main stages."""
    k1p, k2p, k3p = stages
    hh = h[..., None]
    k1pd = hh * d_dir
    k1dd = hh * acceleration_jacobian(pos, d_pos, l2)
    k2pd = hh * (d_dir + 0.5 * k1dd)
    k2dd = hh * acceleration_jacobian(pos + 0.5 * k1p, d_pos + 0.5 * k1pd, l2)
    k3pd = hh * (d_dir + 0.5 * k2dd)
    k3dd = hh * acceleration_jacobian(pos + 0.5 * k2p, d_pos + 0.5 * k2pd, l2)
    k4pd = hh * (d_dir + k3dd)
    k4dd = hh * acceleration_jacobian(pos + k3p, d_pos + k3pd, l2)
    new_d_pos = d_pos + (k1pd + 2 * k2pd + 2 * k3pd + k4pd) / 6.0
    new_d_dir = d_dir + (k1dd + 2 * k2dd + 2 * k3dd + k4dd) / 6.0
    return new_d_pos, new_d_dir


@functools.partial(
    jax.jit,
    static_argnames=(
        "h_base",
        "r_escape",
        "rs",
        "tilt_deg",
        "r_inner",
        "r_outer",
        "with_differentials",
        "max_crossings",
        "record_hits",
        "record_step_counts",
    ),
)
def trace_geodesics(
    origin: jnp.ndarray,
    directions: jnp.ndarray,
    *,
    h_base: float,
    r_escape: float,
    rs: float = RS,
    tilt_deg: float = 0.0,
    r_inner: float = 2.0,
    r_outer: float = 15.0,
    with_differentials: bool = False,
    d_dir_dx0: Optional[jnp.ndarray] = None,
    d_dir_dy0: Optional[jnp.ndarray] = None,
    max_crossings: int = MAX_DISK_CROSSINGS,
    record_hits: bool = True,
    record_step_counts: bool = False,
) -> TraceResult:
    """Integrate N photon geodesics and record disk-plane crossings.

    Args:
        origin: (3,) shared ray origin (camera position).
        directions: (N, 3) unit ray directions.
        h_base: base affine step (CLI --step_size).
        r_escape: escape radius; affine cap is 40 * r_escape.
        tilt_deg: disk tilt about the x-axis; plane is z = y * tan(tilt).
        with_differentials: integrate 2 ray-differential pairs for AA.
        d_dir_dx0 / d_dir_dy0: (N, 3) initial direction differentials
            (one-pixel ray-direction deltas); required when
            ``with_differentials``.
        max_crossings: hit-buffer slots per ray (front-to-back order).
        record_hits: disable crossing detection entirely (skybox-only
            scenes) — saves the scatter.

    Returns:
        TraceResult. Rays that neither escape nor get captured within the
        iteration budget report neither flag (background renders black,
        matching the reference).
    """
    n = directions.shape[0]
    dtype = directions.dtype
    tan_t = jnp.tan(jnp.deg2rad(jnp.asarray(tilt_deg, dtype)))
    max_affine = r_escape * 40.0
    # Derived from max_affine so the iteration budget and the affine
    # cap can never desynchronize (rays frozen as neither captured nor
    # escaped would render black with no error).
    max_iter = int(max_affine / h_base)

    pos0 = jnp.broadcast_to(origin.astype(dtype), (n, 3))
    l2 = jnp.sum(jnp.cross(directions, pos0) ** 2, axis=-1)

    if with_differentials:
        if d_dir_dx0 is None or d_dir_dy0 is None:
            raise ValueError("differentials requested but initial deltas missing")
        dd_x0 = d_dir_dx0.astype(dtype)
        dd_y0 = d_dir_dy0.astype(dtype)
    else:
        dd_x0 = jnp.zeros((n, 3), dtype)
        dd_y0 = jnp.zeros((n, 3), dtype)

    zeros3 = jnp.zeros((n, 3), dtype)
    state = dict(
        pos=pos0,
        dir=directions.astype(dtype),
        d_pos_dx=zeros3,
        d_dir_dx=dd_x0,
        d_pos_dy=zeros3,
        d_dir_dy=dd_y0,
        affine=jnp.zeros((n,), dtype),
        active=jnp.ones((n,), bool),
        captured=jnp.zeros((n,), bool),
        escaped=jnp.zeros((n,), bool),
        escape_dir=zeros3,
        hit_count=jnp.zeros((n,), jnp.int32),
        hits=jnp.zeros((n, max_crossings, HIT_FEATURES), dtype),
        step=jnp.zeros((), jnp.int32),
    )
    if record_step_counts:
        state["ray_steps"] = jnp.zeros((n,), jnp.int32)

    ray_ids = jnp.arange(n, dtype=jnp.int32)

    def cond(s):
        return jnp.logical_and(s["step"] < max_iter, jnp.any(s["active"]))

    def body(s):
        pos, dirv = s["pos"], s["dir"]
        active = s["active"]
        r_cur = jnp.linalg.norm(pos, axis=-1)
        h = adaptive_step(r_cur, h_base, rs)

        new_pos, new_dir, stages = _rk4_ray(pos, dirv, l2, h)
        if with_differentials:
            nd_pos_dx, nd_dir_dx = _rk4_differential(
                pos, s["d_pos_dx"], s["d_dir_dx"], l2, h, stages
            )
            nd_pos_dy, nd_dir_dy = _rk4_differential(
                pos, s["d_pos_dy"], s["d_dir_dy"], l2, h, stages
            )
        else:
            nd_pos_dx, nd_dir_dx = s["d_pos_dx"], s["d_dir_dx"]
            nd_pos_dy, nd_dir_dy = s["d_pos_dy"], s["d_dir_dy"]

        # r^2-space comparisons, in lockstep with the Pallas kernel
        # (x*x + y*y + z*z vs rs^2 / r_escape^2): tests assert the two
        # backends' captured/escaped/hit_count match EXACTLY, and a
        # sqrt here could flip a boundary-adjacent ray by one ulp.
        r2_new = jnp.sum(new_pos * new_pos, axis=-1)
        affine_new = s["affine"] + h

        captured_now = active & (r2_new < rs * rs)
        escaped_now = active & ~captured_now & (
            (r2_new > r_escape * r_escape) | (affine_new > max_affine)
        )
        terminated = captured_now | escaped_now
        survive = active & ~terminated

        esc_dir = new_dir / jnp.maximum(
            jnp.linalg.norm(new_dir, axis=-1, keepdims=True), 1e-9
        )
        escape_dir = jnp.where(escaped_now[:, None], esc_dir, s["escape_dir"])

        hit_count = s["hit_count"]
        hits = s["hits"]
        if record_hits:
            # Tilted-plane crossing test on the *surviving* segment
            # (matching the reference, which breaks on capture/escape
            # before the disk test).
            f_old = pos[:, 2] - pos[:, 1] * tan_t
            f_new = new_pos[:, 2] - new_pos[:, 1] * tan_t
            crossing = survive & (f_old * f_new < 0)
            t_frac = f_old / (f_old - f_new + 1e-8)
            hit_x = pos[:, 0] + t_frac * (new_pos[:, 0] - pos[:, 0])
            hit_y = pos[:, 1] + t_frac * (new_pos[:, 1] - pos[:, 1])
            # r^2-space annulus test, matching the Pallas kernel's
            # hr2 = hx*hx + hy*hy form exactly (see note above).
            hit_r2 = hit_x * hit_x + hit_y * hit_y
            record = crossing & (hit_r2 >= r_inner * r_inner) & (
                hit_r2 <= r_outer * r_outer
            ) & (hit_count < max_crossings)

            tf = t_frac[:, None]
            # Within-step lerp of the differentials — a DELIBERATE
            # deviation from the reference, which commits the full
            # end-of-step value (its own t_frac lerp is a no-op because
            # d_pos_dx is updated before the disk test, render.py:2947);
            # see docs/PARITY.md deviation 3. Affects only the mip-LOD
            # gradient at crossings, goldens are per-backend anyway.
            hit_dx = s["d_pos_dx"] + tf * (nd_pos_dx - s["d_pos_dx"])
            hit_dy = s["d_pos_dy"] + tf * (nd_pos_dy - s["d_pos_dy"])
            feat = jnp.concatenate(
                [
                    hit_x[:, None],
                    hit_y[:, None],
                    dirv,  # pre-step direction, as the reference uses for
                    # ray_to_cam = -dir_ (render.py:2954)
                    hit_dx,
                    hit_dy,
                    t_frac[:, None],
                ],
                axis=-1,
            )
            # Masked scatter: non-recording rays get out-of-range indices
            # and are dropped; XLA keeps the carried buffer in place.
            # NOT unique_indices=True: every non-recording ray shares the
            # out-of-range row n, and duplicates under that promise are
            # documented UB even when mode="drop" discards them.
            scatter_rows = jnp.where(record, ray_ids, n)
            hits = hits.at[scatter_rows, hit_count].set(feat, mode="drop")
            hit_count = hit_count + record.astype(jnp.int32)

        keep = survive[:, None]
        new_state = dict(
            pos=jnp.where(keep, new_pos, pos),
            dir=jnp.where(keep, new_dir, dirv),
            d_pos_dx=jnp.where(keep, nd_pos_dx, s["d_pos_dx"]),
            d_dir_dx=jnp.where(keep, nd_dir_dx, s["d_dir_dx"]),
            d_pos_dy=jnp.where(keep, nd_pos_dy, s["d_pos_dy"]),
            d_dir_dy=jnp.where(keep, nd_dir_dy, s["d_dir_dy"]),
            affine=jnp.where(survive, affine_new, s["affine"]),
            active=survive,
            captured=s["captured"] | captured_now,
            escaped=s["escaped"] | escaped_now,
            escape_dir=escape_dir,
            hit_count=hit_count,
            hits=hits,
            step=s["step"] + 1,
        )
        if record_step_counts:
            new_state["ray_steps"] = s["ray_steps"] + active.astype(jnp.int32)
        return new_state

    final = jax.lax.while_loop(cond, body, state)
    return TraceResult(
        captured=final["captured"],
        escaped=final["escaped"],
        escape_dir=final["escape_dir"],
        hit_count=final["hit_count"],
        # Internal scatter layout is (N, K, F); canonical is (K, F, N).
        hits=jnp.transpose(final["hits"], (1, 2, 0)),
        steps=final["ray_steps"] if record_step_counts else final["step"],
    )


def primary_rays_from_arrays(
    pos: jnp.ndarray,
    right: jnp.ndarray,
    up: jnp.ndarray,
    fwd: jnp.ndarray,
    pw,
    ph,
    width: int,
    height: int,
    row_start=0,
    row_count: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Primary ray directions and one-pixel direction differentials.

    Traceable (camera basis passed as arrays; width/height static).
    Returns (directions, d_dir_dx, d_dir_dy), each (rows*W, 3), row-major
    (y, x) pixel order. Matches the reference's image-plane setup
    (render.py:2811-2840): plane 1 unit ahead, pixel centers at +0.5,
    y increasing downward in the image.

    ``row_start``/``row_count`` select a horizontal band of the image for
    spatial (tile-axis) sharding; ``row_start`` may be traced,
    ``row_count`` must be static.
    """
    h, w = height, width

    center = pos + fwd
    tl = center - right * (pw * w / 2.0) + up * (ph * h / 2.0)

    if row_count is None:
        row_count = h
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(row_count, dtype=jnp.float32) + row_start
    px, py = jnp.meshgrid(xs, ys)  # (row_count, W)

    def ray_at(px_offset, py_offset):
        p = (
            tl[None, None, :]
            + (px + px_offset)[..., None] * pw * right[None, None, :]
            - (py + py_offset)[..., None] * ph * up[None, None, :]
        )
        d = p - pos[None, None, :]
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    d0 = ray_at(0.5, 0.5)
    ddx = ray_at(1.5, 0.5) - d0
    ddy = ray_at(0.5, 1.5) - d0
    return (
        d0.reshape(-1, 3),
        ddx.reshape(-1, 3),
        ddy.reshape(-1, 3),
    )


def primary_rays(camera: Camera) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Convenience wrapper of :func:`primary_rays_from_arrays` for a Camera."""
    return primary_rays_from_arrays(
        jnp.asarray(camera.pos),
        jnp.asarray(camera.right),
        jnp.asarray(camera.up),
        jnp.asarray(camera.forward),
        camera.pixel_width,
        camera.pixel_height,
        camera.width,
        camera.height,
    )
