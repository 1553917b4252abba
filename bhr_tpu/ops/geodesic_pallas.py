"""Pallas TPU ray-march kernel: per-tile early exit geodesic integration.

Production path for large frames, replacing the pure-JAX lock-step loop
of ops/geodesic.py. Why this shape:

  * The divergence problem: photon-ring rays orbit for thousands of RK4
    steps while typical rays finish in a few hundred. A global lock-step
    `lax.while_loop` over the whole image pays the worst-case trip count
    on every ray AND streams ~100s of MB of state through HBM per
    iteration (measured 43 s / FHD frame). Divergence is spatially
    correlated — long-running rays cluster in a thin annulus around the
    photon ring — so tiling the image and letting each tile's loop exit
    as soon as *its* rays are done recovers nearly all the waste.
  * All integration state lives in VMEM registers/arrays for the tile;
    the only HBM traffic is the small per-tile result blocks written
    once at the end. Primary rays are generated inside the kernel from
    camera scalars (SMEM) — no ray buffers in HBM at all.
  * Zero gathers in the loop (deferred shading contract shared with
    ops/geodesic.py): disk-plane crossings write into K per-ray hit
    slots held in VMEM via masked selects.

Physics parity: identical math to ops/geodesic.py (which is itself the
semantics twin of the reference kernel, /root/reference/render.py:
2787-3006); equivalence is asserted in tests/unit/test_pallas_parity.py.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..camera import Camera
from ..constants import MAX_DISK_CROSSINGS, RS
from .geodesic import HIT_FEATURES, TraceResult

# Tile shape: BR sublanes x BC lanes of pixels per kernel instance.
# With per-step exit checks, 64x128 was fastest (grid overhead beat
# exit granularity); with the 8-step unrolled exit check amortizing
# that overhead, 32x128 wins (17.5 vs 19.3 ms at FHD on v5e) — finer
# tiles quit sooner around the photon ring. The AA kernel triples the
# per-lane state (two Jacobian-transported differential systems), so it
# prefers finer 16-row tiles and a longer 16-step exit cadence
# (FHD sweep: 16x128/ece16 32.6 ms vs 32x128/ece8 34.8; the slim kernel
# measures the opposite, 16.5 vs 18.1).
BLOCK_ROWS = 32
BLOCK_ROWS_AA = 16
BLOCK_COLS = 128

# Camera parameter vector layout (SMEM):
#   0:3 cam_pos, 3:6 right, 6:9 up, 9:12 forward, 12 pw, 13 ph
CAM_PARAMS = 14


def _normalize3(x, y, z):
    inv = jax.lax.rsqrt(x * x + y * y + z * z + 1e-18)
    return x * inv, y * inv, z * inv


def build_ray_march_kernel(
    *,
    width: int,
    height: int,
    h_base: float,
    r_escape: float,
    rs: float,
    tilt_deg: float,
    r_inner: float,
    r_outer: float,
    with_differentials: bool,
    max_crossings: int,
    record_hits: bool,
    block_rows: Optional[int] = None,
    block_cols: int = BLOCK_COLS,
    max_iter_override: Optional[int] = None,
    exit_check_every: Optional[int] = None,
    record_step_counts: bool = False,
    interpret: bool = False,
    row_count: Optional[int] = None,
):
    """Build the tiled ray-march pallas_call for a static configuration.

    Returns a function (cam_params (14,) f32, row_start scalar) ->
    (captured, escaped, escape_dir, hit_count, hits) with shapes
    ((R,W), (R,W), (3,R,W), (R,W) i32, (K, HIT_FEATURES, R, W)) on the
    *padded* grid; the wrapper crops. ``row_count`` (R, default
    ``height``) with a nonzero ``row_start`` traces a horizontal band
    of the ``width`` x ``height`` image plane — the spatial-shard
    ("tile" mesh axis) path; the camera geometry always uses the FULL
    frame dimensions (same convention as ops/geodesic.
    primary_rays_from_arrays).
    """
    if row_count is None:
        row_count = height
    if block_rows is None:
        block_rows = BLOCK_ROWS_AA if with_differentials else BLOCK_ROWS
    if exit_check_every is None:
        # Unrolling steps per exit check amortizes the tile-wide
        # max-reduction + loop overhead (25.5 -> 18.8 ms at FHD on
        # v5e); the heavier AA body prefers a longer cadence (see the
        # tile-shape sweep above). Under the interpreter every extra
        # step is real Python work, so check every step there.
        exit_check_every = (
            1 if interpret else (16 if with_differentials else 8)
        )
    tan_t = float(np.tan(np.deg2rad(tilt_deg)))
    max_affine = r_escape * 40.0
    # Derived from max_affine so the iteration budget and the affine
    # cap can never desynchronize (same coupling as ops/geodesic.py).
    max_iter = (
        int(max_iter_override)
        if max_iter_override is not None
        else int(max_affine / h_base)
    )
    k_slots = max_crossings
    n_feat = HIT_FEATURES if with_differentials else 5

    pad_h = -row_count % block_rows
    pad_w = -width % block_cols
    hp, wp = row_count + pad_h, width + pad_w
    grid = (hp // block_rows, wp // block_cols)

    def kernel(cam_ref, row0_ref, captured_ref, escaped_ref, escdir_ref,
               count_ref, hits_ref, *extra_refs):
        ti = pl.program_id(0)
        tj = pl.program_id(1)
        # Dynamic pixel-row origin (SMEM scalar): lets a spatial shard
        # trace rows [row0, row0 + height) of a larger frame — the
        # "tile" mesh axis for single large frames. 0 for whole frames.
        row0 = row0_ref[0, 0].astype(jnp.float32)

        cx, cy, cz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
        rx, ry, rz = cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5]
        ux, uy, uz = cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8]
        fx, fy, fz = cam_ref[0, 9], cam_ref[0, 10], cam_ref[0, 11]
        pw, ph = cam_ref[0, 12], cam_ref[0, 13]

        # Image-plane top-left (1 unit ahead of the camera).
        tlx = cx + fx - rx * (pw * width * 0.5) + ux * (ph * height * 0.5)
        tly = cy + fy - ry * (pw * width * 0.5) + uy * (ph * height * 0.5)
        tlz = cz + fz - rz * (pw * width * 0.5) + uz * (ph * height * 0.5)

        rows = jax.lax.broadcasted_iota(
            jnp.int32, (block_rows, block_cols), 0
        ).astype(jnp.float32)
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (block_rows, block_cols), 1
        ).astype(jnp.float32)
        py_pix = rows + ti.astype(jnp.float32) * block_rows + row0
        px_pix = cols + tj.astype(jnp.float32) * block_cols

        def ray_dir(px_off, py_off):
            a = (px_pix + px_off) * pw
            b = (py_pix + py_off) * ph
            dx = tlx + a * rx - b * ux - cx
            dy = tly + a * ry - b * uy - cy
            dz = tlz + a * rz - b * uz - cz
            return _normalize3(dx, dy, dz)

        dx0, dy0, dz0 = ray_dir(0.5, 0.5)

        # Conserved -1.5 * L^2 with L = |dir x pos|.
        lx = dy0 * cz - dz0 * cy
        ly = dz0 * cx - dx0 * cz
        lz = dx0 * cy - dy0 * cx
        l2 = lx * lx + ly * ly + lz * lz
        neg_15_l2 = -1.5 * l2
        # Doom threshold for the two-phase loop: the pseudo-potential
        # ODE conserves 2E = |v|^2 - L^2/r^3, and the radial equation
        # (dr/dlambda)^2 = 2E - W(r) with W(r) = L^2 (1/r^2 - 1/r^3)
        # peaking at r = 1.5 (W_max = 4 L^2 / 27) has NO turning points
        # when 2E > W_max: dr keeps its sign forever. 5% margin guards
        # against RK4 drift in E near the critical impact parameter.
        doom_thresh = (4.0 / 27.0) * 1.05 * l2

        shape = (block_rows, block_cols)
        zeros = jnp.zeros(shape, jnp.float32)
        pos = (jnp.full(shape, cx), jnp.full(shape, cy), jnp.full(shape, cz))
        dirv = (dx0, dy0, dz0)

        if with_differentials:
            ax1, ay1, az1 = ray_dir(1.5, 0.5)
            bx1, by1, bz1 = ray_dir(0.5, 1.5)
            ddx0 = (ax1 - dx0, ay1 - dy0, az1 - dz0)
            ddy0 = (bx1 - dx0, by1 - dy0, bz1 - dz0)
        else:
            ddx0 = (zeros, zeros, zeros)
            ddy0 = (zeros, zeros, zeros)

        state = (
            pos,                       # 0 position
            dirv,                      # 1 direction
            (zeros, zeros, zeros),     # 2 d_pos_dx
            ddx0,                      # 3 d_dir_dx
            (zeros, zeros, zeros),     # 4 d_pos_dy
            ddy0,                      # 5 d_dir_dy
            zeros,                     # 6 affine
            jnp.ones(shape, jnp.float32),   # 7 active (f32 0/1 — i1
            # loop carries fail to legalize in Mosaic)
            jnp.zeros(shape, jnp.float32),  # 8 captured
            jnp.zeros(shape, jnp.float32),  # 9 escaped
            jnp.zeros(shape, jnp.int32),  # 10 hit_count
            jnp.zeros((k_slots, n_feat) + shape, jnp.float32),  # 11 hits
            jnp.int32(0),              # 12 step
        )
        if record_step_counts:
            # 13: per-ray useful-step counter (diagnostics / Mray-steps/s)
            state = state + (jnp.zeros(shape, jnp.int32),)

        def cond(s):
            return jnp.logical_and(s[12] < max_iter, jnp.max(s[7]) > 0.5)

        r_in2 = r_inner * r_inner
        # Hit recording tests the PROJECTED radius hx^2 + hy^2 on the
        # tilted plane z = y*tan(tilt); a recordable point at projected
        # radius r_outer sits at 3-D radius up to r_outer/cos(tilt)
        # (3-D r^2 = hx^2 + hy^2 (1 + tan^2 t)).  The outgoing gate must
        # therefore clear the TILTED disk rim, or the slim phase skips
        # recordable crossings for tilt > ~18 deg (bug found round 2).
        cos_t = math.cos(math.radians(tilt_deg))
        gate_out = max(r_outer / max(cos_t, 1e-6), 1.5 * rs) * 1.05
        gate_out2 = gate_out * gate_out

        def slim_eligible(s):
            """Rays that can provably never record another disk hit.

            Each criterion is monotone-once-true under the exact
            dynamics, so the fat-phase exit check can recompute it per
            check instead of latching state:
              * doomed infall: 2E > W_max (no turning points anywhere)
                and ingoing below r_inner — r decreases monotonically to
                capture, every future chord stays below r_inner;
              * outgoing beyond max(r_outer, 1.5 rs): W is decreasing
                there, so dr > 0 persists and r only grows — future
                crossings all land beyond r_outer (chord radius is
                convex, so interpolated hits can't dip below the
                endpoints);
              * full hit slots (record guard can never pass again).
            Differentials are only ever read when a hit records, so
            both they and the recording machinery are dead for these
            rays — the tile switches to the slim phase-B loop once ALL
            its live rays qualify.
            """
            (px, py, pz) = s[0]
            (vx, vy, vz) = s[1]
            r2 = px * px + py * py + pz * pz
            pv = px * vx + py * vy + pz * vz
            v2 = vx * vx + vy * vy + vz * vz
            inv_r = jax.lax.rsqrt(r2 + 1e-18)
            two_e = v2 - l2 * (inv_r * inv_r * inv_r)
            doomed = two_e > doom_thresh
            slim = (doomed & (pv < 0) & (r2 < r_in2)) | (
                (pv > 0) & (r2 > gate_out2)
            )
            if record_hits:
                slim = slim | (s[10] >= k_slots)
            return slim

        def cond_fat(s):
            live_fat = (s[7] > 0.5) & jnp.logical_not(slim_eligible(s))
            return jnp.logical_and(
                s[12] < max_iter, jnp.max(live_fat.astype(jnp.float32)) > 0.5
            )

        def _make_step(do_diffs: bool, do_record: bool):
          def body(s):
            (px, py, pz) = s[0]
            (vx, vy, vz) = s[1]
            active = s[7] > 0.5
            if exit_check_every > 1:
                # The exit check runs once per unrolled block, so the
                # block may run past max_iter; gate the step-count
                # bound here so still-active rays freeze at exactly
                # max_iter steps (identical semantics to the
                # per-step-checked and pure-JAX paths).
                active = active & (s[12] < max_iter)

            r2 = px * px + py * py + pz * pz
            r_cur = jnp.sqrt(r2)
            # Adaptive step (reference render.py:2858-2869). rs/r_safe
            # is computed divide-free as rs * min(rsqrt(r2), 1/(rs+eps))
            # (equivalent to clamping r from below); the rsqrt CSEs with
            # stage 1's radial factor, which evaluates the same r2.
            r_safe = jnp.maximum(r_cur, rs + 1e-3)
            far = jnp.minimum(jnp.sqrt(r_safe * (1.0 / rs)), 10.0)
            q = rs * jnp.minimum(jax.lax.rsqrt(r2), 1.0 / (rs + 1e-3))
            near = 1.0 / (1.0 + 2.0 * (q * q * q))
            h = h_base * jnp.clip(far * near, 0.2, 10.0)

            # RK4 of (pos, dir). In AA mode the stage radial factors
            # (f = -1.5 L^2 / r^5 and 1/r^2) are computed once per
            # stage and shared with the two Jacobian transports below —
            # the variational equation is evaluated at the SAME four
            # stage positions as the acceleration. (The divide-free
            # factors round differently from the earlier rs/r divide
            # form; goldens were regenerated with this kernel.)
            def stage_f(sx, sy, sz):
                # r^-5 and r^-2 from one rsqrt + multiplies: f32 divide
                # costs several VPU ops where a multiply costs one, and
                # this runs 4x per RK4 step on every ray.
                r2_ = sx * sx + sy * sy + sz * sz
                ir_ = jax.lax.rsqrt(r2_)
                ir2_ = ir_ * ir_
                inv_r2_ = ir2_ if do_diffs else None
                inv_r5_ = ir2_ * ir2_ * ir_
                return neg_15_l2 * inv_r5_, inv_r2_

            s1x, s1y, s1z = px, py, pz
            f1, i1 = stage_f(s1x, s1y, s1z)
            k1px, k1py, k1pz = h * vx, h * vy, h * vz
            k1dx, k1dy, k1dz = h * (f1 * s1x), h * (f1 * s1y), h * (f1 * s1z)
            k2px, k2py, k2pz = h * (vx + 0.5 * k1dx), h * (vy + 0.5 * k1dy), h * (vz + 0.5 * k1dz)
            s2x, s2y, s2z = px + 0.5 * k1px, py + 0.5 * k1py, pz + 0.5 * k1pz
            f2, i2 = stage_f(s2x, s2y, s2z)
            k2dx, k2dy, k2dz = h * (f2 * s2x), h * (f2 * s2y), h * (f2 * s2z)
            k3px, k3py, k3pz = h * (vx + 0.5 * k2dx), h * (vy + 0.5 * k2dy), h * (vz + 0.5 * k2dz)
            s3x, s3y, s3z = px + 0.5 * k2px, py + 0.5 * k2py, pz + 0.5 * k2pz
            f3, i3 = stage_f(s3x, s3y, s3z)
            k3dx, k3dy, k3dz = h * (f3 * s3x), h * (f3 * s3y), h * (f3 * s3z)
            k4px, k4py, k4pz = h * (vx + k3dx), h * (vy + k3dy), h * (vz + k3dz)
            s4x, s4y, s4z = px + k3px, py + k3py, pz + k3pz
            f4, i4 = stage_f(s4x, s4y, s4z)
            k4dx, k4dy, k4dz = h * (f4 * s4x), h * (f4 * s4y), h * (f4 * s4z)

            sixth = 1.0 / 6.0
            npx = px + (k1px + 2 * k2px + 2 * k3px + k4px) * sixth
            npy = py + (k1py + 2 * k2py + 2 * k3py + k4py) * sixth
            npz = pz + (k1pz + 2 * k2pz + 2 * k3pz + k4pz) * sixth
            nvx = vx + (k1dx + 2 * k2dx + 2 * k3dx + k4dx) * sixth
            nvy = vy + (k1dy + 2 * k2dy + 2 * k3dy + k4dy) * sixth
            nvz = vz + (k1dz + 2 * k2dz + 2 * k3dz + k4dz) * sixth

            if do_diffs:
                def jac(f_, inv_r2_, sx, sy, sz, dx_, dy_, dz_):
                    # J(s) @ d with the stage factors computed above.
                    proj = (sx * dx_ + sy * dy_ + sz * dz_) * inv_r2_
                    return (
                        f_ * (dx_ - 5.0 * sx * proj),
                        f_ * (dy_ - 5.0 * sy * proj),
                        f_ * (dz_ - 5.0 * sz * proj),
                    )

                def diff_rk4(dp, dd):
                    dpx, dpy, dpz = dp
                    ddx, ddy, ddz = dd
                    q1px, q1py, q1pz = h * ddx, h * ddy, h * ddz
                    j1x, j1y, j1z = jac(f1, i1, s1x, s1y, s1z, dpx, dpy, dpz)
                    q1dx, q1dy, q1dz = h * j1x, h * j1y, h * j1z
                    q2px, q2py, q2pz = h * (ddx + 0.5 * q1dx), h * (ddy + 0.5 * q1dy), h * (ddz + 0.5 * q1dz)
                    j2x, j2y, j2z = jac(
                        f2, i2, s2x, s2y, s2z,
                        dpx + 0.5 * q1px, dpy + 0.5 * q1py, dpz + 0.5 * q1pz,
                    )
                    q2dx, q2dy, q2dz = h * j2x, h * j2y, h * j2z
                    q3px, q3py, q3pz = h * (ddx + 0.5 * q2dx), h * (ddy + 0.5 * q2dy), h * (ddz + 0.5 * q2dz)
                    j3x, j3y, j3z = jac(
                        f3, i3, s3x, s3y, s3z,
                        dpx + 0.5 * q2px, dpy + 0.5 * q2py, dpz + 0.5 * q2pz,
                    )
                    q3dx, q3dy, q3dz = h * j3x, h * j3y, h * j3z
                    q4px, q4py, q4pz = h * (ddx + q3dx), h * (ddy + q3dy), h * (ddz + q3dz)
                    j4x, j4y, j4z = jac(
                        f4, i4, s4x, s4y, s4z,
                        dpx + q3px, dpy + q3py, dpz + q3pz,
                    )
                    q4dx, q4dy, q4dz = h * j4x, h * j4y, h * j4z
                    ndp = (
                        dpx + (q1px + 2 * q2px + 2 * q3px + q4px) * sixth,
                        dpy + (q1py + 2 * q2py + 2 * q3py + q4py) * sixth,
                        dpz + (q1pz + 2 * q2pz + 2 * q3pz + q4pz) * sixth,
                    )
                    ndd = (
                        ddx + (q1dx + 2 * q2dx + 2 * q3dx + q4dx) * sixth,
                        ddy + (q1dy + 2 * q2dy + 2 * q3dy + q4dy) * sixth,
                        ddz + (q1dz + 2 * q2dz + 2 * q3dz + q4dz) * sixth,
                    )
                    return ndp, ndd

                ndp_dx, ndd_dx = diff_rk4(s[2], s[3])
                ndp_dy, ndd_dy = diff_rk4(s[4], s[5])
            else:
                ndp_dx, ndd_dx = s[2], s[3]
                ndp_dy, ndd_dy = s[4], s[5]

            nr2 = npx * npx + npy * npy + npz * npz
            affine_new = s[6] + h

            # Compare in r^2 space: no sqrt needed for termination.
            captured_now = active & (nr2 < rs * rs)
            escaped_now = active & (~captured_now) & (
                (nr2 > r_escape * r_escape) | (affine_new > max_affine)
            )
            terminated = captured_now | escaped_now
            survive = active & (~terminated)

            hit_count = s[10]
            hits = s[11]
            if do_record:
                f_old = pz - py * tan_t
                f_new = npz - npy * tan_t
                crossing = survive & (f_old * f_new < 0)
                t_frac = f_old / (f_old - f_new + 1e-8)
                hx = px + t_frac * (npx - px)
                hy = py + t_frac * (npy - py)
                hr2 = hx * hx + hy * hy
                record = (
                    crossing
                    & (hr2 >= r_inner * r_inner)
                    & (hr2 <= r_outer * r_outer)
                    & (hit_count < k_slots)
                )

                if with_differentials:
                    (odpx, odpy, odpz) = s[2]
                    (odqx, odqy, odqz) = s[4]
                    # Within-step differential lerp: deliberate
                    # deviation from the reference's end-of-step commit
                    # — must stay in lockstep with ops/geodesic.py
                    # (PARITY.md dev. 3). Inside the branch so the slim
                    # path never traces six dead lerp planes.
                    hdx = odpx + t_frac * (ndp_dx[0] - odpx)
                    hdy = odpy + t_frac * (ndp_dx[1] - odpy)
                    hdz = odpz + t_frac * (ndp_dx[2] - odpz)
                    hqx = odqx + t_frac * (ndp_dy[0] - odqx)
                    hqy = odqy + t_frac * (ndp_dy[1] - odqy)
                    hqz = odqz + t_frac * (ndp_dy[2] - odqz)
                    feat_list = [hx, hy, vx, vy, vz, hdx, hdy, hdz,
                                 hqx, hqy, hqz, t_frac]
                else:
                    # Slim feature set: the differential planes are all
                    # zero without AA — carrying them would double the
                    # per-step select cost for nothing. t_frac is
                    # diagnostics-only (no shader reads feature 11), so
                    # the slim path drops it too: one fewer hit-slot
                    # select per slot per RK4 step.
                    feat_list = [hx, hy, vx, vy, vz]
                feats = jnp.stack(feat_list, axis=0)  # (n_feat, BR, BC)

                # Static-slice selects (scatter/ref-RMW both lower
                # worse; a tile-level lax.cond guard was also measured
                # slower — the branch stalls Mosaic's loop pipeline).
                slots = []
                for k in range(k_slots):
                    mask_k = record & (hit_count == k)
                    slots.append(jnp.where(mask_k[None], feats, hits[k]))
                hits = jnp.stack(slots, axis=0)
                hit_count = hit_count + record.astype(jnp.int32)

            def sel(new, old):
                return jnp.where(survive, new, old)

            # Direction commits on the terminating step too (mask =
            # active, not survive): the frozen final direction of an
            # escaped ray IS its escape direction, normalized once after
            # the loop — saving a normalize + 3 selects per step.
            def sel_a(new, old):
                return jnp.where(active, new, old)

            if do_diffs:
                new_dp_dx = tuple(sel(n, o) for n, o in zip(ndp_dx, s[2]))
                new_dd_dx = tuple(sel(n, o) for n, o in zip(ndd_dx, s[3]))
                new_dp_dy = tuple(sel(n, o) for n, o in zip(ndp_dy, s[4]))
                new_dd_dy = tuple(sel(n, o) for n, o in zip(ndd_dy, s[5]))
            else:
                # Differential state is identically zero: pass it
                # through untouched rather than emitting 12 dead
                # selects per step.
                new_dp_dx, new_dd_dx = s[2], s[3]
                new_dp_dy, new_dd_dy = s[4], s[5]

            out = (
                (sel(npx, px), sel(npy, py), sel(npz, pz)),
                (sel_a(nvx, vx), sel_a(nvy, vy), sel_a(nvz, vz)),
                new_dp_dx,
                new_dd_dx,
                new_dp_dy,
                new_dd_dy,
                jnp.where(survive, affine_new, s[6]),
                survive.astype(jnp.float32),
                jnp.maximum(s[8], captured_now.astype(jnp.float32)),
                jnp.maximum(s[9], escaped_now.astype(jnp.float32)),
                hit_count,
                hits,
                s[12] + 1,
            )
            if record_step_counts:
                out = out + (s[13] + active.astype(jnp.int32),)
            return out

          return body

        def _blocked(body):
            if exit_check_every <= 1:
                return body

            # Amortize the tile-wide "all rays done" max-reduction (and
            # while-loop overhead) over several RK4 steps: terminated
            # rays are already frozen by the per-state selects, so
            # overrunning by up to exit_check_every-1 steps is a no-op.
            def block_body(s):
                for _ in range(exit_check_every):
                    s = body(s)
                return s

            return block_body

        fat_body = _blocked(_make_step(with_differentials, record_hits))
        if record_hits or with_differentials:
            # TWO-PHASE loop: run the full body only while some live
            # ray could still record a hit (cond_fat); the long tails —
            # doomed near-critical infall spirals, post-annulus coasts
            # to the escape radius, full-slot rays — then integrate
            # with the slim body (no differential transport, no
            # crossing test, no hit-slot selects). Identical pos/dir
            # arithmetic in both phases, so results are bit-equal to
            # the single-loop form; only provably-dead work is skipped.
            slim_body = _blocked(_make_step(False, False))
            mid = jax.lax.while_loop(cond_fat, fat_body, state)
            final = jax.lax.while_loop(cond, slim_body, mid)
        else:
            final = jax.lax.while_loop(cond, fat_body, state)

        captured_ref[:, :] = final[8]
        escaped_ref[:, :] = final[9]
        fvx, fvy, fvz = final[1]
        ex, ey, ez = _normalize3(fvx, fvy, fvz)
        esc_mask = final[9]  # 1.0 where escaped; zero elsewhere to match
        # the pure-JAX path's zero-initialized escape_dir exactly.
        escdir_ref[0] = ex * esc_mask
        escdir_ref[1] = ey * esc_mask
        escdir_ref[2] = ez * esc_mask
        count_ref[:, :] = final[10]
        hits = final[11]
        if with_differentials:
            hits_ref[:, :, :, :] = hits
        else:
            # Expand slim features to the full 12-feature output layout:
            # [hx, hy, vx, vy, vz, 0 x7 (diffs + diagnostics t_frac)].
            zeros7 = jnp.zeros((k_slots, 7) + shape, jnp.float32)
            hits_ref[:, 0:5] = hits[:, 0:5]
            hits_ref[:, 5:12] = zeros7
        if record_step_counts:
            extra_refs[0][:, :] = final[13]

    out_shapes = (
        jax.ShapeDtypeStruct((hp, wp), jnp.float32),  # captured
        jax.ShapeDtypeStruct((hp, wp), jnp.float32),  # escaped
        jax.ShapeDtypeStruct((3, hp, wp), jnp.float32),  # escape_dir
        jax.ShapeDtypeStruct((hp, wp), jnp.int32),  # hit_count
        jax.ShapeDtypeStruct((k_slots, HIT_FEATURES, hp, wp), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((block_rows, block_cols), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, block_cols), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, block_rows, block_cols), lambda i, j: (0, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, block_cols), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (k_slots, HIT_FEATURES, block_rows, block_cols),
            lambda i, j: (0, 0, i, j),
            memory_space=pltpu.VMEM,
        ),
    )
    if record_step_counts:
        out_shapes = out_shapes + (
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        )
        out_specs = out_specs + (
            pl.BlockSpec((block_rows, block_cols), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        )

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, CAM_PARAMS), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )

    def run(cam_params: jnp.ndarray, row_start=0):
        row0 = jnp.asarray(row_start, jnp.float32).reshape(1, 1)
        return call(
            cam_params.reshape(1, CAM_PARAMS).astype(jnp.float32), row0
        )

    return run, (hp, wp)


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "h_base", "r_escape", "rs", "tilt_deg",
        "r_inner", "r_outer", "with_differentials", "max_crossings",
        "record_hits", "block_rows", "block_cols", "exit_check_every",
        "record_step_counts", "interpret", "row_count",
    ),
)
def trace_geodesics_pallas(
    cam_params: jnp.ndarray,
    row_start=0,
    *,
    width: int,
    height: int,
    h_base: float,
    r_escape: float,
    rs: float = RS,
    tilt_deg: float = 0.0,
    r_inner: float = 2.0,
    r_outer: float = 15.0,
    with_differentials: bool = False,
    max_crossings: int = MAX_DISK_CROSSINGS,
    record_hits: bool = True,
    block_rows: Optional[int] = None,
    block_cols: int = BLOCK_COLS,
    exit_check_every: Optional[int] = None,
    record_step_counts: bool = False,
    interpret: bool = False,
    row_count: Optional[int] = None,
) -> TraceResult:
    """Tiled Pallas trace -> TraceResult with flat (R*W) ray order.

    ``cam_params`` is the (14,) camera vector (see CAM_PARAMS layout).
    Output matches ops/geodesic.trace_geodesics on the same scene.
    ``row_start`` (traced ok) + ``row_count`` (static, default
    ``height``) trace a horizontal band of the full image plane — the
    spatial-shard path (same convention as primary_rays_from_arrays).
    With ``record_step_counts`` the kernel also counts the RK4 steps
    each ray actually integrates (``TraceResult.steps`` becomes (N,)
    int32) — diagnostics / the Mray-steps/s benchmark metric.
    """
    rows = height if row_count is None else row_count
    run, (hp, wp) = build_ray_march_kernel(
        width=width, height=height, h_base=h_base, r_escape=r_escape,
        rs=rs, tilt_deg=tilt_deg, r_inner=r_inner, r_outer=r_outer,
        with_differentials=with_differentials, max_crossings=max_crossings,
        record_hits=record_hits, block_rows=block_rows, block_cols=block_cols,
        exit_check_every=exit_check_every,
        record_step_counts=record_step_counts, interpret=interpret,
        row_count=row_count,
    )
    captured, escaped, escdir, count, hits, *extra = run(
        cam_params, row_start
    )

    captured = captured[:rows, :width]
    escaped = escaped[:rows, :width]
    escdir = escdir[:, :rows, :width]
    count = count[:rows, :width]
    hits = hits[:, :, :rows, :width]

    n = rows * width
    if record_step_counts:
        steps = extra[0][:rows, :width].reshape(n)
    else:
        steps = jnp.zeros((), jnp.int32)
    return TraceResult(
        captured=captured.reshape(n) > 0.5,
        escaped=escaped.reshape(n) > 0.5,
        escape_dir=escdir.reshape(3, n).T,
        hit_count=count.reshape(n),
        hits=hits.reshape(max_crossings, HIT_FEATURES, n),
        steps=steps,
    )


def camera_params(camera: Camera) -> np.ndarray:
    """Pack a Camera into the (14,) kernel parameter vector."""
    return np.concatenate(
        [
            camera.pos,
            camera.right,
            camera.up,
            camera.forward,
            np.asarray([camera.pixel_width, camera.pixel_height], np.float32),
        ]
    ).astype(np.float32)
