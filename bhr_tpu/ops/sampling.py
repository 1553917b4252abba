"""Gather-based texture sampling (skybox equirect, polar disk, mip LOD).

Parity targets in the reference (scalar Taichi funcs, here vectorized):
  - `_sample_skybox`    /root/reference/render.py:2541-2566
  - `_sample_disk`      /root/reference/render.py:2568-2598
  - `_sample_disk_mip`  /root/reference/render.py:2600-2637

Conventions (identical to the reference):
  * texel addressing is floor-based with no half-texel offset;
  * u (azimuth) wraps, v (radius / polar angle) clamps;
  * the disk texture is polar, rows = radius in [r_inner, r_outer],
    columns = phi in [0, 2pi); sampling applies a Keplerian rotation
    offset phi' = phi + t_offset * omega(r).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .fastmath import fast_arccos, fast_atan2

TWO_PI = 2.0 * jnp.pi


def _bilinear_gather(tex: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear lookup of ``tex`` (H, W, C) at texel coords (v=row, u=col).

    u wraps modulo W, v clamps to [0, H-1]. Returns (*batch, C).
    """
    tex_h, tex_w = tex.shape[0], tex.shape[1]
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = (u - u0.astype(u.dtype))[..., None]
    fv = (v - v0.astype(v.dtype))[..., None]

    u0w = jnp.mod(u0, tex_w)
    u1w = jnp.mod(u0 + 1, tex_w)
    v0h = jnp.clip(v0, 0, tex_h - 1)
    v1h = jnp.clip(v0 + 1, 0, tex_h - 1)

    c00 = tex[v0h, u0w]
    c10 = tex[v0h, u1w]
    c01 = tex[v1h, u0w]
    c11 = tex[v1h, u1w]
    return (
        c00 * (1 - fu) * (1 - fv)
        + c10 * fu * (1 - fv)
        + c01 * (1 - fu) * fv
        + c11 * fu * fv
    )


def pack_quad(tex: jnp.ndarray) -> jnp.ndarray:
    """Pack a (H, W, C) texture into (H, W, 4C) 2x2 footprints.

    Channel layout: [c00, c10, c01, c11] = [self, right (u-wrap),
    down (v-clamp), down-right]. One gather of a quad row then fetches
    the full bilinear footprint — TPU gathers are fetch-count bound, so
    this cuts sampling cost ~4x vs 4 corner gathers.
    """
    right = jnp.roll(tex, -1, axis=1)  # u wraps
    down = jnp.concatenate([tex[1:], tex[-1:]], axis=0)  # v clamps
    down_right = jnp.concatenate([right[1:], right[-1:]], axis=0)
    return jnp.concatenate([tex, right, down, down_right], axis=-1)


def encode_quad_u8(qtex: jnp.ndarray) -> jnp.ndarray:
    """Gamma-2 (sqrt) uint8 encoding of a quad-packed [0, 1] texture.

    TPU gathers are fetch-size bound per index: uint8 halves the row
    bytes vs bf16 (e.g. a 16-channel disk quad drops 32B -> 16B). The
    sqrt transfer allocates codes by perceptual density — worst-case
    absolute error at v is ~2*sqrt(v)/255 (6e-4 near black), well below
    the 8-bit PNG output quantile.
    """
    return jnp.round(
        jnp.sqrt(jnp.clip(qtex, 0.0, 1.0)) * 255.0
    ).astype(jnp.uint8)


def production_tex_dtype():
    """Storage dtype policy for quad-packed textures: gamma-2 uint8 on
    TPU (halves gather fetch bytes), f32 elsewhere. Single source of
    truth — the skybox quantization and renderer tex_dtype must agree.
    """
    return jnp.uint8 if jax.default_backend() == "tpu" else jnp.float32


def quantize_packed(qtex: jnp.ndarray, dtype) -> jnp.ndarray:
    """Convert a quad-packed f32 texture to its storage dtype.

    uint8 selects the gamma-2 encoding, stored bitcast as uint32 words
    (4 codes per lane): TPU row gathers move ~1.2 ns/index faster from
    word-width rows than from sub-word uint8 rows (measured FHD: ~5 ms
    across the frame's ~4.7M gather indices). Quad channel counts are
    always 4*C so the pack is exact. Decoded transparently by the quad
    samplers; any float dtype is a plain cast.
    """
    if dtype == jnp.uint8:
        u8 = encode_quad_u8(qtex)
        c = u8.shape[-1]
        return jax.lax.bitcast_convert_type(
            u8.reshape(*u8.shape[:-1], c // 4, 4), jnp.uint32
        )
    return qtex.astype(dtype)


def _decode_quad(q: jnp.ndarray) -> jnp.ndarray:
    """Decode a gathered quad row to f32 (inverse of quantize_packed)."""
    if q.dtype == jnp.uint32:
        u8 = jax.lax.bitcast_convert_type(q, jnp.uint8)
        q = u8.reshape(*u8.shape[:-2], u8.shape[-2] * 4)
    if q.dtype == jnp.uint8:
        f = q.astype(jnp.float32) * (1.0 / 255.0)
        return f * f
    return q


# XLA's TPU row gather degrades superlinearly beyond ~2M indices
# (measured: 2.07M -> 11 ms but 8.3M -> 59 ms, vs 46 ms as 4 chunks);
# band large sample batches back to the linear regime via lax.map.
# Banding the whole gather+decode+blend (not just the take) also keeps
# the decoded f32 intermediates at band size instead of materializing
# frame-sized (N, 4C) tensors between fusions — measured at 4K:
# take-only chunking 140 ms vs full-band 83 ms for the two main passes.
# Band-size sweep at 8.3M indices (16B rows): 0.5M 45.5 ms, 1M 51.2,
# 2M 50.4, 4M 64.0 — 0.5M wins; sorted indices measure identically
# (the gather is issue-bound, not locality-bound).
_GATHER_CHUNK = 1 << 19


def _banded_map(fn, *arrays):
    """Apply ``fn(*bands) -> (band, C)`` over _GATHER_CHUNK-sized bands
    of equally-shaped flat arrays; single direct call when small."""
    n = arrays[0].shape[0]
    if n <= _GATHER_CHUNK:
        return fn(*arrays)
    n_bands = -(-n // _GATHER_CHUNK)
    pad = n_bands * _GATHER_CHUNK - n
    banded = tuple(
        jnp.pad(a, (0, pad)).reshape(n_bands, _GATHER_CHUNK) for a in arrays
    )
    out = jax.lax.map(lambda t: fn(*t), banded)
    return out.reshape(n_bands * _GATHER_CHUNK, -1)[:n]


def _take_rows(tab2d: jnp.ndarray, flat_idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather `tab2d[flat_idx]`, banded when the index count is
    large. flat_idx may have any batch shape; returns (*batch, C)."""
    batch_shape = flat_idx.shape
    out = _banded_map(
        lambda ic: jnp.take(tab2d, ic, axis=0), flat_idx.reshape(-1)
    )
    return out.reshape(*batch_shape, tab2d.shape[-1])


def _bilinear_quad_gather(
    qtex: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, channels: int
) -> jnp.ndarray:
    """Bilinear lookup from a quad-packed texture (one gather per sample)."""
    tex_h, tex_w = qtex.shape[0], qtex.shape[1]
    batch_shape = u.shape
    u = u.reshape(-1)
    v = v.reshape(-1)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = u - u0.astype(u.dtype)
    fv = v - v0.astype(v.dtype)
    # v-clamp parity with the 4-gather path: above the top row both
    # sample rows clamp to row 0, i.e. the blend weight must be 0 there
    # (the packed "down" channel would otherwise leak row 1 in).
    fv = jnp.where(v0 < 0, 0.0, jnp.clip(fv, 0.0, 1.0))
    # Flattened single-axis take: XLA lowers a 1D row gather ~1.5-3x
    # faster than the equivalent 2D start-index gather on TPU.
    flat = jnp.clip(v0, 0, tex_h - 1) * tex_w + jnp.mod(u0, tex_w)
    tab2d = qtex.reshape(tex_h * tex_w, -1)
    c = channels

    out = _quad_blend_map(tab2d, flat, fu, fv, c)
    return out.reshape(*batch_shape, c)


def _quad_blend_map(tab2d, flat, fu, fv, c):
    """Banded gather + decode + bilinear blend over flat quad-row
    indices (the shared tail of every quad-packed sampler)."""

    def blend(flat_b, fu_b, fv_b):
        q = _decode_quad(jnp.take(tab2d, flat_b, axis=0))
        c00, c10 = q[..., :c], q[..., c : 2 * c]
        c01, c11 = q[..., 2 * c : 3 * c], q[..., 3 * c :]
        fu_c = fu_b[..., None]
        fv_c = fv_b[..., None]
        return (
            c00 * (1 - fu_c) * (1 - fv_c)
            + c10 * fu_c * (1 - fv_c)
            + c01 * (1 - fu_c) * fv_c
            + c11 * fu_c * fv_c
        )

    return _banded_map(blend, flat, fu, fv)


def sample_skybox_quad(qtexture: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    """Equirect skybox sample from a quad-packed (H, W, 12) texture.

    Uses fast polynomial trig (ops/fastmath.py): the per-ray
    arccos/atan2 dominated the shading pass at exact precision.
    """
    tex_h, tex_w = qtexture.shape[0], qtexture.shape[1]
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    theta = fast_arccos(z)
    phi = fast_atan2(y, x)
    phi = jnp.where(phi < 0, phi + TWO_PI, phi)
    u = phi / TWO_PI * tex_w
    v = theta / jnp.pi * tex_h
    return _bilinear_quad_gather(qtexture, u, v, 3)


def sample_disk_quad(
    qtex: jnp.ndarray,
    hit_x: jnp.ndarray,
    hit_y: jnp.ndarray,
    r_inner: float,
    r_outer: float,
    t_offset: float = 0.0,
) -> jnp.ndarray:
    """Disk RGBA sample from a quad-packed (n_r, n_phi, 16) texture."""
    u, v = _disk_uv(hit_x, hit_y, r_inner, r_outer, t_offset,
                    qtex.shape[1], qtex.shape[0], fast_trig=True)
    return _bilinear_quad_gather(qtex, u, v, 4)


def pack_quad_mips(mips: jnp.ndarray) -> jnp.ndarray:
    """Quad-pack each level of a padded (L, H, W, C) mip pyramid.

    Each level is packed within its own (H>>l, W>>l) active region so u
    wraps and v clamps at the level's true bounds.
    """
    levels = []
    base_h, base_w = mips.shape[1], mips.shape[2]
    for lvl in range(mips.shape[0]):
        h = max(base_h >> lvl, 1)
        w = max(base_w >> lvl, 1)
        active = mips[lvl, :h, :w]
        packed = pack_quad(active)
        levels.append(
            jnp.pad(packed, ((0, base_h - h), (0, base_w - w), (0, 0)))
        )
    return jnp.stack(levels, axis=0)


def mip_atlas_level_count(h: int, w: int, levels: int) -> int:
    """Number of levels build_mip_atlas_quad/build_mipmaps produce for
    an (h, w) base texture (base + up to ``levels`` halvings)."""
    n = 1
    ch, cw = h, w
    for _ in range(levels):
        if ch < 2 or cw < 2:
            break
        ch //= 2
        cw //= 2
        n += 1
    return n


def build_mip_atlas_quad(tex: jnp.ndarray, levels: int, tex_dtype):
    """Quad-packed mip ATLAS, bottom-packed: one (H + H//2, W, C')
    array — level 0 dense in rows [0, H) at its native stride W, level
    l >= 1 in rows [H, H + (H >> l)) at column offset
    ``W - 2*(W >> l)`` occupying (H >> l, W >> l).

    Replaces the padded (L, H, W, C') pyramid layout for the LOD path:
    the padded form materializes + quantizes L full-size planes (4x the
    base texture's traffic for 3 levels of mostly zeros); the atlas is
    1.5x the base rows. Levels are quantized to the storage dtype as
    they are placed. Requires H and W divisible by 2^levels (true for
    all generated disk textures — sizes are multiples of 16; callers
    fall back to the padded pyramid for arbitrary external textures).

    Why bottom- and not side-packed (the round-3 layout put level l's
    columns beside level 0 in (H, 2W)): gather cost grows with the
    ACCESS FOOTPRINT once it passes ~80 MB on v5e (measured flat
    ~7.5 ns/index through 77 MB, then ~11 at 116 MB, ~14 at 155 MB).
    At the 4K texture size (832 x 5824) the side layout interleaved
    level 0's rows across the full 155 MB atlas, so the dominant
    level-0 samples paid the 14 ns rate — ~2x the gather floor.
    Bottom-packing keeps level 0 byte-dense in its own 77 MB prefix
    (identical flat indices to the plain quad table), so level-0
    gathers run at the floor and only the rarer high-LOD samples touch
    the tail rows (DESIGN.md lesson 24).

    Returns (atlas, num_levels) with num_levels = levels + 1 (matching
    build_mipmaps' level count).
    """
    h, w = tex.shape[0], tex.shape[1]
    if levels > 0 and (h % (1 << levels) or w % (1 << levels)):
        raise ValueError(
            f"mip atlas needs ({h}, {w}) divisible by 2^{levels}"
        )
    if h % 2:
        raise ValueError(f"mip atlas needs even height, got {h}")
    q0 = quantize_packed(pack_quad(tex), tex_dtype)
    atlas = jnp.zeros((h + h // 2, w) + q0.shape[2:], q0.dtype)
    atlas = atlas.at[:h].set(q0)
    cur = tex
    off = 0
    n_levels = 1
    for _ in range(levels):
        if cur.shape[0] < 2 or cur.shape[1] < 2:
            break
        cur = (
            cur[0::2, 0::2] + cur[1::2, 0::2]
            + cur[0::2, 1::2] + cur[1::2, 1::2]
        ) * 0.25
        q = quantize_packed(pack_quad(cur), tex_dtype)
        atlas = atlas.at[
            h: h + cur.shape[0], off: off + cur.shape[1]
        ].set(q)
        off += cur.shape[1]
        n_levels += 1
    return atlas, n_levels


def pack_mip_atlas_from_pyramid(mips: jnp.ndarray, tex_dtype) -> jnp.ndarray:
    """Atlas (see build_mip_atlas_quad — same bottom-packed layout)
    from an already-built padded f32 pyramid — for callers that also
    keep the pyramid (Renderer), so the 2x2 downsample chain is not
    recomputed per texture update."""
    n_levels = int(mips.shape[0])
    h, w = int(mips.shape[1]), int(mips.shape[2])
    levels = n_levels - 1
    if levels > 0 and (h % (1 << levels) or w % (1 << levels)):
        raise ValueError(
            f"mip atlas needs ({h}, {w}) divisible by 2^{levels}"
        )
    if h % 2:
        raise ValueError(f"mip atlas needs even height, got {h}")
    q0 = quantize_packed(pack_quad(mips[0]), tex_dtype)
    atlas = jnp.zeros((h + h // 2, w) + q0.shape[2:], q0.dtype)
    atlas = atlas.at[:h].set(q0)
    off = 0
    for lvl in range(1, n_levels):
        lh, lw = h >> lvl, w >> lvl
        q = quantize_packed(pack_quad(mips[lvl, :lh, :lw]), tex_dtype)
        atlas = atlas.at[h: h + lh, off: off + lw].set(q)
        off += lw
    return atlas


def sample_disk_mip_atlas(
    qatlas: jnp.ndarray,
    num_levels: int,
    hit_x: jnp.ndarray,
    hit_y: jnp.ndarray,
    r_inner: float,
    r_outer: float,
    t_offset,
    lod: jnp.ndarray,
    channels: int = 4,
) -> jnp.ndarray:
    """Mip-LOD sample from a quad-packed mip ATLAS (one gather/sample).

    Same uv math and blend as :func:`sample_disk_mip_quad` (bit-equal
    results, asserted by tests); only the level addressing differs.
    Bottom-packed layout (see build_mip_atlas_quad): level 0 occupies
    rows [0, H) at stride W — flat indices identical to the plain quad
    table, keeping the dominant level-0 gathers byte-dense — and level
    l >= 1 sits in rows [H, H + (H >> l)) at column offset
    ``W - 2 * (W >> l)``; both are pure arithmetic offsets (no
    per-sample level-table lookup).
    """
    atlas_h = qatlas.shape[0]
    base_h = atlas_h * 2 // 3
    base_w = qatlas.shape[1]
    r, phi = _disk_polar(hit_x, hit_y, t_offset, fast_trig=True)

    lod_i = jnp.clip(lod, 0.0, num_levels - 1).astype(jnp.int32)
    scale = jnp.power(2.0, lod_i.astype(jnp.float32))
    w_lod = base_w / scale
    h_lod = base_h / scale
    w_lod_i = (base_w // (2**lod_i)).astype(jnp.int32)
    h_lod_i = (base_h // (2**lod_i)).astype(jnp.int32)

    u = phi / TWO_PI * w_lod
    v = (r - r_inner) / (r_outer - r_inner) * h_lod

    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = u - u0.astype(u.dtype)
    fv = v - v0.astype(v.dtype)
    fv = jnp.where(v0 < 0, 0.0, jnp.clip(fv, 0.0, 1.0))
    col = jnp.maximum(base_w - 2 * w_lod_i, 0) + jnp.mod(u0, w_lod_i)
    row = jnp.where(lod_i > 0, base_h, 0) + jnp.clip(v0, 0, h_lod_i - 1)
    flat = row * base_w + col
    tab2d = qatlas.reshape(atlas_h * base_w, -1)
    batch_shape = flat.shape

    out = _quad_blend_map(
        tab2d, flat.reshape(-1), fu.reshape(-1), fv.reshape(-1), channels
    )
    return out.reshape(*batch_shape, channels)


def sample_disk_mip_quad(
    qmips: jnp.ndarray,
    num_levels: int,
    hit_x: jnp.ndarray,
    hit_y: jnp.ndarray,
    r_inner: float,
    r_outer: float,
    t_offset: float,
    lod: jnp.ndarray,
    channels: int = 4,
) -> jnp.ndarray:
    """Mip-LOD sample from a quad-packed pyramid (one gather per sample)."""
    base_h, base_w = qmips.shape[1], qmips.shape[2]
    r, phi = _disk_polar(hit_x, hit_y, t_offset, fast_trig=True)

    lod_i = jnp.clip(lod, 0.0, num_levels - 1).astype(jnp.int32)
    scale = jnp.power(2.0, lod_i.astype(jnp.float32))
    w_lod = base_w / scale
    h_lod = base_h / scale
    w_lod_i = (base_w // (2**lod_i)).astype(jnp.int32)
    h_lod_i = (base_h // (2**lod_i)).astype(jnp.int32)

    u = phi / TWO_PI * w_lod
    v = (r - r_inner) / (r_outer - r_inner) * h_lod

    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = u - u0.astype(u.dtype)
    fv = v - v0.astype(v.dtype)
    fv = jnp.where(v0 < 0, 0.0, jnp.clip(fv, 0.0, 1.0))
    flat = (
        lod_i * (base_h * base_w)
        + jnp.clip(v0, 0, h_lod_i - 1) * base_w
        + jnp.mod(u0, w_lod_i)
    )
    n_levels_static = qmips.shape[0]
    tab2d = qmips.reshape(n_levels_static * base_h * base_w, -1)
    c = channels
    batch_shape = flat.shape

    out = _quad_blend_map(
        tab2d, flat.reshape(-1), fu.reshape(-1), fv.reshape(-1), c
    )
    return out.reshape(*batch_shape, c)


def sample_skybox(texture: jnp.ndarray, directions: jnp.ndarray) -> jnp.ndarray:
    """Sample an equirectangular skybox along unit ``directions``.

    Args:
        texture: (H, W, 3).
        directions: (*B, 3) unit vectors.
    Returns:
        (*B, 3) RGB.
    """
    tex_h, tex_w = texture.shape[0], texture.shape[1]
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    theta = jnp.arccos(jnp.clip(z, -1.0, 1.0))
    phi = jnp.arctan2(y, x)
    phi = jnp.where(phi < 0, phi + TWO_PI, phi)
    u = phi / TWO_PI * tex_w
    v = theta / jnp.pi * tex_h
    return _bilinear_gather(texture, u, v)


def _disk_polar(
    hit_x: jnp.ndarray,
    hit_y: jnp.ndarray,
    t_offset: float,
    fast_trig: bool = False,
):
    """(r, Keplerian-advected phi in [0, 2pi)) for a disk-plane hit.

    fast_trig selects the polynomial atan2 (ops/fastmath.py) used by the
    quad-packed production paths; the f32 reference paths keep exact
    arctan2 (the cross-backend tolerance accounts for the difference).
    """
    r = jnp.sqrt(hit_x**2 + hit_y**2)
    phi = fast_atan2(hit_y, hit_x) if fast_trig else jnp.arctan2(hit_y, hit_x)
    r_safe = jnp.maximum(r, 1e-3)
    omega = jnp.sqrt(0.5 / (r_safe**3 + 1e-6))
    phi = jnp.mod(phi + t_offset * omega, TWO_PI)
    return r, phi


def _disk_uv(
    hit_x: jnp.ndarray,
    hit_y: jnp.ndarray,
    r_inner: float,
    r_outer: float,
    t_offset: float,
    tex_w: int,
    tex_h: int,
    fast_trig: bool = False,
):
    """Polar texture coordinates for a disk-plane hit, with Keplerian spin."""
    r, phi = _disk_polar(hit_x, hit_y, t_offset, fast_trig)
    u = phi / TWO_PI * tex_w
    v = (r - r_inner) / (r_outer - r_inner) * tex_h
    return u, v


def sample_disk(
    disk_tex: jnp.ndarray,
    hit_x: jnp.ndarray,
    hit_y: jnp.ndarray,
    r_inner: float,
    r_outer: float,
    t_offset: float = 0.0,
) -> jnp.ndarray:
    """Bilinear RGBA sample of the polar disk texture at a plane hit."""
    u, v = _disk_uv(hit_x, hit_y, r_inner, r_outer, t_offset,
                    disk_tex.shape[1], disk_tex.shape[0])
    return _bilinear_gather(disk_tex, u, v)


def build_mipmaps(base: jnp.ndarray, levels: int = 4) -> jnp.ndarray:
    """2x2 box-filter mip pyramid packed into one padded (L, H, W, C) array.

    Level l occupies the top-left (H >> l, W >> l) corner; remaining texels
    are zero. Mirrors reference `generate_disk_mipmaps` + padded upload
    (render.py:1113-1125, 2239-2251), but built on device.
    """
    h, w = base.shape[0], base.shape[1]
    mips = [base]
    cur = base
    for _ in range(levels):
        ch, cw = cur.shape[0], cur.shape[1]
        if ch < 2 or cw < 2:
            break
        # Drop a trailing odd row/column before halving (external
        # --disk_texture images can have any dimensions).
        cur = cur[: ch - ch % 2, : cw - cw % 2]
        cur = (
            cur[0::2, 0::2] + cur[1::2, 0::2] + cur[0::2, 1::2] + cur[1::2, 1::2]
        ) * 0.25
        mips.append(cur)
    padded = []
    for m in mips:
        pad_h = h - m.shape[0]
        pad_w = w - m.shape[1]
        padded.append(jnp.pad(m, ((0, pad_h), (0, pad_w), (0, 0))))
    return jnp.stack(padded, axis=0)


def sample_disk_mip(
    mips: jnp.ndarray,
    num_levels: int,
    hit_x: jnp.ndarray,
    hit_y: jnp.ndarray,
    r_inner: float,
    r_outer: float,
    t_offset: float,
    lod: jnp.ndarray,
) -> jnp.ndarray:
    """Mip-LOD RGBA sample: nearest mip level, bilinear within the level.

    ``mips`` is the padded pyramid from :func:`build_mipmaps`; ``lod`` is a
    per-sample float LOD (truncated to an integer level, matching the
    reference's `lod_i = int(clamp(lod, 0, L-1))`).
    """
    base_h, base_w = mips.shape[1], mips.shape[2]
    r, phi = _disk_polar(hit_x, hit_y, t_offset)

    lod_i = jnp.clip(lod, 0.0, num_levels - 1).astype(jnp.int32)
    scale = jnp.power(2.0, lod_i.astype(jnp.float32))
    w_lod = base_w / scale
    h_lod = base_h / scale
    w_lod_i = (base_w // (2**lod_i.astype(jnp.int32))).astype(jnp.int32)
    h_lod_i = (base_h // (2**lod_i.astype(jnp.int32))).astype(jnp.int32)

    u = phi / TWO_PI * w_lod
    v = (r - r_inner) / (r_outer - r_inner) * h_lod

    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = (u - u0.astype(u.dtype))[..., None]
    fv = (v - v0.astype(v.dtype))[..., None]
    u0w = jnp.mod(u0, w_lod_i)
    u1w = jnp.mod(u0 + 1, w_lod_i)
    v0h = jnp.clip(v0, 0, h_lod_i - 1)
    v1h = jnp.clip(v0 + 1, 0, h_lod_i - 1)

    c00 = mips[lod_i, v0h, u0w]
    c10 = mips[lod_i, v0h, u1w]
    c01 = mips[lod_i, v1h, u0w]
    c11 = mips[lod_i, v1h, u1w]
    return (
        c00 * (1 - fu) * (1 - fv)
        + c10 * fu * (1 - fv)
        + c01 * (1 - fu) * fv
        + c11 * fu * fv
    )
