"""Texture sampling vs independent NumPy oracles."""

import jax.numpy as jnp
import pytest
import numpy as np

from bhr_tpu.ops.sampling import (
    _bilinear_gather,
    build_mipmaps,
    sample_disk,
    sample_disk_mip,
    sample_skybox,
)


def _bilinear_oracle(tex, u, v):
    """Direct NumPy bilinear with u-wrap / v-clamp (same convention)."""
    h, w = tex.shape[:2]
    u0 = np.floor(u).astype(int)
    v0 = np.floor(v).astype(int)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0w, u1w = u0 % w, (u0 + 1) % w
    v0h = np.clip(v0, 0, h - 1)
    v1h = np.clip(v0 + 1, 0, h - 1)
    return (
        tex[v0h, u0w] * (1 - fu) * (1 - fv)
        + tex[v0h, u1w] * fu * (1 - fv)
        + tex[v1h, u0w] * (1 - fu) * fv
        + tex[v1h, u1w] * fu * fv
    )


def test_bilinear_matches_oracle():
    rng = np.random.default_rng(0)
    tex = rng.random((16, 32, 3)).astype(np.float32)
    u = rng.uniform(-5, 40, 200).astype(np.float32)
    v = rng.uniform(-3, 20, 200).astype(np.float32)
    got = np.asarray(_bilinear_gather(jnp.asarray(tex), jnp.asarray(u), jnp.asarray(v)))
    want = _bilinear_oracle(tex, u, v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bilinear_exact_at_texel_centers():
    rng = np.random.default_rng(1)
    tex = rng.random((8, 8, 4)).astype(np.float32)
    u = np.arange(8).astype(np.float32)
    v = np.arange(8).astype(np.float32)
    uu, vv = np.meshgrid(u, v)
    got = np.asarray(
        _bilinear_gather(jnp.asarray(tex), jnp.asarray(uu), jnp.asarray(vv))
    )
    np.testing.assert_allclose(got, tex, atol=1e-6)


def test_skybox_poles_and_wrap():
    tex = np.zeros((8, 16, 3), np.float32)
    tex[0, :, 0] = 1.0  # north pole row red
    tex[-1, :, 2] = 1.0  # south pole row blue
    sky = jnp.asarray(tex)
    up = np.asarray(sample_skybox(sky, jnp.asarray([[0.0, 0.0, 1.0]])))
    down = np.asarray(sample_skybox(sky, jnp.asarray([[0.0, 0.0, -1.0]])))
    assert up[0, 0] > 0.5
    assert down[0, 2] > 0.5
    # wrap continuity across phi = 0/2pi
    eps = 1e-4
    d1 = np.array([[np.cos(eps), -np.sin(eps), 0.0]], np.float32)
    d2 = np.array([[np.cos(eps), np.sin(eps), 0.0]], np.float32)
    c1 = np.asarray(sample_skybox(sky, jnp.asarray(d1)))
    c2 = np.asarray(sample_skybox(sky, jnp.asarray(d2)))
    np.testing.assert_allclose(c1, c2, atol=1e-3)


def test_mipmap_pyramid_box_filter():
    rng = np.random.default_rng(2)
    base = rng.random((16, 32, 4)).astype(np.float32)
    mips = np.asarray(build_mipmaps(jnp.asarray(base), levels=3))
    assert mips.shape == (4, 16, 32, 4)
    level1 = (
        base[0::2, 0::2] + base[1::2, 0::2] + base[0::2, 1::2] + base[1::2, 1::2]
    ) / 4.0
    np.testing.assert_allclose(mips[1, :8, :16], level1, atol=1e-6)
    # Padding regions are zero.
    assert np.all(mips[1, 8:, :] == 0)
    assert np.all(mips[1, :, 16:] == 0)


def test_disk_sample_rotation_offset():
    """t_offset rotates the sampled pattern by omega(r) * t."""
    n_r, n_phi = 8, 64
    tex = np.zeros((n_r, n_phi, 4), np.float32)
    tex[:, 0, 0] = 1.0  # bright column at phi=0
    r_inner, r_outer = 2.0, 4.0
    r = 3.0
    omega = np.sqrt(0.5 / (r**3 + 1e-6))
    t = 1.7
    # Sampling at phi = -omega*t should land on the bright column after
    # the rotation offset phi' = phi + t*omega.
    phi_probe = -omega * t
    hx, hy = r * np.cos(phi_probe), r * np.sin(phi_probe)
    rgba = np.asarray(
        sample_disk(
            jnp.asarray(tex), jnp.asarray([hx]), jnp.asarray([hy]),
            r_inner, r_outer, t,
        )
    )
    assert rgba[0, 0] > 0.5


def test_mip_sampling_levels():
    n_r, n_phi = 16, 32
    base = np.ones((n_r, n_phi, 4), np.float32)
    base[0::2] = 0.0  # alternating rows: level-1 mip averages to 0.5
    mips = build_mipmaps(jnp.asarray(base), levels=2)
    hx, hy = jnp.asarray([3.0]), jnp.asarray([0.0])
    lod0 = np.asarray(
        sample_disk_mip(mips, 3, hx, hy, 2.0, 4.0, 0.0, jnp.asarray([0.0]))
    )
    lod1 = np.asarray(
        sample_disk_mip(mips, 3, hx, hy, 2.0, 4.0, 0.0, jnp.asarray([1.0]))
    )
    # Level 1 is fully averaged.
    np.testing.assert_allclose(lod1[0], 0.5, atol=1e-5)
    # Level 0 keeps contrast: r=3.0 maps to v=8.0 exactly (v-frac 0), a
    # pure even row, which the alternating pattern zeroes.
    np.testing.assert_allclose(lod0[0], 0.0, atol=1e-5)


def test_quad_pack_matches_four_gather():
    """Quad-packed single-gather bilinear == classic 4-gather bilinear."""
    from bhr_tpu.ops.sampling import (
        _bilinear_quad_gather,
        pack_quad,
        pack_quad_mips,
        sample_disk_mip_quad,
        sample_disk_quad,
        sample_skybox_quad,
    )

    rng = np.random.default_rng(3)
    tex = rng.random((16, 32, 3)).astype(np.float32)
    q = pack_quad(jnp.asarray(tex))
    u = rng.uniform(-5, 40, 300).astype(np.float32)
    v = rng.uniform(-3, 20, 300).astype(np.float32)
    got = np.asarray(_bilinear_quad_gather(q, jnp.asarray(u), jnp.asarray(v), 3))
    want = np.asarray(
        _bilinear_gather(jnp.asarray(tex), jnp.asarray(u), jnp.asarray(v))
    )
    np.testing.assert_allclose(got, want, atol=1e-5)

    # Quad samplers use fast polynomial trig (~1e-4 rad coordinate
    # error), so parity with the exact-trig classic samplers is checked
    # on SMOOTH textures where a sub-0.1-texel coordinate shift maps to
    # a small value difference.
    yy, xx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 16),
                         indexing="ij")
    smooth_sky = np.stack([yy, xx, 0.5 * (xx + yy)], -1).astype(np.float32).reshape(64, 16, 3).transpose(1, 0, 2)
    smooth_sky = np.ascontiguousarray(smooth_sky)
    qs = pack_quad(jnp.asarray(smooth_sky))
    dirs = rng.normal(size=(200, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    a = np.asarray(sample_skybox_quad(qs, jnp.asarray(dirs)))
    b = np.asarray(sample_skybox(jnp.asarray(smooth_sky), jnp.asarray(dirs)))
    np.testing.assert_allclose(a, b, atol=3e-3)

    # disk quad vs classic + mip quad vs classic on a smooth texture
    gy, gx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 16),
                         indexing="xy")
    dtex = np.stack([gx, gy, gx * gy, 0.5 + 0.5 * gx], -1).astype(np.float32)
    mips = build_mipmaps(jnp.asarray(dtex), levels=2)
    qmips = pack_quad_mips(mips)
    hx = rng.uniform(-4, 4, 200).astype(np.float32)
    hy = rng.uniform(-4, 4, 200).astype(np.float32)
    a = np.asarray(sample_disk_quad(qmips[0][..., :16], jnp.asarray(hx), jnp.asarray(hy), 2.0, 4.0, 0.3))
    b = np.asarray(sample_disk(jnp.asarray(dtex), jnp.asarray(hx), jnp.asarray(hy), 2.0, 4.0, 0.3))
    np.testing.assert_allclose(a, b, atol=5e-3)
    lod = jnp.asarray(rng.uniform(0, 2.4, 200).astype(np.float32))
    a = np.asarray(sample_disk_mip_quad(qmips, 3, jnp.asarray(hx), jnp.asarray(hy), 2.0, 4.0, 0.3, lod))
    b = np.asarray(sample_disk_mip(mips, 3, jnp.asarray(hx), jnp.asarray(hy), 2.0, 4.0, 0.3, lod))
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_fast_trig_accuracy():
    """Polynomial atan2/arccos within 2e-4 rad of exact over the circle."""
    from bhr_tpu.ops.fastmath import fast_arccos, fast_atan2

    rng = np.random.default_rng(9)
    y = rng.normal(size=5000).astype(np.float32)
    x = rng.normal(size=5000).astype(np.float32)
    got = np.asarray(fast_atan2(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    err = np.abs(got - want)
    err = np.minimum(err, 2 * np.pi - err)  # wrap at the +-pi seam
    assert err.max() < 2e-4, err.max()

    z = rng.uniform(-1, 1, 5000).astype(np.float32)
    got = np.asarray(fast_arccos(jnp.asarray(z)))
    assert np.abs(got - np.arccos(z)).max() < 3e-4


def test_u8_quad_encoding_roundtrip_error():
    """Gamma-2 u8 storage decodes within its documented error bound."""
    import numpy as np

    from bhr_tpu.ops.sampling import encode_quad_u8, _decode_quad

    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.random((16, 32, 16)).astype(np.float32))
    dec = np.asarray(_decode_quad(encode_quad_u8(tex)))
    v = np.asarray(tex)
    # d/dq (q/255)^2 = 2q/255^2 <= 2*sqrt(v)/255 per code step.
    bound = 2.0 * np.sqrt(np.maximum(v, 1e-4)) / 255.0 + 1e-5
    assert (np.abs(dec - v) <= bound).all()


def test_u8_quad_sampling_matches_f32():
    """Bilinear sampling from u8 quads tracks the f32 path closely."""
    import numpy as np

    from bhr_tpu.ops.sampling import (
        pack_quad,
        quantize_packed,
        sample_disk_quad,
    )

    rng = np.random.default_rng(4)
    tex = jnp.asarray(rng.random((32, 128, 4)).astype(np.float32))
    qf = pack_quad(tex)
    q8 = quantize_packed(qf, jnp.uint8)
    n = 512
    hx = jnp.asarray(rng.uniform(-3.4, 3.4, n).astype(np.float32))
    hy = jnp.asarray(rng.uniform(-3.4, 3.4, n).astype(np.float32))
    a = np.asarray(sample_disk_quad(qf, hx, hy, 2.0, 3.5, 0.0))
    b = np.asarray(sample_disk_quad(q8, hx, hy, 2.0, 3.5, 0.0))
    assert np.abs(a - b).max() < 5e-3


def test_build_mipmaps_odd_dimensions():
    """External --disk_texture images can have odd dims; the pyramid
    must drop the trailing row/col instead of crashing (regression)."""
    import numpy as np

    from bhr_tpu.ops.sampling import build_mipmaps

    tex = jnp.asarray(np.random.default_rng(0).random((511, 1023, 4)), jnp.float32)
    mips = build_mipmaps(tex, levels=3)
    assert mips.shape == (4, 511, 1023, 4)
    assert bool(jnp.isfinite(mips).all())
    # level 1 is the box filter of the even-cropped base
    lvl1 = mips[1, :255, :511]
    base = tex[:510, :1022]
    ref = (base[0::2, 0::2] + base[1::2, 0::2]
           + base[0::2, 1::2] + base[1::2, 1::2]) * 0.25
    assert float(jnp.max(jnp.abs(lvl1 - ref))) < 1e-6


def test_mip_atlas_matches_padded_pyramid_sampler():
    """build_mip_atlas_quad + sample_disk_mip_atlas must reproduce the
    padded-pyramid quad sampler exactly (same levels, same uv math,
    only the addressing differs)."""
    from bhr_tpu.ops.sampling import (
        build_mip_atlas_quad,
        build_mipmaps,
        mip_atlas_level_count,
        pack_quad_mips,
        quantize_packed,
        sample_disk_mip_atlas,
        sample_disk_mip_quad,
    )

    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.random((64, 256, 4)).astype(np.float32))
    for dtype in (jnp.float32, jnp.uint8):
        mips = build_mipmaps(tex, levels=4)
        qmips = quantize_packed(pack_quad_mips(mips), dtype)
        atlas, n_levels = build_mip_atlas_quad(tex, 4, dtype)
        assert n_levels == int(mips.shape[0])
        assert n_levels == mip_atlas_level_count(64, 256, 4)
        # Bottom-packed layout: level 0 dense in the first H rows at
        # stride W, levels 1+ in the H//2 extra rows below.
        assert atlas.shape[0] == qmips.shape[1] * 3 // 2
        assert atlas.shape[1] == qmips.shape[2]
        np.testing.assert_array_equal(
            np.asarray(atlas[:64]), np.asarray(qmips[0]))

        n = 4096
        hx = jnp.asarray(rng.uniform(-3.6, 3.6, n).astype(np.float32))
        hy = jnp.asarray(rng.uniform(-3.6, 3.6, n).astype(np.float32))
        lod = jnp.asarray(rng.uniform(0.0, 4.5, n).astype(np.float32))
        a = sample_disk_mip_atlas(
            atlas, n_levels, hx, hy, 2.0, 3.5, 0.7, lod)
        b = sample_disk_mip_quad(
            qmips, n_levels, hx, hy, 2.0, 3.5, 0.7, lod)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mip_atlas_rejects_indivisible():
    from bhr_tpu.ops.sampling import build_mip_atlas_quad

    tex = jnp.zeros((60, 250, 4), jnp.float32)
    with pytest.raises(ValueError):
        build_mip_atlas_quad(tex, 4, jnp.float32)
