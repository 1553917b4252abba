"""Camera model tests (parity: reference build_camera, render.py:93-127)."""

import numpy as np

from bhr_tpu.camera import build_camera, orbit_camera_position


def test_orthonormal_basis():
    cam = build_camera([6.0, 0.0, 0.5], 90.0, 640, 360)
    for v in (cam.right, cam.up, cam.forward):
        assert np.isclose(np.linalg.norm(v), 1.0, atol=1e-5)
    assert abs(np.dot(cam.right, cam.up)) < 1e-5
    assert abs(np.dot(cam.right, cam.forward)) < 1e-5
    assert abs(np.dot(cam.up, cam.forward)) < 1e-5


def test_forward_points_at_origin():
    pos = np.array([3.0, -4.0, 1.0])
    cam = build_camera(pos, 60.0, 320, 180)
    expected = -pos / np.linalg.norm(pos)
    np.testing.assert_allclose(cam.forward, expected, atol=1e-6)


def test_degenerate_z_axis_camera():
    cam = build_camera([0.0, 0.0, 5.0], 90.0, 100, 100)
    np.testing.assert_allclose(cam.right, [1.0, 0.0, 0.0], atol=1e-6)


def test_pixel_sizes_fov():
    w, h, fov = 640, 360, 90.0
    cam = build_camera([6.0, 0.0, 0.0], fov, w, h)
    plane_h = 2.0 * np.tan(np.radians(fov) / 2.0)
    assert np.isclose(cam.pixel_height * h, plane_h, rtol=1e-6)
    assert np.isclose(cam.pixel_width * w, plane_h * (w / h), rtol=1e-6)


def test_orbit_positions_full_circle():
    base = [6.0, 0.0, 0.5]
    radius = np.linalg.norm(base)
    p0 = orbit_camera_position(0, 360, 360.0, base)
    p90 = orbit_camera_position(90, 360, 360.0, base)
    np.testing.assert_allclose(p0, [radius, 0.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(p90, [0.0, radius, 0.5], atol=1e-6)


def test_orbit_negative_degrees():
    base = [6.0, 0.0, 0.0]
    p = orbit_camera_position(90, 360, -360.0, base)
    np.testing.assert_allclose(p, [0.0, -6.0, 0.0], atol=1e-6)
