"""Unit tests for ops/geometry.py against closed-form expectations
(reference semantics: disparity_image_processor.cpp:17-121)."""

import jax.numpy as jnp
import numpy as np

from moving_object_detector_tpu.ops import geometry
from moving_object_detector_tpu.types import CameraModel, DisparityImage


def make_cam():
    return CameraModel.create(fx=700.0, fy=700.0, cx=310.0, cy=120.0)


def test_disparity_to_depth_closed_form():
    disp = DisparityImage.create(
        disparity=np.full((4, 6), 10.0, np.float32),
        f=700.0,
        t=0.5,
        min_disparity=0.0,
        max_disparity=64.0,
    )
    z = geometry.disparity_to_depth(disp)
    np.testing.assert_allclose(np.asarray(z), 700.0 * 0.5 / 10.0, rtol=1e-6)


def test_disparity_validity_gates():
    d = np.zeros((2, 5), np.float32)
    d[0] = [5.0, -1.0, 70.0, np.nan, 0.0]
    disp = DisparityImage.create(d, f=700.0, t=0.5, min_disparity=0.0, max_disparity=64.0)
    z = np.asarray(geometry.disparity_to_depth(disp))
    # valid: in range & nonzero -> only d=5
    assert np.isfinite(z[0, 0])
    assert np.isnan(z[0, 1])  # below min
    assert np.isnan(z[0, 2])  # above max
    assert np.isnan(z[0, 3])  # nan
    assert np.isnan(z[0, 4])  # zero disparity (getPoint3D d==0 check)


def test_backproject_project_roundtrip():
    cam = make_cam()
    disp = DisparityImage.create(
        np.random.default_rng(0).uniform(4.0, 60.0, (8, 12)).astype(np.float32),
        f=700.0,
        t=0.5,
    )
    pts = geometry.disparity_to_points(disp, cam)
    uv = geometry.project_points(pts, cam)
    u, v = geometry.pixel_grid(8, 12)
    np.testing.assert_allclose(np.asarray(uv[..., 0]), np.asarray(u), atol=1e-3)
    np.testing.assert_allclose(np.asarray(uv[..., 1]), np.asarray(v), atol=1e-3)


def test_backproject_ray_direction():
    # Pixel at principal point backprojects onto the optical axis.
    cam = make_cam()
    d = np.full((241, 621), 7.0, np.float32)
    disp = DisparityImage.create(d, f=700.0, t=0.5)
    pts = np.asarray(geometry.disparity_to_points(disp, cam))
    z = 700.0 * 0.5 / 7.0
    np.testing.assert_allclose(pts[120, 310], [0.0, 0.0, z], atol=1e-5)
    # One pixel right of cx: x = z / fx
    np.testing.assert_allclose(pts[120, 311], [z / 700.0, 0.0, z], atol=1e-5)


def test_se3_transform_and_inverse():
    rng = np.random.default_rng(1)
    axis_angle = jnp.asarray(rng.normal(size=3).astype(np.float32) * 0.3)
    rot = geometry.so3_exp(axis_angle)
    t = jnp.asarray([0.1, -0.2, 0.3], jnp.float32)
    tf = geometry.make_se3(rot, t)
    inv = geometry.se3_inverse(tf)
    np.testing.assert_allclose(np.asarray(tf @ inv), np.eye(4), atol=1e-5)

    pts = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    out = geometry.transform_points(tf, pts)
    back = geometry.transform_points(inv, out)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_transform_points_nan_propagation():
    tf = geometry.make_se3(jnp.eye(3, dtype=jnp.float32), jnp.asarray([1.0, 0, 0], jnp.float32))
    pts = jnp.asarray([[np.nan, np.nan, np.nan], [1.0, 2.0, 3.0]], jnp.float32)
    out = np.asarray(geometry.transform_points(tf, pts))
    assert np.isnan(out[0]).all()
    np.testing.assert_allclose(out[1], [2.0, 2.0, 3.0], atol=1e-6)


def test_so3_exp_small_angle():
    rot = np.asarray(geometry.so3_exp(jnp.zeros(3, jnp.float32)))
    np.testing.assert_allclose(rot, np.eye(3), atol=1e-7)


def test_bilinear_sample_interior_and_border():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    # Exact grid points.
    coords = jnp.asarray([[1.0, 1.0], [3.0, 2.0]], jnp.float32)
    out = np.asarray(geometry.bilinear_sample(img, coords))
    np.testing.assert_allclose(out, [5.0, 11.0], atol=1e-6)
    # Midpoint interpolation.
    mid = np.asarray(
        geometry.bilinear_sample(img, jnp.asarray([[0.5, 0.5]], jnp.float32))
    )
    np.testing.assert_allclose(mid, [(0 + 1 + 4 + 5) / 4.0], atol=1e-6)
    # Out-of-bounds clamps.
    clamped = np.asarray(
        geometry.bilinear_sample(img, jnp.asarray([[-5.0, -5.0]], jnp.float32))
    )
    np.testing.assert_allclose(clamped, [0.0], atol=1e-6)


def test_gather_pixels_bounds():
    img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    vals, ok = geometry.gather_pixels(
        img, jnp.asarray([0, 5, -1, 3]), jnp.asarray([0, 0, 0, 2])
    )
    np.testing.assert_array_equal(np.asarray(ok), [True, False, False, True])
    assert np.asarray(vals)[0] == 0.0 and np.asarray(vals)[3] == 11.0
