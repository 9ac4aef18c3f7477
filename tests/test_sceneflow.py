"""Scene-flow construction tests: synthetic scenes with known geometry,
checking the reference's NaN/zero/velocity semantics
(scene_flow_constructor.cpp:65-212)."""

import jax.numpy as jnp
import numpy as np

from moving_object_detector_tpu import sceneflow
from moving_object_detector_tpu.ops import geometry
from moving_object_detector_tpu.types import CameraModel, DisparityImage

H, W = 32, 48
CAM = CameraModel.create(fx=100.0, fy=100.0, cx=W / 2.0, cy=H / 2.0)
F, B = 100.0, 0.5


def flat_disparity(value=10.0):
    return DisparityImage.create(
        np.full((H, W), value, np.float32), f=F, t=B, min_disparity=0.0,
        max_disparity=64.0,
    )


def test_static_scene_zero_velocity():
    """Identity ego-motion + zero flow on a static scene => velocity 0
    everywhere the chain validates."""
    disp = flat_disparity()
    pts = geometry.disparity_to_points(disp, CAM)
    flow = jnp.zeros((H, W, 2), jnp.float32)
    cloud, static_flow = sceneflow.construct_scene_flow(
        pts, pts, flow, disp, disp, CAM, jnp.float32(0.1), jnp.float32(5.0)
    )
    vel = np.asarray(cloud.velocity)
    assert np.isfinite(vel).all()
    np.testing.assert_allclose(vel, 0.0, atol=1e-6)
    # Static flow is ~0: reprojection of untransformed points.
    np.testing.assert_allclose(np.asarray(static_flow), 0.0, atol=1e-3)


def test_moving_object_velocity_recovered():
    """A block of pixels translates in X by one pixel worth of motion; the
    measured flow disagrees with the (identity-motion) static flow, so the
    velocity should equal (P_now - P_prev)/dt inside the block."""
    disp = flat_disparity()
    z = F * B / 10.0  # 5 m
    pts_now = geometry.disparity_to_points(disp, CAM)
    # A fronto-parallel plane at z=5 moving laterally: a measured flow of
    # 10 px at fx=100 corresponds to dx = 10 * z / fx = 0.5 m. The plane
    # fills the view at both times, so the previous cloud equals the current
    # one; the velocity comes from matching pixel (u, v) to (u-10, v):
    # x_now(u) - x_prev(u-10) = 0.5 m.
    flow = np.zeros((H, W, 2), np.float32)
    flow[:, :, 0] = 10.0  # measured flow: 10 px to the right
    dt = 0.1
    cloud, _ = sceneflow.construct_scene_flow(
        pts_now,
        pts_now,
        jnp.asarray(flow),
        disp,
        disp,
        CAM,
        jnp.float32(dt),
        jnp.float32(5.0),
    )
    vel = np.asarray(cloud.velocity)
    # Interior pixels (where u-10 is in bounds): velocity = 0.5/0.1 = 5 m/s in x.
    inner = vel[:, 12 : W - 2]
    np.testing.assert_allclose(inner[..., 0], 5.0, atol=1e-4)
    np.testing.assert_allclose(inner[..., 1:], 0.0, atol=1e-4)
    # Pixels whose previous match falls out of bounds get NaN velocity
    # (getDisparity bounds gate at the previous pixel).
    assert np.isnan(vel[:, :9]).all()


def test_small_flow_below_threshold_is_zeroed():
    """Flow differing from static flow by < dynamic_flow_diff => exactly 0
    velocity (scene_flow_constructor.cpp:204-209)."""
    disp = flat_disparity()
    pts = geometry.disparity_to_points(disp, CAM)
    flow = jnp.full((H, W, 2), 2.0, jnp.float32)  # ||diff|| = 2.83 < 5
    cloud, _ = sceneflow.construct_scene_flow(
        pts, pts, flow, disp, disp, CAM, jnp.float32(0.1), jnp.float32(5.0)
    )
    vel = np.asarray(cloud.velocity)
    valid = np.isfinite(vel[..., 0])
    assert valid.any()
    np.testing.assert_allclose(vel[valid], 0.0, atol=1e-6)


def test_nan_flow_invalidates_velocity_but_not_position():
    disp = flat_disparity()
    pts = geometry.disparity_to_points(disp, CAM)
    flow = np.zeros((H, W, 2), np.float32)
    flow[5, 7] = np.nan
    cloud, _ = sceneflow.construct_scene_flow(
        pts, pts, jnp.asarray(flow), disp, disp, CAM, jnp.float32(0.1), jnp.float32(5.0)
    )
    vel = np.asarray(cloud.velocity)
    ptsv = np.asarray(cloud.points)
    assert np.isnan(vel[5, 7]).all()
    assert np.isfinite(ptsv[5, 7]).all()  # position set before the match gate
    assert np.isfinite(vel[5, 8]).all()


def test_invalid_current_disparity_gives_nan_point():
    d = np.full((H, W), 10.0, np.float32)
    d[3, 4] = 0.0  # zero disparity: invalid 3D point
    disp = DisparityImage.create(d, f=F, t=B, min_disparity=0.0, max_disparity=64.0)
    pts = geometry.disparity_to_points(disp, CAM)
    flow = jnp.zeros((H, W, 2), jnp.float32)
    cloud, _ = sceneflow.construct_scene_flow(
        pts, pts, flow, disp, disp, CAM, jnp.float32(0.1), jnp.float32(5.0)
    )
    assert np.isnan(np.asarray(cloud.points)[3, 4]).all()
    assert np.isnan(np.asarray(cloud.velocity)[3, 4]).all()


def test_invalid_previous_point_gives_nan_velocity():
    d_prev = np.full((H, W), 10.0, np.float32)
    d_prev[10, 20] = 70.0  # out of range at the previous frame
    disp_prev = DisparityImage.create(d_prev, f=F, t=B, min_disparity=0.0, max_disparity=64.0)
    disp_now = flat_disparity()
    pts_now = geometry.disparity_to_points(disp_now, CAM)
    pts_prev = geometry.disparity_to_points(disp_prev, CAM)
    flow = jnp.zeros((H, W, 2), jnp.float32)
    cloud, _ = sceneflow.construct_scene_flow(
        pts_now, pts_prev, flow, disp_now, disp_prev, CAM,
        jnp.float32(0.1), jnp.float32(5.0),
    )
    vel = np.asarray(cloud.velocity)
    assert np.isnan(vel[10, 20]).all()
    assert np.isfinite(vel[10, 21]).all()


def test_static_flow_matches_ego_motion():
    """Camera translates +0.1 m in x; previous points transformed by
    T_prev2now shift by -0.1 in camera x, so the induced flow is
    du = -fx * 0.1 / z."""
    disp = flat_disparity()
    pts_prev = geometry.disparity_to_points(disp, CAM)
    tf = geometry.make_se3(
        jnp.eye(3, dtype=jnp.float32), jnp.asarray([-0.1, 0.0, 0.0], jnp.float32)
    )
    pts_prev_tf = geometry.transform_points(tf, pts_prev)
    static = np.asarray(sceneflow.static_optical_flow(pts_prev_tf, CAM))
    z = F * B / 10.0
    np.testing.assert_allclose(static[..., 0], -100.0 * 0.1 / z, atol=1e-3)
    np.testing.assert_allclose(static[..., 1], 0.0, atol=1e-3)


def test_disparity_rate_gate_flags_approaching_plane():
    """An object approaching along the optical axis produces ~zero image
    flow but a real disparity change. The 2D flow gate misses it entirely
    (reference blind spot, scene_flow_constructor.cpp:196-198); with
    dynamic_disparity_rate > 0 the disparity change (here |10.42 - 10| /
    0.1 s ~ 4.2 px/s) flags it at EVERY pixel."""
    z_prev, z_now = 5.0, 4.8  # approaching: 2 m/s at dt=0.1
    d_prev = flat_disparity(F * B / z_prev)
    d_now = flat_disparity(F * B / z_now)
    pts_now = geometry.disparity_to_points(d_now, CAM)
    pts_prev = geometry.disparity_to_points(d_prev, CAM)
    # Central pixels of a frontal plane barely move in the image; use zero
    # flow (the worst case for the flow gate: center of expansion).
    flow = jnp.zeros((H, W, 2), jnp.float32)
    dt = jnp.float32(0.1)

    # Flow gate only (rate 0): everything static (velocity exactly 0).
    cloud0, _ = sceneflow.construct_scene_flow(
        pts_now, pts_prev, flow, d_now, d_prev, CAM, dt, jnp.float32(5.0)
    )
    vel0 = np.asarray(cloud0.velocity)
    ok0 = np.isfinite(vel0[..., 0])
    assert ok0.mean() > 0.5
    np.testing.assert_allclose(vel0[ok0], 0.0, atol=1e-5)

    # Gate at 2 px/s: the ~4.2 px/s change flags every valid pixel.
    cloud1, _ = sceneflow.construct_scene_flow(
        pts_now, pts_prev, flow, d_now, d_prev, CAM, dt, jnp.float32(5.0),
        dynamic_disparity_rate=jnp.float32(2.0),
    )
    vel1 = np.asarray(cloud1.velocity)
    ok1 = np.isfinite(vel1[..., 0])
    np.testing.assert_array_equal(ok1, ok0)
    np.testing.assert_allclose(vel1[ok1][..., 2], -2.0, atol=1e-3)

    # A sub-threshold disparity rate stays static (no noise amplification).
    cloud2, _ = sceneflow.construct_scene_flow(
        pts_now, pts_prev, flow, d_now, d_prev, CAM, dt, jnp.float32(5.0),
        dynamic_disparity_rate=jnp.float32(8.0),
    )
    vel2 = np.asarray(cloud2.velocity)
    np.testing.assert_allclose(vel2[np.isfinite(vel2[..., 0])], 0.0,
                               atol=1e-5)
