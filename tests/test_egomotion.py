"""Ego-motion tests: recover a known camera motion from a synthetic textured
plane warped by the exact plane homography."""

import jax
import jax.numpy as jnp
import numpy as np

from moving_object_detector_tpu.config import EgoMotionConfig
from moving_object_detector_tpu import egomotion
from moving_object_detector_tpu.ops import geometry
from moving_object_detector_tpu.types import CameraModel, DisparityImage

H, W = 96, 128
FX = FY = 150.0
CX, CY = W / 2.0, H / 2.0
CAM = CameraModel.create(FX, FY, CX, CY)
BASELINE = 0.5
Z0 = 5.0

CFG = EgoMotionConfig(
    max_features=128,
    nms_radius=4,
    ransac_hypotheses=32,
    lk_pyramid_levels=2,
    min_inliers=10,
)


def textured(rng):
    """Blocky random texture: strong corners every ~8 px for Harris."""
    img = np.kron(
        rng.uniform(0.0, 1.0, (H // 8, W // 8)).astype(np.float32),
        np.ones((8, 8), np.float32),
    )
    k = np.array([0.25, 0.5, 0.25])
    for _ in range(2):
        img = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 1, img)
        img = np.apply_along_axis(lambda c: np.convolve(c, k, mode="same"), 0, img)
    return img


def k_matrix():
    return np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])


def warp_by_motion(prev, rot, t):
    """Synthesize the current frame seen after camera motion (p_now = R p_prev
    + t) for a fronto-parallel plane at depth Z0, via the plane homography."""
    k = k_matrix()
    n = np.array([0.0, 0.0, 1.0])
    h_mat = k @ (rot + np.outer(t, n) / Z0) @ np.linalg.inv(k)
    h_inv = np.linalg.inv(h_mat)
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    ones = np.ones_like(uu)
    pix = np.stack([uu, vv, ones], axis=-1) @ h_inv.T
    src = pix[..., :2] / pix[..., 2:3]
    coords = jnp.asarray(src.reshape(-1, 2), jnp.float32)
    now = geometry.bilinear_sample(jnp.asarray(prev), coords)
    return np.asarray(now).reshape(H, W).astype(np.float32)


def run_case(rng, rotvec, t):
    prev = textured(rng)
    rot = np.asarray(geometry.so3_exp(jnp.asarray(rotvec, jnp.float32)))
    now = warp_by_motion(prev, rot, np.asarray(t))
    d = FX * BASELINE / Z0
    disp = DisparityImage.create(
        np.full((H, W), d, np.float32), f=FX, t=BASELINE,
        min_disparity=0.0, max_disparity=128.0,
    )
    motion, success, count = egomotion.estimate_motion(
        jnp.asarray(prev), jnp.asarray(now), disp, CAM,
        jax.random.PRNGKey(0), CFG,
    )
    return np.asarray(motion), bool(success), int(count), rot


def test_pure_lateral_translation(rng):
    t = [0.05, 0.0, 0.0]
    motion, success, count, rot = run_case(rng, [0, 0, 0], t)
    assert success and count >= 20
    np.testing.assert_allclose(motion[:3, :3], np.eye(3), atol=5e-3)
    np.testing.assert_allclose(motion[:3, 3], t, atol=8e-3)


def test_forward_translation(rng):
    t = [0.0, 0.0, 0.1]
    motion, success, count, rot = run_case(rng, [0, 0, 0], t)
    assert success
    np.testing.assert_allclose(motion[:3, :3], np.eye(3), atol=5e-3)
    np.testing.assert_allclose(motion[:3, 3], t, atol=0.02)


def test_rotation_and_translation(rng):
    rotvec = [0.004, -0.008, 0.005]
    t = [0.02, -0.015, 0.04]
    motion, success, count, rot = run_case(rng, rotvec, t)
    assert success
    np.testing.assert_allclose(motion[:3, :3], rot, atol=6e-3)
    np.testing.assert_allclose(motion[:3, 3], t, atol=0.02)


def test_identity_motion(rng):
    motion, success, count, _ = run_case(rng, [0, 0, 0], [0, 0, 0])
    assert success
    np.testing.assert_allclose(motion, np.eye(4), atol=3e-3)


def test_failure_without_texture():
    """A uniform image has no corners: the estimator must report failure and
    return identity (the reference's soft-fail contract,
    scene_flow_constructor.cpp:251-255)."""
    flat = np.full((H, W), 0.5, np.float32)
    disp = DisparityImage.create(
        np.full((H, W), FX * BASELINE / Z0, np.float32), f=FX, t=BASELINE,
        min_disparity=0.0, max_disparity=128.0,
    )
    motion, success, count = egomotion.estimate_motion(
        jnp.asarray(flat), jnp.asarray(flat), disp, CAM,
        jax.random.PRNGKey(0), CFG,
    )
    assert not bool(success)
    np.testing.assert_allclose(np.asarray(motion), np.eye(4), atol=1e-6)


def test_lk_tracks_known_shift(rng):
    prev = textured(rng)
    shift = 3.0
    now = np.roll(prev, -3, axis=1)  # now(u) = prev(u + 3): features move -3 px
    pts, valid = egomotion.select_features(
        jnp.asarray(prev), jnp.ones((H, W), bool), CFG
    )
    tracked, ok = egomotion.lk_track(
        jnp.asarray(prev), jnp.asarray(now), pts, CFG
    )
    good = np.asarray(valid & ok)
    drift = np.asarray(tracked - pts)[good]
    assert good.sum() > 20
    med = np.median(drift, axis=0)
    np.testing.assert_allclose(med, [-shift, 0.0], atol=0.15)


def test_harris_finds_corner():
    img = np.zeros((64, 64), np.float32)
    img[20:, 30:] = 1.0  # a single L-corner at (30, 20)
    resp = np.asarray(egomotion.harris_response(jnp.asarray(img)))
    v, u = np.unravel_index(np.argmax(resp), resp.shape)
    assert abs(u - 30) <= 2 and abs(v - 20) <= 2


def exact_flow_prev_indexed(rot, t):
    """Ground-truth PREV-indexed flow of the plane scene: flow(x) =
    H(x) - x where the homography H maps prev pixels to now pixels —
    the PWC training convention (train/data_synth.py: now = prev +
    flow(prev))."""
    k = k_matrix()
    n = np.array([0.0, 0.0, 1.0])
    h_mat = k @ (rot + np.outer(np.asarray(t), n) / Z0) @ np.linalg.inv(k)
    uu, vv = np.meshgrid(
        np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64)
    )
    pix = np.stack([uu, vv, np.ones_like(uu)], axis=-1) @ h_mat.T
    now_px = pix[..., :2] / pix[..., 2:3]
    flow = now_px - np.stack([uu, vv], axis=-1)
    return jnp.asarray(flow, jnp.float32)


def run_dense_case(rng, rotvec, t):
    prev = textured(rng)
    rot = np.asarray(geometry.so3_exp(jnp.asarray(rotvec, jnp.float32)))
    now = warp_by_motion(prev, rot, np.asarray(t))
    d = FX * BASELINE / Z0
    disp = DisparityImage.create(
        np.full((H, W), d, np.float32), f=FX, t=BASELINE,
        min_disparity=0.0, max_disparity=128.0,
    )
    motion, success, count = egomotion.estimate_motion(
        jnp.asarray(prev), jnp.asarray(now), disp, CAM,
        jax.random.PRNGKey(0), CFG,
        dense_flow=exact_flow_prev_indexed(rot, t),
    )
    return np.asarray(motion), bool(success), int(count), rot


def test_dense_flow_forward_translation(rng):
    """The pipeline-default dense path: forward motion gives a radial,
    strongly non-uniform flow field — exact recovery requires sampling the
    prev-indexed field at the feature (a now-indexed misread biases it)."""
    t = [0.0, 0.0, 0.1]
    motion, success, count, _ = run_dense_case(rng, [0, 0, 0], t)
    assert success and count >= 20
    np.testing.assert_allclose(motion[:3, :3], np.eye(3), atol=2e-3)
    np.testing.assert_allclose(motion[:3, 3], t, atol=0.01)


def test_dense_flow_rotation_and_translation(rng):
    rotvec = [0.004, -0.008, 0.005]
    t = [0.02, -0.015, 0.04]
    motion, success, count, rot = run_dense_case(rng, rotvec, t)
    assert success
    np.testing.assert_allclose(motion[:3, :3], rot, atol=3e-3)
    np.testing.assert_allclose(motion[:3, 3], t, atol=0.01)


def _corrupted_flow(rng):
    """Adversarially corrupted dense field: a smooth but WRONG large-scale
    pattern (the hallucinated-flow failure mode) plus per-pixel noise —
    nothing in it is consistent with any rigid motion of the plane."""
    coarse = rng.uniform(-25.0, 25.0, (H // 16, W // 16, 2)).astype(np.float32)
    flow = np.kron(coarse, np.ones((16, 16, 1), np.float32))[:H, :W]
    flow += rng.uniform(-3.0, 3.0, (H, W, 2)).astype(np.float32)
    return jnp.asarray(flow)


def test_dense_flow_corrupted_no_fallback_fails(rng):
    """Without the LK fallback, a corrupted flow field sinks the dense
    mode: the single-point-of-failure the reference never had (its viso2
    matcher was independent of the PWC flow,
    scene_flow_constructor.cpp:230)."""
    import dataclasses

    prev = textured(rng)
    t = [0.05, 0.0, 0.02]
    rot = np.eye(3)
    now = warp_by_motion(prev, rot, np.asarray(t))
    d = FX * BASELINE / Z0
    disp = DisparityImage.create(
        np.full((H, W), d, np.float32), f=FX, t=BASELINE,
        min_disparity=0.0, max_disparity=128.0,
    )
    cfg = dataclasses.replace(CFG, lk_fallback=False)
    motion, success, count = egomotion.estimate_motion(
        jnp.asarray(prev), jnp.asarray(now), disp, CAM,
        jax.random.PRNGKey(0), cfg, dense_flow=_corrupted_flow(rng),
    )
    # Either outright failure or a grossly wrong translation — it must NOT
    # silently produce the true motion from garbage correspondences.
    wrong = (not bool(success)) or (
        np.linalg.norm(np.asarray(motion)[:3, 3] - t) > 0.02
    )
    assert wrong


def test_dense_flow_corrupted_lk_fallback_recovers(rng):
    """With lk_fallback (default), the same corrupted field triggers the
    independent LK re-derivation, which recovers the true motion — the
    redundancy policy documented in EgoMotionConfig."""
    prev = textured(rng)
    t = [0.05, 0.0, 0.02]
    rot = np.eye(3)
    now = warp_by_motion(prev, rot, np.asarray(t))
    d = FX * BASELINE / Z0
    disp = DisparityImage.create(
        np.full((H, W), d, np.float32), f=FX, t=BASELINE,
        min_disparity=0.0, max_disparity=128.0,
    )
    assert CFG.lk_fallback
    motion, success, count = egomotion.estimate_motion(
        jnp.asarray(prev), jnp.asarray(now), disp, CAM,
        jax.random.PRNGKey(0), CFG, dense_flow=_corrupted_flow(rng),
    )
    assert bool(success)
    np.testing.assert_allclose(np.asarray(motion)[:3, :3], rot, atol=3e-3)
    np.testing.assert_allclose(np.asarray(motion)[:3, 3], t, atol=0.01)


def test_dense_flow_healthy_not_degraded_by_fallback(rng):
    """A healthy flow field must take the dense branch (high inlier
    fraction): same result with the fallback armed as without."""
    rotvec = [0.004, -0.008, 0.005]
    t = [0.02, -0.015, 0.04]
    motion, success, count, rot = run_dense_case(rng, rotvec, t)
    assert success
    np.testing.assert_allclose(motion[:3, :3], rot, atol=3e-3)
    np.testing.assert_allclose(motion[:3, 3], t, atol=0.01)


def test_planar_yaw_translation_degeneracy():
    """Fronto-planar background + yaw: the refined solver must not land in
    the yaw<->lateral-translation traded optimum (rot err 1.3 deg / 33 cm
    measured with single-candidate refinement on the rotating_cam scene's
    geometry — see _ransac_gn_solve top-K note). Synthesizes that exact
    geometry: a z=12 m plane of features, yaw 2 deg/frame + 6 cm lateral
    translation, SGM-like 1.5% depth noise; every RNG seed must recover
    the pose to < 0.3 deg / 5 cm."""
    cfg = EgoMotionConfig()
    cam = CameraModel(fx=300.0, fy=300.0, cx=224.0, cy=96.0)
    rng = np.random.default_rng(11)
    us = np.linspace(8, 440, 24)
    vs = np.linspace(8, 184, 10)
    uu, vv = np.meshgrid(us, vs)
    uv = np.stack([uu.ravel(), vv.ravel()], axis=1).astype(np.float32)
    z_true = np.full(uv.shape[0], 12.0, np.float32)
    x = (uv[:, 0] - cam.cx) / cam.fx * z_true
    y = (uv[:, 1] - cam.cy) / cam.fy * z_true
    pts3d_true = np.stack([x, y, z_true], axis=1)

    th = np.deg2rad(2.0)
    M = np.eye(4, dtype=np.float32)
    M[0, 0] = M[2, 2] = np.cos(th)
    M[0, 2] = np.sin(th)
    M[2, 0] = -np.sin(th)
    M[0, 3] = 0.06
    p_now = pts3d_true @ M[:3, :3].T + M[:3, 3]
    tracked = np.stack([
        cam.fx * p_now[:, 0] / p_now[:, 2] + cam.cx,
        cam.fy * p_now[:, 1] / p_now[:, 2] + cam.cy,
    ], axis=1).astype(np.float32)

    # SGM-like relative depth noise corrupts the 3D lift (not the GT
    # correspondences): the condition that made 3-point hypotheses noisy.
    z_noisy = z_true * (1.0 + rng.normal(0.0, 0.015, z_true.shape))
    pts3d = np.stack([
        (uv[:, 0] - cam.cx) / cam.fx * z_noisy,
        (uv[:, 1] - cam.cy) / cam.fy * z_noisy,
        z_noisy,
    ], axis=1).astype(np.float32)

    valid = jnp.ones(uv.shape[0], bool)
    for seed in range(8):
        motion, ok, _ = egomotion._ransac_gn_solve(
            jnp.asarray(pts3d), jnp.asarray(tracked), valid, cam,
            jax.random.PRNGKey(seed), cfg,
        )
        Mhat = np.asarray(motion)
        assert bool(ok)
        dR = Mhat[:3, :3] @ M[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        dt = np.linalg.norm(Mhat[:3, 3] - M[:3, 3])
        assert ang < 0.3 and dt < 0.05, (seed, ang, dt)
