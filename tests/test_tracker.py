"""Tracker tests with analytic Kalman expectations
(kalman_tracker.hpp, kalman_filter.hpp, moving_objects_tracker.cpp)."""

import jax.numpy as jnp
import numpy as np

from moving_object_detector_tpu.config import TrackerConfig
from moving_object_detector_tpu.tracker import TrackerState, predict, track_step
from moving_object_detector_tpu.types import MovingObjects

CFG = TrackerConfig(max_tracks=8)
CAP = 16  # detection capacity in tests


def detections(entries):
    """entries: list of (center3, velocity3, bbox3)."""
    det = MovingObjects.empty(CAP)
    for i, (c, v, b) in enumerate(entries):
        det = det.replace(
            id=det.id.at[i].set(i),
            center=det.center.at[i].set(jnp.asarray(c, jnp.float32)),
            velocity=det.velocity.at[i].set(jnp.asarray(v, jnp.float32)),
            bounding_box=det.bounding_box.at[i].set(jnp.asarray(b, jnp.float32)),
            valid=det.valid.at[i].set(True),
        )
    return det


def test_spawn_and_publish_after_corrections():
    state = TrackerState.create(CFG.max_tracks)
    det = detections([([1.0, 2.0, 5.0], [0.5, 0.0, 0.0], [1.0, 1.0, 1.0])])
    t = 0.0
    published = []
    for k in range(5):
        state, out = track_step(state, jnp.float32(t), det, CFG)
        published.append(int(np.asarray(out.objects.valid).sum()))
        t += 0.1
    # Spawned at frame 0 with count 0; corrected at frames 1.. ; published
    # once correction_count >= 3 => frame 3 onward.
    assert published == [0, 0, 0, 1, 1]
    # The published track id is the first allocated id.
    valid = np.asarray(out.objects.valid)
    assert np.asarray(out.objects.id)[valid.argmax()] == 0


def test_kalman_predict_matches_closed_form():
    cfg = CFG
    state = TrackerState.create(cfg.max_tracks)
    mean = jnp.asarray([1.0, 2.0, 0.5, -0.5], jnp.float32)
    state = state.replace(
        mean=state.mean.at[0].set(mean),
        cov=state.cov.at[0].set(jnp.eye(4, dtype=jnp.float32) * 0.1),
        active=state.active.at[0].set(True),
        last_prediction_time=state.last_prediction_time.at[0].set(0.0),
    )
    new = predict(state, jnp.float32(0.5), cfg)
    dt = 0.5
    np.testing.assert_allclose(
        np.asarray(new.mean[0]),
        [1.0 + 0.5 * dt, 2.0 - 0.5 * dt, 0.5, -0.5],
        atol=1e-6,
    )
    # cov' = A P A^T + Q with P = 0.1 I.
    a = np.eye(4); a[0, 2] = dt; a[1, 3] = dt
    q = np.diag([0.003, 0.003, 0.01, 0.01])
    expect = a @ (np.eye(4) * 0.1) @ a.T + q
    np.testing.assert_allclose(np.asarray(new.cov[0]), expect, atol=1e-6)


def test_track_follows_moving_object():
    state = TrackerState.create(CFG.max_tracks)
    t, dt = 0.0, 0.1
    vx = 1.0
    out = None
    for k in range(10):
        x = vx * t
        det = detections([([x, 0.0, 5.0], [vx, 0.0, 0.0], [1.0, 1.0, 1.0])])
        state, out = track_step(state, jnp.float32(t), det, CFG)
        t += dt
    valid = np.asarray(out.objects.valid)
    assert valid.sum() == 1
    i = valid.argmax()
    center = np.asarray(out.objects.center)[i]
    vel = np.asarray(out.objects.velocity)[i]
    # Converged near the true state; z copied from the detection.
    assert abs(center[0] - vx * (t - dt)) < 0.15
    assert center[2] == 5.0
    assert abs(vel[0] - vx) < 0.2
    # Only one track was ever created (re-associated every frame).
    assert np.asarray(state.active).sum() == 1


def test_two_objects_tracked_separately():
    state = TrackerState.create(CFG.max_tracks)
    t, dt = 0.0, 0.1
    for k in range(6):
        det = detections(
            [
                ([t, 0.0, 5.0], [1.0, 0.0, 0.0], [1, 1, 1]),
                ([10.0, 10.0 - t, 5.0], [0.0, -1.0, 0.0], [1, 1, 1]),
            ]
        )
        state, out = track_step(state, jnp.float32(t), det, CFG)
        t += dt
    assert np.asarray(state.active).sum() == 2
    assert np.asarray(out.objects.valid).sum() == 2
    ids = sorted(np.asarray(out.objects.id)[np.asarray(out.objects.valid)])
    assert ids == [0, 1]


def test_close_detection_does_not_spawn():
    """A second detection within 2*object_radius of an existing track must not
    create a new tracker (moving_objects_tracker.cpp:157-174)."""
    state = TrackerState.create(CFG.max_tracks)
    det0 = detections([([0.0, 0.0, 5.0], [1.0, 0.0, 0.0], [1, 1, 1])])
    state, _ = track_step(state, jnp.float32(0.0), det0, CFG)
    assert np.asarray(state.active).sum() == 1
    # Two detections 0.5 m apart: one associates, the other is within
    # 2*0.5 = 1.0 m of the track -> no spawn.
    det1 = detections(
        [
            ([0.1, 0.0, 5.0], [1.0, 0.0, 0.0], [1, 1, 1]),
            ([0.5, 0.0, 5.0], [1.0, 0.0, 0.0], [1, 1, 1]),
        ]
    )
    state, _ = track_step(state, jnp.float32(0.1), det1, CFG)
    assert np.asarray(state.active).sum() == 1


def test_far_detection_spawns():
    state = TrackerState.create(CFG.max_tracks)
    det0 = detections([([0.0, 0.0, 5.0], [1.0, 0.0, 0.0], [1, 1, 1])])
    state, _ = track_step(state, jnp.float32(0.0), det0, CFG)
    det1 = detections(
        [
            ([0.05, 0.0, 5.0], [1.0, 0.0, 0.0], [1, 1, 1]),
            ([5.0, 5.0, 5.0], [1.0, 0.0, 0.0], [1, 1, 1]),
        ]
    )
    state, _ = track_step(state, jnp.float32(0.1), det1, CFG)
    assert np.asarray(state.active).sum() == 2


def test_unmatched_track_pruned_by_covariance_growth():
    """Without corrections the velocity covariance grows by q_vel=0.01 per
    predict; trace reaches the 0.5 limit and the track is pruned."""
    state = TrackerState.create(CFG.max_tracks)
    det = detections([([0.0, 0.0, 5.0], [1.0, 0.0, 0.0], [1, 1, 1])])
    state, _ = track_step(state, jnp.float32(0.0), det, CFG)
    assert np.asarray(state.active).sum() == 1
    empty = MovingObjects.empty(CAP)
    t = 0.1
    alive = []
    for k in range(30):
        state, _ = track_step(state, jnp.float32(t), empty, CFG)
        alive.append(int(np.asarray(state.active).sum()))
        t += 0.1
    assert alive[-1] == 0  # eventually pruned
    assert alive[0] == 1  # not pruned immediately


def test_greedy_association_prefers_best_pair():
    """Two tracks, two detections: each detection associates to the nearer
    track even when listed in the other order."""
    state = TrackerState.create(CFG.max_tracks)
    det = detections(
        [
            ([0.0, 0.0, 5.0], [0.5, 0.0, 0.0], [1, 1, 1]),
            ([3.0, 0.0, 5.0], [0.5, 0.0, 0.0], [1, 1, 1]),
        ]
    )
    t = 0.0
    for k in range(4):
        state, out = track_step(state, jnp.float32(t), det, CFG)
        t += 0.1
    valid = np.asarray(out.objects.valid)
    centers = np.asarray(out.objects.center)[valid]
    centers = centers[np.argsort(centers[:, 0])]
    assert abs(centers[0][0] - 0.0) < 0.1
    assert abs(centers[1][0] - 3.0) < 0.1


def test_gating_rejects_far_association():
    """A detection > 1.5 m from the track mean is gated out
    (moving_objects_tracker.cpp:27) and spawns a new track instead."""
    state = TrackerState.create(CFG.max_tracks)
    det0 = detections([([0.0, 0.0, 5.0], [0.0, 0.0, 0.0], [1, 1, 1])])
    state, _ = track_step(state, jnp.float32(0.0), det0, CFG)
    det1 = detections([([2.0, 0.0, 5.0], [0.0, 0.0, 0.0], [1, 1, 1])])
    state, _ = track_step(state, jnp.float32(0.1), det1, CFG)
    # Original track not corrected; new track spawned.
    assert np.asarray(state.active).sum() == 2
    assert int(np.asarray(state.correction_count)[0]) == 0


def test_chol_inv_det4_matches_numpy():
    """The unrolled Cholesky inverse/determinant must match LAPACK on random
    SPD matrices (it replaces jnp.linalg.inv/det in the tracker hot path)."""
    import numpy as np

    from moving_object_detector_tpu.tracker import _chol_inv_det4

    rng = np.random.default_rng(3)
    b = rng.normal(size=(32, 4, 4)).astype(np.float32)
    spd = b @ b.transpose(0, 2, 1) + 0.1 * np.eye(4, dtype=np.float32)
    inv, det = _chol_inv_det4(jnp.asarray(spd))
    np.testing.assert_allclose(
        np.asarray(inv), np.linalg.inv(spd), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(det), np.linalg.det(spd), rtol=2e-3
    )
