"""Auction assignment (GNN/Munkres parity) and image-crop tests."""

import itertools

import jax.numpy as jnp
import numpy as np

from moving_object_detector_tpu.ops.assignment import auction_assignment
from moving_object_detector_tpu.ops.image import center_crop, center_crop_stereo
from moving_object_detector_tpu.types import CameraModel, StereoModel


def brute_force_optimal(cost):
    """Optimal partial assignment by enumeration (small matrices)."""
    r, c = cost.shape
    best = (np.inf, ())
    rows = list(range(r))
    for k in range(min(r, c), -1, -1):
        for rows_sel in itertools.combinations(rows, k):
            for cols_sel in itertools.permutations(range(c), k):
                total = sum(cost[i, j] for i, j in zip(rows_sel, cols_sel))
                if np.isfinite(total) and (
                    total < best[0] or (total == best[0] and k > len(best[1]))
                ):
                    best = (total, tuple(zip(rows_sel, cols_sel)))
        if best[1]:
            # Prefer maximal cardinality: stop at the largest k with a
            # finite assignment.
            break
    return best


def test_auction_matches_bruteforce_small():
    rng = np.random.default_rng(0)
    for trial in range(20):
        r, c = rng.integers(1, 5), rng.integers(1, 5)
        cost = rng.uniform(0, 1, (r, c)).astype(np.float32)
        # Random forbidden entries.
        forbid = rng.uniform(size=(r, c)) < 0.3
        cost_inf = np.where(forbid, np.inf, cost)
        match = np.asarray(auction_assignment(jnp.asarray(cost_inf)))
        # Validity: one-to-one, no forbidden pairs.
        used = [m for m in match if m >= 0]
        assert len(used) == len(set(used))
        for i, m in enumerate(match):
            if m >= 0:
                assert np.isfinite(cost_inf[i, m])
        total = sum(cost_inf[i, m] for i, m in enumerate(match) if m >= 0)
        opt_total, opt_pairs = brute_force_optimal(cost_inf)
        if opt_pairs:
            assert len(used) == len(opt_pairs), (trial, match, opt_pairs)
            assert total <= opt_total + 1e-2, (trial, total, opt_total)


def test_auction_all_forbidden():
    cost = jnp.full((3, 4), jnp.inf)
    match = np.asarray(auction_assignment(cost))
    assert (match == -1).all()


def test_auction_identity_diagonal():
    cost = jnp.asarray(
        np.where(np.eye(4, dtype=bool), 0.0, np.inf).astype(np.float32)
    )
    match = np.asarray(auction_assignment(cost))
    np.testing.assert_array_equal(match, [0, 1, 2, 3])


def test_gnn_tracker_mode_runs():
    import dataclasses

    from moving_object_detector_tpu.config import TrackerConfig
    from moving_object_detector_tpu.tracker import TrackerState, track_step
    from moving_object_detector_tpu.types import MovingObjects

    cfg = TrackerConfig(max_tracks=8, association="gnn")
    state = TrackerState.create(cfg.max_tracks)
    det = MovingObjects.empty(8)
    det = det.replace(
        center=det.center.at[0].set(jnp.asarray([1.0, 2.0, 5.0])),
        velocity=det.velocity.at[0].set(jnp.asarray([0.5, 0.0, 0.0])),
        bounding_box=det.bounding_box.at[0].set(jnp.asarray([1.0, 1, 1])),
        valid=det.valid.at[0].set(True),
    )
    t = 0.0
    for k in range(5):
        state, out = track_step(state, jnp.float32(t), det, cfg)
        t += 0.1
    assert np.asarray(out.objects.valid).sum() == 1
    assert np.asarray(state.active).sum() == 1


def test_center_crop_intrinsics():
    cam = CameraModel.create(fx=700.0, fy=700.0, cx=640.0, cy=360.0)
    img = jnp.asarray(np.arange(1280 * 720, dtype=np.float32).reshape(720, 1280))
    cropped, cam2 = center_crop(img, cam, 376, 1242)
    assert cropped.shape == (376, 1242)
    # Offsets: y0 = (720-376)//2 = 172, x0 = (1280-1242)//2 = 19.
    assert float(cam2.cx) == 640.0 - 19
    assert float(cam2.cy) == 360.0 - 172
    np.testing.assert_allclose(
        np.asarray(cropped)[0, 0], np.asarray(img)[172, 19]
    )


def test_center_crop_stereo_keeps_disparity():
    stereo = StereoModel.create(fx=700.0, fy=700.0, cx=640.0, cy=360.0,
                                baseline=0.12)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.uniform(0, 1, (720, 1280)).astype(np.float32))
    right = jnp.roll(left, -7, axis=1)  # constant disparity 7
    lc, rc, s2 = center_crop_stereo(left, right, stereo, 376, 1242)
    np.testing.assert_allclose(
        np.asarray(lc)[:, 7:], np.asarray(rc)[:, :-7], atol=1e-6
    )
    assert abs(float(s2.baseline) - 0.12) < 1e-6
