"""Multi-object golden sequence: clusterer + tracker stress over a scripted
scene with THREE simultaneously-moving objects — two crossing/occluding at
different depths, one appearing/disappearing, plus a same-depth merge event.

Round-1 golden coverage was one object in one scene (tests/test_golden.py);
this locks the semantics the reference exercises under load:

* partition parity (clusterer_nodelet.cpp:354-393 renumbering makes labels
  arbitrary — SURVEY.md §7 hard part (c): compare PARTITIONS, not labels);
* depth-gated split while objects overlap in image space
  (comparePoints depth gate, clusterer_nodelet.cpp:186-219);
* same-depth merge when two dynamic regions come within neighbor_distance;
* track-ID persistence through the crossing (Euclidean gate keeps the
  z-separated objects from swapping, moving_objects_tracker.cpp:14-31);
* publish gating of a vanished object and covariance-growth pruning
  (moving_objects_tracker.cpp:88-92, :187-196).

Driven with ORACLE scene flow (no flow net): detection logic is validated
exactly, independent of trained weights.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from moving_object_detector_tpu.clusterer import cluster_scene_flow
from moving_object_detector_tpu.config import ClustererConfig, TrackerConfig
from moving_object_detector_tpu.tracker import TrackerState, track_step
from moving_object_detector_tpu.types import MovingObjects, SceneFlowCloud

H, W = 48, 96
CCFG = ClustererConfig(cluster_size=20, max_objects=16)
TCFG = TrackerConfig(max_tracks=8)


def _scene(k: int):
    """Render frame k's oracle scene-flow cloud + per-object ground truth.

    Objects (x ranges in px, all rows given as [y0, y1); world scale
    0.06 m/px keeps the objects outside the tracker's 2*object_radius
    spawn-suppression radius, moving_objects_tracker.cpp:157-185):
      A rows 6..17, x 4+6k .. +12,  z=2.0, v=(+3.6, 0, 0)   (always present)
      B rows 6..17, x 52-6k .. +12, z=4.0, v=(-3.6, 0, 0)   (always present;
        crosses A at k=4 where A's box coincides exactly with B's — one
        frame of FULL occlusion; B's track must survive on prediction)
      C rows 30..44, x 10..30,      z=3.0, v=(0, 0, +1.0)   (frames 0-5 only)
      E rows 6..17, x 72..84,       z=2.0, v=(0, -1.2, 0)   (always present;
        A's box reaches within neighbor_distance of E at k=9 -> same-depth
        merge)
    """
    pts = np.full((H, W, 3), np.nan, np.float32)
    vel = np.full((H, W, 3), np.nan, np.float32)

    def fill(y0, y1, x0, x1, z, v):
        x0c, x1c = max(x0, 0), min(x1, W)
        if x1c <= x0c:
            return None
        ys, xs = np.mgrid[y0:y1, x0c:x1c]
        pts[y0:y1, x0c:x1c, 0] = xs * 0.06
        pts[y0:y1, x0c:x1c, 1] = ys * 0.06
        pts[y0:y1, x0c:x1c, 2] = z
        vel[y0:y1, x0c:x1c] = v
        return (y0, y1, x0c, x1c)

    truth = {}
    ax = 4 + 6 * k
    bx = 52 - 6 * k
    # Paint far-to-near so nearer objects occlude (B z=4 first, then A z=2).
    truth["B"] = {"box": fill(6, 17, bx, bx + 12, 4.0, [-3.6, 0, 0]),
                  "v": (-3.6, 0, 0), "z": 4.0}
    truth["E"] = {"box": fill(6, 17, 72, 84, 2.0, [0, -1.2, 0]),
                  "v": (0, -1.2, 0), "z": 2.0}
    truth["A"] = {"box": fill(6, 17, ax, ax + 12, 2.0, [3.6, 0, 0]),
                  "v": (3.6, 0, 0), "z": 2.0}
    if k <= 5:
        truth["C"] = {"box": fill(30, 44, 10, 30, 3.0, [0, 0, 1.0]),
                      "v": (0, 0, 1.0), "z": 3.0}
    return pts, vel, truth


def _visible_masks(truth):
    """Expected per-object visible pixel sets, honoring paint order
    (A overwrites B's overlap; E painted before A but they never overlap
    until the merge frame)."""
    masks = {}
    for name, t in truth.items():
        m = np.zeros((H, W), bool)
        if t["box"] is not None:
            y0, y1, x0, x1 = t["box"]
            m[y0:y1, x0:x1] = True
        masks[name] = m
    # A occludes B and E wherever boxes overlap (A painted last, z smaller).
    if "A" in masks:
        masks["B"] &= ~masks["A"]
        masks["E"] &= ~masks["A"]
    return masks


def _cluster(pts, vel):
    cloud = SceneFlowCloud(points=jnp.asarray(pts), velocity=jnp.asarray(vel))
    objects, labels = cluster_scene_flow(cloud, CCFG)
    return objects, np.asarray(labels)


def test_multi_object_partitions_split_and_merge():
    """Frame-by-frame partition parity: 4 clusters while C exists, 3
    after, 2 at the k=9 same-depth merge of A and E; depth-gated split
    holds through the A/B image-space crossing."""
    for k in range(10):
        pts, vel, truth = _scene(k)
        objects, labels = _cluster(pts, vel)
        masks = _visible_masks(truth)
        valid = np.asarray(objects.valid)
        n = int(valid.sum())

        if k == 9:
            # Merge event: A's box (58..70) is within neighbor_distance
            # (4 px) of E (72..84) at the same depth -> one cluster.
            assert n == 2, f"frame {k}: {n} clusters (want A+E merged, B)"
            merged = masks["A"] | masks["E"]
            lbls = set(np.unique(labels[merged]))
            assert len(lbls) == 1 and -1 not in lbls, (
                f"A and E not merged at k=9: labels {lbls}"
            )
            continue

        # Fully-occluded or sub-cluster_size objects produce no cluster
        # (at k=4, A's box coincides with B's: B is invisible).
        visible = {name: m for name, m in masks.items()
                   if m.sum() >= CCFG.cluster_size}
        if k == 4:
            assert "B" not in visible  # full occlusion frame
        expect = len(visible)
        assert n == expect, f"frame {k}: {n} clusters, expected {expect}"
        for name, m in visible.items():
            lbls = set(np.unique(labels[m]))
            assert len(lbls) == 1 and -1 not in lbls, (
                f"frame {k}: object {name} fragmented: {lbls}"
            )
            lbl = lbls.pop()
            # Partition parity: the label covers EXACTLY this object.
            np.testing.assert_array_equal(
                labels == lbl, m, err_msg=f"frame {k} object {name}"
            )



def test_multi_object_median_velocities():
    """Every cluster's median velocity equals its object's oracle velocity
    (median over members sorted by ||v|| descending,
    clusterer_nodelet.cpp:168-174)."""
    pts, vel, truth = _scene(2)
    objects, labels = _cluster(pts, vel)
    masks = _visible_masks(truth)
    vels = np.asarray(objects.velocity)
    valid = np.asarray(objects.valid)
    ids = np.asarray(objects.id)
    for name, m in masks.items():
        lbl = int(labels[m][0])
        row = int(np.flatnonzero(valid & (ids == lbl))[0])
        np.testing.assert_allclose(
            vels[row], truth[name]["v"], atol=1e-5,
            err_msg=f"object {name}",
        )


def test_multi_object_track_ids_persist_through_crossing():
    """Tracker stress over the full sequence: A and B keep their IDs
    through the image-space crossing (z separation defeats ID swap); C's
    track stops publishing the moment it vanishes; pruning eventually
    clears unmatched tracks."""
    state = TrackerState.create(TCFG.max_tracks)
    published = []  # per frame: {track_id: center}
    for k in range(10):
        pts, vel, truth = _scene(k)
        objects, _ = _cluster(pts, vel)
        state, tracked = track_step(
            state, jnp.float32(k * 0.1), objects, TCFG
        )
        trk = tracked.objects
        v = np.asarray(trk.valid)
        published.append({
            int(i): c
            for i, c, ok in zip(
                np.asarray(trk.id), np.asarray(trk.center), v
            )
            if ok
        })

    # Publish gate: nothing before correction_count_limit corrections.
    assert not published[0] and not published[1]
    # From frame 3: A, B, E and C all published (4 tracks).
    assert len(published[3]) == 4
    # Identify A and B by velocity-signed x-motion of their track centers.
    ids3 = published[3]

    def find(pred):
        return [i for i, c in ids3.items() if pred(c)]

    a_id = find(lambda c: c[2] < 3.0 and c[0] < 2.5)[0]
    b_id = find(lambda c: c[2] > 3.5)[0]
    c_id = find(lambda c: c[1] > 1.5)[0]
    # IDs persist frames 3..8 (A, B) through the k=4 crossing; B is
    # fully occluded (no detection) at k=4, so its track is not published
    # that frame (freshness gate) but MUST resume with the SAME id at k=5
    # (constant-velocity prediction carries it through the occlusion).
    # k=9 is excluded for A: the A+E cluster merge hands ONE detection to
    # two tracks — which one is corrected is association-order detail
    # (covered at the clusterer level in the partition test).
    for k in range(3, 9):
        assert a_id in published[k], f"A's track lost at frame {k}"
        if k != 4:
            assert b_id in published[k], f"B's track lost at frame {k}"
    assert b_id not in published[4]  # occluded: nothing to correct with
    assert b_id in published[9]
    # A's track x strictly increases, B's decreases: no swap.
    ax = [published[k][a_id][0] for k in range(3, 9)]
    bx = [published[k][b_id][0] for k in range(3, 10) if k != 4]
    assert all(b > a for a, b in zip(ax, ax[1:])), ax
    assert all(b < a for a, b in zip(bx, bx[1:])), bx

    # C published while present, gone from the published set right after
    # (freshness gate: last_correction_time == t).
    assert c_id in published[5]
    for k in range(6, 10):
        assert c_id not in published[k]

    # Prune: feed empty detections; covariance growth clears every track
    # (positionCov/velocityCov trace >= covariance_trace_limit).
    empty = MovingObjects.empty(CCFG.max_objects)
    active_counts = []
    for j in range(60):
        state, _ = track_step(
            state, jnp.float32(1.0 + j * 0.1), empty, TCFG
        )
        active_counts.append(int(np.asarray(state.active).sum()))
    assert active_counts[-1] == 0, (
        f"tracks never pruned: {active_counts[-10:]}"
    )
    # Pruning is monotone (no resurrection).
    assert all(b <= a for a, b in zip(active_counts, active_counts[1:]))
